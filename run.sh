#!/usr/bin/env bash
# Flagship recipes (reference: run.sh:4-26) — latent ImageNet-256 DiT training.
# On TPU there is no torchrun: one SPMD process drives the whole mesh; the
# reference's --nproc_per_node 4 data parallelism is the mesh 'data' axis.

# DiT-B/2
python main.py --train True --eval True --dataset Latent --data_dir ./data/imagenet256_latent \
  --model DiT-B --patch_size 2 --image_size 32 --in_chans 4 --num_classes 1000 --class_cond True \
  --model_mode diffusion --path_type cosine --mean_type EPSILON --weight_type lambda \
  --batch_size 256 --total_steps 400000 --lr 1e-4 --betas 0.9 0.95 --drop_label_prob 0.1 \
  --sample_steps 18 --solver heun --ref_batch ./reference_batches/VIRTUAL_imagenet256_labeled.npz

# DiT-L/2
# python main.py ... --model DiT-L  (same flags as above)

# DiT-XL/2
# python main.py ... --model DiT-XL (same flags as above)

# Scaling variants (TPU extensions; all compose with the recipes above):
#   --fsdp True                ZeRO-3 param/opt-state sharding over 'data'
#   --model_axis 2             Megatron-style tensor parallelism (2D mesh)
#   --use_checkpoint True      gradient rematerialization (big batch / model)
#   --scan_blocks True         O(1)-compile scanned DiT blocks
#   --async_checkpoint True    non-blocking Orbax checkpoint writes
#   --time_sampler loss-second-moment   loss-aware timestep importance sampling
#   --pp_stages 4 --scan_blocks True    GPipe pipeline parallelism over a
#                                       ('data','stage') mesh (DiT family)
#   --sp_degree 4              sequence-parallel ring attention over a
#                              ('data','sp') mesh (DiT family)
#   --model MM-DiT-S           SD3-style dual-stream MM-DiT backbone
#   --fused_optimizer True     single-pass AdamW+EMA (default on)
