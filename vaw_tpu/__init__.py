"""vaw_tpu — a TPU-native (JAX / XLA / Pallas / pjit) framework with the full
capability surface of LilYau350/Variance-Aware-Weight.

The framework trains and evaluates diffusion / flow-matching image generative
models with variance-aware (SNR-based) MSE loss weighting, re-designed
TPU-first:

* all coefficient tables are precomputed host-side in float64 and baked into
  jitted programs as constants (reference: tools/gaussian_diffusion.py:167-205
  uses float64 numpy tables),
* the train step (q_sample -> weighting -> model -> loss -> grad -> AdamW ->
  EMA) is one donated jitted function over a `jax.sharding.Mesh`,
* denoising loops (ancestral / DDIM / EDM / flow ODE+SDE) are `lax.scan`
  bodies inside a single jit,
* hot ops (attention, fused bias+activation, upfirdn2d) have Pallas TPU
  kernels with XLA fallbacks,
* distribution is SPMD: data/tensor parallelism via NamedSharding over an ICI
  mesh instead of the reference's NCCL/DDP (tools/dist_util.py).

Subpackages
-----------
core      — schedules, diffusion/flow processes, loss weighting, likelihoods
models    — ADM UNet, DiT, ViT, U-ViT backbones (Flax linen)
ops       — Pallas TPU kernels + XLA fallbacks
samplers  — scan-based sampling loops, CFG / classifier guidance wrappers
parallel  — mesh construction and sharding rules
train     — TrainState, jitted train step, LR schedules, checkpointing
data      — input pipelines (CIFAR-10, image folders, latent HDF5)
evals     — FID / sFID / IS / Precision / Recall metrics stack
utils     — config system, logging, artifact layout
"""

__version__ = "0.1.0"
