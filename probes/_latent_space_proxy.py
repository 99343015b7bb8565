"""LATENT-space Fréchet proxy for the latent-pipeline e2e leg.

The pixel-space proxy (probes/_latent_fid_proxy.py) routes everything
through the VAE decoder; with a synthetic-weight decoder that map is a
fixed random mixing and washes out most of the latent structure. This
probe measures the model in the space it was trained in: it loads the
EMA checkpoint exactly as the sample CLI does (cli/sample.py:43-57),
runs the jitted DDIM loop WITHOUT the decode stage, and compares pooled
latent statistics (vaw_tpu/evals/fid.py Fréchet path) of

  1. sampled latents (unscaled: samples / latent_scale),
  2. held-out dataset latents (mean channels of the HDF5 moment stacks),
  3. Gaussian noise matched to the data's marginal std (the floor),

Reference anchors: sampling loop tools/sampler.py:117-149, latent scale
convention trainer.py:21-25 / sampler.py:249-255.

Usage:
  python probes/_latent_space_proxy.py <latents.h5> <ckpt> [n=512] \
      [latent_scale=3.3818] [ddim_steps=50]
"""
import os
import sys

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_HERE))
sys.path.insert(0, _HERE)

import numpy as np  # noqa: E402

# the same 8x8 average-pool features every e2e proxy leg uses
# ([N,H,W,C] -> [N, 64*C/... ]; works on latents as well as pixels)
from _fid_proxy import pool_features  # noqa: E402


def main():
    h5_path, ckpt = sys.argv[1], sys.argv[2]
    n = int(sys.argv[3]) if len(sys.argv) > 3 else 512
    scale = float(sys.argv[4]) if len(sys.argv) > 4 else 3.3818
    steps = sys.argv[5] if len(sys.argv) > 5 else "50"

    import h5py
    import jax

    from vaw_tpu.cli.main import build_diffusion
    from vaw_tpu.cli.sample import parse_args
    from vaw_tpu.evals.fid import compute_statistics
    from vaw_tpu.models import build_model
    from vaw_tpu.parallel import make_mesh
    from vaw_tpu.train import Trainer, load_checkpoint
    from vaw_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    cfg = parse_args([
        "--dataset", "Latent", "--model", "DiT-S", "--image_size", "32",
        "--in_chans", "4", "--num_classes", "10", "--class_cond", "True",
        "--mean_type", "EPSILON", "--diffusion_steps", "1000",
        "--sample_steps", steps, "--latent_scale", str(scale),
        "--resume", ckpt,
    ])
    mesh = make_mesh(data_axis=cfg.data_axis, model_axis=cfg.model_axis)
    sample_diffusion = build_diffusion(cfg, use_ddim=True)
    model = build_model(cfg)
    trainer = Trainer(cfg, model, build_diffusion(cfg, use_ddim=False), mesh)
    dummy = {"image": np.zeros((2, 32, 32, 8), np.float32),
             "label": np.zeros((2,), np.int32)}
    state = trainer.init_state(jax.random.key(cfg.seed), dummy)
    state = load_checkpoint(ckpt, state)
    print(f"==> loaded {ckpt} (step {int(state.step)})", flush=True)

    ema = state.ema_params

    @jax.jit
    def sample_latents(rng):
        y = jax.random.randint(jax.random.fold_in(rng, 0), (64,), 0,
                               cfg.num_classes)
        return sample_diffusion.ddim_sample_loop(
            lambda x, t, **kw: model.apply(
                {"params": ema}, x, t, train=False, **kw),
            jax.random.fold_in(rng, 1), (64, 32, 32, 4),
            model_kwargs={"y": y})

    outs = []
    for i in range(-(-n // 64)):  # ceil: n < 64 and ragged n still sample n
        outs.append(np.asarray(sample_latents(jax.random.key(1000 + i))))
        print(f"  sampled {min((i + 1) * 64, n)}/{n}", flush=True)
    sampled = np.concatenate(outs)[:n].astype(np.float32) / scale

    with h5py.File(h5_path, "r") as f:
        total = f["train_latents"].shape[0]
        lat = f["train_latents"][total - n:]
    data = np.transpose(lat[:, :4], (0, 2, 3, 1)).astype(np.float32)

    rng = np.random.default_rng(0)
    noise = rng.standard_normal(data.shape).astype(np.float32) * data.std()

    stat_data = compute_statistics(pool_features(data))
    half = n // 2
    floor = compute_statistics(pool_features(data[:half])).frechet_distance(
        compute_statistics(pool_features(data[half:])))
    d_sample = stat_data.frechet_distance(
        compute_statistics(pool_features(sampled)))
    d_noise = stat_data.frechet_distance(
        compute_statistics(pool_features(noise)))
    print(f"latent_proxy sample-vs-data={d_sample:.4f} "
          f"noise-vs-data={d_noise:.4f} data-split-floor={floor:.4f} "
          f"n={n}", flush=True)


if __name__ == "__main__":
    main()
