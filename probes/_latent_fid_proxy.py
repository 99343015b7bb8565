"""Fréchet-distance proxy for the LATENT-pipeline e2e leg.

The pixel-space proxy (probes/_fid_proxy.py) compares samples against the
procedural dataset directly — that works for pixel models. For the latent
pipeline (encode_latent -> LatentDataset -> in_chans-4 train -> fused VAE
decode) the reference distribution must pass through the SAME decoder the
samples do, so this probe:

  1. decodes N held-out dataset latents (mean channels of the HDF5 moment
     stacks, same `latent/latent_scale` convention as the sampler,
     reference: tools/sampler.py:249-255 decode path),
  2. loads the sample-CLI PNGs,
  3. decodes N(0, I)-latent "noise" images as the floor,

and prints the pooled-pixel Fréchet distances sample-vs-data and
noise-vs-data through vaw_tpu/evals/fid.py (the evaluator CLI's own
statistics path). A learned model lands near the data-vs-data split floor;
an untrained one lands at the noise row.

Usage:
  VAW_VAE_PATH=... python probes/_latent_fid_proxy.py \
      <samples-dir> <latents.h5> [n=512] [latent_scale=3.3818]
"""
import os
import sys

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_HERE))
sys.path.insert(0, _HERE)

import numpy as np  # noqa: E402

# the same 8x8 average-pool features every e2e proxy leg uses
from _fid_proxy import pool_features  # noqa: E402
from vaw_tpu.evals.fid import compute_statistics  # noqa: E402


def load_pngs(path: str, n: int) -> np.ndarray:
    from PIL import Image

    arrs = []
    for root, _dirs, files in sorted(os.walk(path)):
        for fn in sorted(files):
            if fn.lower().endswith(".png"):
                arrs.append(np.asarray(
                    Image.open(os.path.join(root, fn)).convert("RGB")))
            if len(arrs) >= n:
                break
        if len(arrs) >= n:
            break
    imgs = np.stack(arrs).astype(np.float32)
    return imgs / 127.5 - 1.0


def main():
    samples_dir = sys.argv[1]
    h5_path = sys.argv[2]
    n = int(sys.argv[3]) if len(sys.argv) > 3 else 512
    scale = float(sys.argv[4]) if len(sys.argv) > 4 else 3.3818

    import h5py
    import jax.numpy as jnp

    from vaw_tpu.data.vae import load_vae_decoder

    decode = load_vae_decoder("ema", dtype=jnp.bfloat16)

    with h5py.File(h5_path, "r") as f:
        total = f["train_latents"].shape[0]
        # held-out tail (training shuffles over the full file; the tail is
        # still "real data" for a distribution-level comparison)
        lat = f["train_latents"][total - n:]
    mean = np.transpose(lat[:, :4], (0, 2, 3, 1)).astype(np.float32)

    def decode_batched(z):
        outs = []
        for i in range(0, len(z), 64):
            # sampler convention: decode(latent / scale) on the SCALED
            # latent; data mean channels are unscaled, so pass them as-is
            outs.append(np.asarray(decode(jnp.asarray(z[i:i + 64]))))
        return np.concatenate(outs).astype(np.float32)

    data_imgs = decode_batched(mean)
    rng = np.random.default_rng(0)
    noise_imgs = decode_batched(
        rng.standard_normal(mean.shape).astype(np.float32) / scale)
    sample_imgs = load_pngs(samples_dir, n)

    stat_data = compute_statistics(pool_features(data_imgs))
    half = n // 2
    split_floor = compute_statistics(
        pool_features(data_imgs[:half])).frechet_distance(
        compute_statistics(pool_features(data_imgs[half:])))
    d_sample = stat_data.frechet_distance(
        compute_statistics(pool_features(sample_imgs)))
    d_noise = stat_data.frechet_distance(
        compute_statistics(pool_features(noise_imgs)))
    print(f"fid_proxy sample-vs-data={d_sample:.4f} "
          f"noise-vs-data={d_noise:.4f} data-split-floor={split_floor:.4f} "
          f"n={n}", flush=True)


if __name__ == "__main__":
    main()
