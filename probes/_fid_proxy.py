"""Pixel-space Fréchet-distance proxy for on-hardware e2e training runs.

The real FID needs the InceptionV3 frozen graph (absent, zero egress); this
proxy runs the SAME FIDStatistics/sqrtm machinery (vaw_tpu/evals/fid.py —
the code the evaluator CLI uses) on cheap deterministic features:
8x8-average-pooled pixels, flattened (192-dim). It is not FID, but it is a
monotone goodness signal for "are the samples approaching the data
distribution" — sufficient to evidence train->sample->eval improving across
checkpoints (VERDICT r3 next-3).

Usage: python probes/_fid_proxy.py <samples.npz|dir-of-pngs> [dataset] [n_ref]
Prints one line: fid_proxy=<float> n_sample=<N> n_ref=<M>
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

from vaw_tpu.evals.fid import FIDStatistics, compute_statistics  # noqa: E402


def pool_features(imgs: np.ndarray) -> np.ndarray:
    """[N,H,W,3] in [-1,1] -> [N, 192] 8x8 average-pooled pixels."""
    n, h, w, c = imgs.shape
    f = imgs.reshape(n, 8, h // 8, 8, w // 8, c).mean(axis=(2, 4))
    return f.reshape(n, -1)


def load_samples(path: str) -> np.ndarray:
    if os.path.isdir(path):
        from PIL import Image

        arrs = []
        for fn in sorted(os.listdir(path)):
            if fn.lower().endswith(".png"):
                arrs.append(np.asarray(Image.open(
                    os.path.join(path, fn)).convert("RGB")))
        imgs = np.stack(arrs).astype(np.float32)
    else:
        with np.load(path) as z:
            imgs = z[z.files[0]].astype(np.float32)
    if imgs.max() > 1.5:  # uint8 range -> [-1, 1]
        imgs = imgs / 127.5 - 1.0
    return imgs


def main():
    sample_path = sys.argv[1]
    dataset = sys.argv[2] if len(sys.argv) > 2 else "Shapes"
    n_ref = int(sys.argv[3]) if len(sys.argv) > 3 else 2048

    samples = load_samples(sample_path)
    from vaw_tpu.data.datasets import GaussianDataset, ShapesDataset

    size = samples.shape[1]
    if dataset == "Shapes":
        ref_ds = ShapesDataset(image_size=size, seed=1, flip=False)
    else:
        ref_ds = GaussianDataset(image_size=size, seed=1)
    ref = ref_ds.get_batch(np.arange(n_ref))["image"]

    stat_ref = compute_statistics(pool_features(ref))
    stat_s = compute_statistics(pool_features(samples))
    fid = stat_ref.frechet_distance(stat_s)
    print(f"fid_proxy={fid:.4f} n_sample={len(samples)} n_ref={n_ref}",
          flush=True)


if __name__ == "__main__":
    main()
