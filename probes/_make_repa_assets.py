"""Fabricate the two assets the REPA CPU-e2e leg needs (zero-egress box):

1. A Latent_Pixel HDF5 dataset from procedural Shapes: 128-px pixels (what
   the frozen teacher consumes) + structured 16x16x4 "latents" (8x block-
   mean RGB + luminance — class-correlated, so the latent DiT can learn).
   Schema matches vaw_tpu/data/datasets.py LatentWithPixelDataset
   (train_latents CHW float, train_pixels CHW uint8, train_labels), itself
   the reference's datasets/data_loader.py:84-107 layout.
2. A synthetic mocov3-vit-s torch checkpoint in the exact timm state-dict
   layout the converter ingests (vaw_tpu/encoders/loaders.py
   convert_timm_vit) — random weights: the capability under e2e test is the
   torch->Flax load + align-glue + REPA gradient path, not teacher quality.

Usage: python probes/_make_repa_assets.py <outdir>   (CPU-only, ~2 min)
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

N = int(os.environ.get("REPA_ASSET_N", "2048"))
PIX = 128
LAT = 16


def make_h5(path: str) -> None:
    import h5py

    from vaw_tpu.data.datasets import ShapesDataset

    ds = ShapesDataset(image_size=PIX, num_classes=10, seed=0, flip=False)
    with h5py.File(path, "w") as f:
        lat_d = f.create_dataset("train_latents", (N, 4, LAT, LAT), "f4")
        pix_d = f.create_dataset("train_pixels", (N, 3, PIX, PIX), "u1")
        lab_d = f.create_dataset("train_labels", (N,), "i4")
        k = PIX // LAT
        for s in range(0, N, 256):
            b = ds.get_batch(np.arange(s, min(s + 256, N)))
            img = b["image"]  # [b, 128, 128, 3] in [-1, 1]
            # 8x block-mean downsample per channel + luminance 4th channel
            blk = img.reshape(-1, LAT, k, LAT, k, 3).mean(axis=(2, 4))
            lum = blk.mean(axis=-1, keepdims=True)
            lat = np.concatenate([blk, lum], axis=-1)  # [b, 16, 16, 4]
            lat_d[s:s + len(img)] = np.transpose(lat, (0, 3, 1, 2))
            pix_d[s:s + len(img)] = np.transpose(
                ((img + 1.0) * 127.5).clip(0, 255).astype(np.uint8),
                (0, 3, 1, 2))
            lab_d[s:s + len(img)] = b["label"]
    print(f"[assets] wrote {path}: {N} items, latents 4x{LAT}x{LAT}, "
          f"pixels 3x{PIX}x{PIX}")


def make_teacher_ckpt(path: str) -> None:
    import torch

    from _timm_vit import VisionTransformer

    torch.manual_seed(0)
    # mocov3-vit-s geometry (encoders/vit_backbone.py _SIZES['s'] +
    # FAMILY_CONFIGS['mocov3']) at the 128-px runtime resolution the CLI
    # derives for 16x16 latents (align.py: image_size * 8).
    model = VisionTransformer(
        img_size=PIX, patch_size=16, embed_dim=384, depth=12, num_heads=6,
        qkv_bias=True, num_classes=0)
    with torch.no_grad():  # break degenerate LN-identity inits
        for p in model.parameters():
            p.add_(0.05 * torch.randn(p.shape))
    torch.save(model.state_dict(), path)
    print(f"[assets] wrote {path}")


if __name__ == "__main__":
    out = sys.argv[1]
    os.makedirs(os.path.join(out, "enc"), exist_ok=True)
    make_h5(os.path.join(out, "latents.h5"))
    make_teacher_ckpt(os.path.join(out, "enc", "mocov3-vit-s.pth"))
