"""Offline preprocessing tools.

TPU-native re-design of the reference preprocessing suite:
- encode_latents: VAE-encode an image folder to the HDF5 latent layout
  (reference: preprocessing/encode_latent.py) — the encode runs as one
  jitted batch program on TPU instead of per-batch torch AMP.
- resize_imagenet: offline BOX+BICUBIC center-crop resize
  (reference: preprocessing/image_resizer_imagenet.py).
- preprocess_celeba: CenterCrop(140) -> Resize(64) with the official
  partition file (reference: preprocessing/preprocess_celeba.py).
- export_lsun: lmdb -> PNG directory (reference: preprocessing/lsun_bedroom.py).
- compute_ref_stats: FID mu/sigma (+spatial) + 10k-image arr_0 for custom
  datasets -> VIRTUAL_{name}{size}.npz (reference: preprocessing/cal_ref_stats.py).

HDF5 layout (reference: preprocessing/encode_latent.py:19-27):
  {split}_latents float32 [N, C=8, H, W]   ([mean | std], CHW like torch)
  {split}_pixels  uint8   [N, 3, H*8, W*8] (optional, for REPA)
  {split}_labels  uint16  [N]
The CHW storage matches the reference so h5 files interchange; data.datasets
transposes to NHWC at read time.
"""

from __future__ import annotations

import os
from concurrent.futures import ThreadPoolExecutor
from typing import Optional, Sequence

import numpy as np

from .datasets import ImageFolderDataset, center_crop_arr

__all__ = [
    "encode_latents",
    "resize_imagenet",
    "preprocess_celeba",
    "export_lsun",
    "compute_ref_stats",
]


def encode_latents(input_dir: str, output_h5: str, image_size: int = 256,
                   vae: str = "ema", batch_size: int = 64,
                   save_pixels: bool = False, splits=("train", "val")):
    """VAE-encode {input_dir}/{split} image folders into output_h5
    (reference: preprocessing/encode_latent.py:60-140)."""
    import h5py
    import jax

    from .vae import load_vae
    from ..models.vae import AutoencoderKL

    model, variables = load_vae(vae)

    @jax.jit
    def encode(x):
        moments = model.apply(variables, x, method=model.encode)
        return AutoencoderKL.moments_to_mean_std(moments)

    with h5py.File(output_h5, "w") as f:
        for split in splits:
            root = os.path.join(input_dir, split)
            if not os.path.isdir(root):
                print(f"[encode_latents] skipping missing split {root}")
                continue
            ds = ImageFolderDataset(root, image_size, random_crop=False,
                                    flip=False)
            n = len(ds)
            lat_h = image_size // 8
            latents_ds = f.create_dataset(
                f"{split}_latents", (n, 8, lat_h, lat_h), dtype="float32"
            )
            labels_ds = f.create_dataset(
                f"{split}_labels", (n,), dtype="uint16"
            )
            pixels_ds = None
            if save_pixels:
                pixels_ds = f.create_dataset(
                    f"{split}_pixels", (n, 3, image_size, image_size),
                    dtype="uint8",
                )
            for start in range(0, n, batch_size):
                idx = np.arange(start, min(start + batch_size, n))
                batch = ds.get_batch(idx)
                lat = np.asarray(encode(batch["image"]))  # NHWC [mean|std]
                latents_ds[start: start + len(idx)] = np.transpose(
                    lat, (0, 3, 1, 2)
                )
                labels_ds[start: start + len(idx)] = batch["label"]
                if pixels_ds is not None:
                    pix = np.clip(
                        (batch["image"] + 1) * 127.5, 0, 255
                    ).astype(np.uint8)
                    pixels_ds[start: start + len(idx)] = np.transpose(
                        pix, (0, 3, 1, 2)
                    )
    return output_h5


def _resize_one(src_dst_size):
    from PIL import Image

    src, dst, size = src_dst_size
    with Image.open(src) as im:
        arr = center_crop_arr(im.convert("RGB"), size)
    Image.fromarray(arr).save(dst)


def resize_imagenet(input_dir: str, output_dir: str, image_size: int = 64,
                    workers: int = 16):
    """Offline BOX+BICUBIC center-crop resize over class folders
    (reference: preprocessing/image_resizer_imagenet.py:19-105)."""
    jobs = []
    for root, _, files in os.walk(input_dir):
        rel = os.path.relpath(root, input_dir)
        out_root = os.path.join(output_dir, rel)
        os.makedirs(out_root, exist_ok=True)
        for fn in files:
            if fn.lower().endswith((".png", ".jpg", ".jpeg")):
                jobs.append((os.path.join(root, fn),
                             os.path.join(out_root, fn), image_size))
    with ThreadPoolExecutor(max_workers=workers) as pool:
        list(pool.map(_resize_one, jobs))
    return len(jobs)


def preprocess_celeba(celeba_root: str, output_dir: str, image_size: int = 64,
                      crop: int = 140):
    """CenterCrop(140) -> Resize(64), partitioned by
    list_eval_partition.txt (reference: preprocessing/preprocess_celeba.py:31-95).
    """
    from PIL import Image

    part_file = os.path.join(celeba_root, "list_eval_partition.txt")
    img_dir = os.path.join(celeba_root, "img_align_celeba")
    split_names = {0: "train", 1: "val", 2: "test"}
    with open(part_file) as f:
        rows = [line.split() for line in f if line.strip()]
    for name, part in rows:
        split = split_names[int(part)]
        out_dir = os.path.join(output_dir, split, "celeba")
        os.makedirs(out_dir, exist_ok=True)
        with Image.open(os.path.join(img_dir, name)) as im:
            w, h = im.size
            left = (w - crop) // 2
            top = (h - crop) // 2
            im = im.crop((left, top, left + crop, top + crop))
            im = im.resize((image_size, image_size), Image.BICUBIC)
            im.save(os.path.join(out_dir, name))
    return output_dir


def export_lsun(lmdb_path: str, output_dir: str, image_size: int = 256,
                limit: Optional[int] = None):
    """lmdb -> PNG directory with BOX resize + center crop
    (reference: preprocessing/lsun_bedroom.py:14-52)."""
    import io

    import lmdb  # type: ignore
    from PIL import Image

    os.makedirs(output_dir, exist_ok=True)
    env = lmdb.open(lmdb_path, map_size=1099511627776, max_readers=100,
                    readonly=True)
    count = 0
    with env.begin(write=False) as txn:
        cursor = txn.cursor()
        for key, val in cursor:
            with Image.open(io.BytesIO(val)) as im:
                im = im.convert("RGB")
                arr = center_crop_arr(im, image_size)
            Image.fromarray(arr).save(
                os.path.join(output_dir, f"{count:07d}.png")
            )
            count += 1
            if limit and count >= limit:
                break
    return count


def compute_ref_stats(data_path: str, dataset_name: str, image_size: int,
                      batch_size: int = 64, output_path: Optional[str] = None,
                      seed: int = 0):
    """FID mu/sigma (+spatial) + up-to-10k arr_0 sample ->
    VIRTUAL_{name}{size}.npz (reference: preprocessing/cal_ref_stats.py:32-89).
    """
    import glob as globmod

    from PIL import Image

    from ..evals import Evaluator

    paths = sorted(globmod.glob(os.path.join(data_path, "**", "*.png"),
                                recursive=True))
    if not paths:
        raise FileNotFoundError(f"no PNGs under {data_path}")

    def load(p):
        with Image.open(p) as im:
            return center_crop_arr(im.convert("RGB"), image_size)

    evaluator = Evaluator(batch_size=batch_size)
    batches = [
        np.stack([load(p) for p in paths[i: i + batch_size]]).astype(np.uint8)
        for i in range(0, len(paths), batch_size)
    ]
    acts = evaluator.compute_activations(batches)
    stats, stats_spatial = (evaluator.compute_statistics(a) for a in acts)

    ref_images = np.concatenate(batches, axis=0)
    if len(ref_images) > 10000:
        idx = np.random.RandomState(seed).choice(
            len(ref_images), 10000, replace=False
        )
        arr_0 = ref_images[idx]
    else:
        arr_0 = ref_images

    output_path = output_path or f"./VIRTUAL_{dataset_name}{image_size}.npz"
    np.savez_compressed(
        output_path, mu=stats.mu, sigma=stats.sigma,
        mu_s=stats_spatial.mu, sigma_s=stats_spatial.sigma,
        arr_0=arr_0.astype(np.uint8),
    )
    return output_path
