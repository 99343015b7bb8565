"""REPA align glue: teacher init + per-family pixel preprocessing +
feature extraction.

Re-design of the reference align utils (reference: tools/align_utils.py):
preprocessing runs as jitted jnp on device (bicubic resize + channel
normalization) instead of torchvision transforms; `get_feature` keeps the
per-family token slicing (strip cls for mocov3, patch tokens for dinov2,
align_utils.py:43-50).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from .loaders import load_encoders

__all__ = ["initialize_encoders", "preprocess_raw_image", "get_feature"]

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)
CLIP_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
CLIP_STD = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)


def _first_spec(enc_type: str) -> str:
    """Canonicalize a (possibly comma-separated) enc_type to the single
    spec that is actually used. Only teacher 0 is ever consumed
    (reference: tools/align_utils.py:15 takes encoder[0]), but the
    reference keys preprocessing off the FULL string — a multi-spec like
    'dinov2-vit-b,clip-vit-l' would CLIP-normalize dinov2 inputs there.
    Every function here parses the same first spec so that can't happen."""
    return enc_type.split(",")[0].strip()


def initialize_encoders(enc_type: str, image_size: int, dtype=jnp.float32):
    """Teacher at pixel resolution image_size*8 — i.e. the pre-VAE pixel
    resolution when training in latent space
    (reference: tools/align_utils.py:12-16). Only the first spec of a
    comma-separated list is loaded (see _first_spec)."""
    encoder_fns, _, families = load_encoders(
        _first_spec(enc_type), image_size * 8, dtype=dtype
    )
    return encoder_fns[0], families[0]


def preprocess_raw_image(x: jnp.ndarray, enc_type: str) -> jnp.ndarray:
    """uint8-range NHWC pixels [0,255] -> normalized teacher input
    (reference: tools/align_utils.py:19-40). The family->resolution policy
    is `loaders.runtime_image_size` — the SAME function the loader uses to
    pick the pos-embed resample grid, so the two can never drift."""
    from .loaders import runtime_image_size

    enc_type = _first_spec(enc_type)
    family = enc_type.split("-")[0]
    resolution = x.shape[1]
    target = runtime_image_size(family, resolution)
    x = x / 255.0
    if "clip" in enc_type:
        x = jax.image.resize(
            x, (x.shape[0], target, target, 3), method="bicubic"
        )
        x = (x - CLIP_MEAN) / CLIP_STD
    else:
        x = (x - IMAGENET_MEAN) / IMAGENET_STD
        if target != resolution:  # dinov2/jepa resize AFTER normalize
            x = jax.image.resize(
                x, (x.shape[0], target, target, 3), method="bicubic"
            )
    return x


def get_feature(enc_type: str, pixels: jnp.ndarray,
                encoder_fn: Callable) -> jnp.ndarray:
    """Frozen-teacher features for the REPA loss
    (reference: tools/align_utils.py:43-50). Output: [N, T, D] patch tokens.
    """
    enc_type = _first_spec(enc_type)
    x = preprocess_raw_image(pixels, enc_type)
    feats = encoder_fn(x)
    feats = jax.lax.stop_gradient(feats)
    # Strip prefix tokens down to patch tokens, matching what each
    # reference family returns to the align loss (align_utils.py:43-50):
    # cls stripped for mocov3 (glue), mae/clip (inside forward), post-norm
    # patch tokens for dinov2 (x_norm_patchtokens — cls AND registers
    # dropped); jepa has no prefix tokens.
    if "dinov2reg" in enc_type:
        feats = feats[:, 5:]  # cls + 4 register tokens
    elif "jepa" not in enc_type:
        feats = feats[:, 1:]
    return feats
