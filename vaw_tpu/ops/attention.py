"""Attention for TPU.

The reference uses three attention implementations: the ADM QKVAttention
(models/unet.py:329-394, fp32-softmax-in-fp16), timm SDPA inside DiT/ViT
(models/dit.py:126), and a flash/xformers/math fallback chain in U-ViT
(models/uvit.py:8-18, 67-93). On TPU all of them collapse to one primitive:
a fused multi-head attention that keeps the softmax in f32. We use a Pallas
flash-attention kernel for long sequences (ops/flash_attention.py) and XLA's
fused attention otherwise — at the reference's token counts (<=1026) plain
XLA attention already runs at MXU speed-of-light, so the Pallas path is gated
by sequence length.
"""

from __future__ import annotations

import math
import os
from typing import Optional

import jax
import jax.numpy as jnp

__all__ = ["multi_head_attention"]

# Minimum tokens for the Pallas path. Measured on v5e at DiT-B shapes
# (T=256, d=64, bh=1536): the fused kernel beats XLA's unfused path by ~15%
# per block fwd+bwd once it blocks over batch*heads (it skips the ~400MB
# HBM round-trip of materialized probabilities), and the gap widens with T.
_FLASH_MIN_SEQ = 256


def _flash_eligible(q, k) -> bool:
    """Shapes the Pallas kernel compiles efficiently for. The d-major
    kernels put head_dim on sublanes (multiple of 8) and pad+mask
    non-divisible K sequences, so the only real limits are head size and
    the resident K/V VMEM footprint at very long sequences."""
    seq_k, d = k.shape[1], k.shape[-1]
    return d % 8 == 0 and d <= 256 and seq_k <= 4096


def _xla_attention(q, k, v, scale):
    """Reference-faithful math path: scores and softmax in f32
    (the 1/sqrt(sqrt(ch)) double-scaling trick of models/unet.py:349-353 is
    equivalent to a single f32 scale here)."""
    orig_dtype = q.dtype
    logits = jnp.einsum(
        "bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32
    )
    weights = jax.nn.softmax(logits.astype(jnp.float32) * scale, axis=-1)
    out = jnp.einsum(
        "bhqk,bkhd->bqhd", weights.astype(orig_dtype), v,
        preferred_element_type=jnp.float32,
    )
    return out.astype(orig_dtype)


def multi_head_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    scale: Optional[float] = None,
    use_pallas: Optional[bool] = None,
) -> jnp.ndarray:
    """Batched MHA over [B, T, H, D] tensors, returns [B, T, H, D].

    Softmax always runs in f32 regardless of input dtype (bf16-safe), matching
    the reference's fp32-softmax trick (models/unet.py:352, uvit.py:74).
    """
    head_dim = q.shape[-1]
    if scale is None:
        scale = 1.0 / math.sqrt(head_dim)
    seq = q.shape[1]
    if use_pallas is None:
        # Default routing targets real TPUs (compiled Mosaic); on CPU the
        # interpreter is only for explicit correctness tests.
        # VAW_DISABLE_FLASH=1 is the operational kill-switch.
        import os

        on_tpu = jax.devices()[0].platform in ("tpu", "axon")
        use_pallas = (on_tpu and seq >= _FLASH_MIN_SEQ
                      and _flash_eligible(q, k)
                      and not os.environ.get("VAW_DISABLE_FLASH"))
    if use_pallas:
        from .flash_attention import flash_attention

        return flash_attention(q, k, v, scale=scale)
    return _xla_attention(q, k, v, scale)


def packed_qkv_enabled() -> bool:
    """Routing flag for the fused-projection attention entry (layers.py
    MultiHeadSelfAttention). Default ON: the one-2D-transpose packed form
    measured 914.9 vs 900.0 imgs/s on the flagship bench (data-formatting
    slice 12.9 -> 6.9 ms/step; PERF.md round 3). VAW_PACKED_QKV=0 is the
    kill-switch (also reverts to the round-2 split path on any platform
    where the packed layout regresses)."""
    import os

    return os.environ.get("VAW_PACKED_QKV", "1") == "1"


def fused_tmajor_enabled() -> bool:
    """Routing flag for the fully t-major fused attention entry (_flash_p6):
    the kernel consumes the RAW [B,T,3HD] Dense output via lane-dim
    BlockSpec views and relayouts in VMEM (minor-2 batched transpose +
    sublane split — the Mosaic-supported order), eliminating every
    host-side transpose around attention. Default ON: flagship bench
    935.6 -> 1009.2 imgs/s (the 13.9 ms data-formatting slice vanishes,
    flash custom-call grows only 14.1 -> 15.1 ms; PERF.md round 3).
    VAW_FUSED_TMAJOR=0 is the kill-switch. Unsupported shapes fall back
    to the packed path inside multi_head_attention_fused."""
    import os

    return os.environ.get("VAW_FUSED_TMAJOR", "1") == "1"


def multi_head_attention_fused(qkv2d: jnp.ndarray, num_heads: int,
                               scale: Optional[float] = None) -> jnp.ndarray:
    """Fully t-major fused-projection MHA: qkv2d [B, T, 3*H*D] (raw Dense
    output, last-axis layout (3, H, D)) -> [B, T, H*D]. Routes to the
    zero-transpose Pallas kernel when supported, else falls back to the
    packed path (one 2D swapaxes)."""
    from .flash_attention import flash_attention_fused, flash_fused_supported

    b, t, hd3 = qkv2d.shape
    d = hd3 // 3 // num_heads
    if (jax.default_backend() == "tpu"
            or os.environ.get("VAW_FLASH_INTERPRET")) \
            and not os.environ.get("VAW_DISABLE_FLASH") \
            and flash_fused_supported(b, num_heads, d, t):
        return flash_attention_fused(qkv2d, num_heads, scale=scale)
    if packed_qkv_enabled():
        out = multi_head_attention_packed(
            qkv2d.reshape(b, t, 3, num_heads, d), scale=scale)
    else:
        # VAW_PACKED_QKV=0 must kill the packed layout on EVERY route,
        # including this fallback — otherwise disabling it while the
        # (default-on) fused entry is active silently re-enters the path
        # the operator just turned off.
        q, k, v = jnp.split(qkv2d, 3, axis=-1)
        out = multi_head_attention(
            q.reshape(b, t, num_heads, d), k.reshape(b, t, num_heads, d),
            v.reshape(b, t, num_heads, d), scale=scale)
    return out.reshape(b, t, num_heads * d)


def multi_head_attention_packed(
    qkv: jnp.ndarray,
    scale: Optional[float] = None,
    use_pallas: Optional[bool] = None,
    d_major_out: bool = False,
) -> jnp.ndarray:
    """Fused-projection MHA: qkv [B, T, 3, H, D] -> [B, T, H, D], or
    d-major [B, H*D, T] when d_major_out (contract with a
    DenseGeneral(axis=1) out-projection to skip the final transpose pair).

    Same routing as multi_head_attention; the flash path consumes the
    packed projection directly (one transpose + leading-dim slices — or
    zero-copy BlockSpec views at t==256 — instead of split + per-tensor
    transposes)."""
    b, t, three, h, d = qkv.shape
    assert three == 3, qkv.shape
    if scale is None:
        scale = 1.0 / math.sqrt(d)
    if use_pallas is None:
        import os

        on_tpu = jax.devices()[0].platform in ("tpu", "axon")
        use_pallas = (on_tpu and t >= _FLASH_MIN_SEQ
                      and d % 8 == 0 and d <= 256 and t <= 4096
                      and not os.environ.get("VAW_DISABLE_FLASH"))
    if use_pallas:
        from .flash_attention import flash_attention_packed

        return flash_attention_packed(qkv, scale=scale,
                                      d_major_out=d_major_out)
    q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
    out = _xla_attention(q, k, v, scale)
    if d_major_out:
        return out.transpose(0, 2, 3, 1).reshape(b, h * d, t)
    return out
