"""Pallas TPU flash attention (non-causal, static shapes) with custom VJP.

TPU-native equivalent of the reference's attention backends — PyTorch SDPA
flash attention in U-ViT (reference: models/uvit.py:8-18, 67-93) and the
fp32-softmax QKVAttention in the UNet (models/unet.py:329-394). The forward
kernel tiles queries over the grid and streams K/V blocks through VMEM with
an online (log-sum-exp) softmax in f32 — the [T, T] score matrix is never
materialized in HBM, so attention memory is O(T) instead of O(T^2). The
backward kernel recomputes probabilities blockwise from the saved logsumexp
(standard flash-attention backward) and accumulates dK/dV across query
blocks inside the sequential TPU grid.

Short-sequence shapes (DiT/ViT image tokens: T = 256..1026, head_dim 64)
are grid-overhead-bound, not FLOP-bound, so the kernels additionally block
over the fused batch*heads dimension (`block_b` pairs per grid step, batched
`dot_general`s inside the kernel). This is what makes the kernel beat XLA's
unfused path at T=256 — the win there is skipping the ~400MB of HBM traffic
for the materialized [B,H,T,T] probabilities, not the matmul FLOPs.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["flash_attention"]

DEFAULT_BLOCK_Q = 256
DEFAULT_BLOCK_K = 256
# VMEM budget for the per-step [block_b, block_q, block_k] f32 score tile.
# The kernel holds ~2 score-sized buffers (s and p) plus f32 q/k/v/acc
# copies and (at long seq_k) resident K/V blocks, so the pallas_calls also
# raise Mosaic's default 16MB scoped-vmem ceiling (v5e has 128MB VMEM).
_SCORE_TILE_BYTES = 2 << 20
_VMEM_LIMIT = 64 << 20
_COMPILER_PARAMS = pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT)


def _interpret() -> bool:
    """Compiled Mosaic on real TPUs (incl. the tunneled 'axon' platform);
    interpreter mode on CPU so the same tests run on the virtual mesh."""
    return jax.devices()[0].platform not in ("tpu", "axon")


def _pick_blocks(bh: int, block_q: int, block_k: int,
                 tile_bytes: int = _SCORE_TILE_BYTES):
    """(block_b, block_q) such that the f32 score tile fits `tile_bytes`
    and block_b satisfies Mosaic's sublane rule for the 2D lse block
    (divisible by 8, or equal to the full bh dim). Shrinks block_q before
    giving up on bh-blocking — MXU efficiency comes from block_b."""
    bq = block_q
    while bq >= 16:
        budget = max(1, tile_bytes // (bq * block_k * 4))
        for cand in (32, 16, 8):
            if cand <= budget and bh % cand == 0:
                return cand, bq
        bq //= 2
    # tiny batch*heads (unit tests) or indivisible bh: one grid row holds
    # the whole dim (block == array dim is always legal).
    return bh, block_q


# Batched dot_generals over the leading block_b dim: [bb,m,d] x [bb,n,d].
def _bmm(a, b, contract, batch=((0,), (0,))):
    return jax.lax.dot_general(
        a, b, (contract, batch), preferred_element_type=jnp.float32
    )


def _fwd_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, *, scale, block_k,
                seq_k):
    q = q_ref[...].astype(jnp.float32) * scale  # [bb, bq, d]
    bb, block_q, d = q.shape

    def body(j, carry):
        acc, m_i, l_i = carry
        k = k_ref[:, pl.ds(j * block_k, block_k), :].astype(jnp.float32)
        v = v_ref[:, pl.ds(j * block_k, block_k), :].astype(jnp.float32)
        s = _bmm(q, k, ((2,), (2,)))  # [bb, bq, bk]
        m_new = jnp.maximum(m_i, jnp.max(s, axis=2))
        alpha = jnp.exp(m_i - m_new)
        p = jnp.exp(s - m_new[:, :, None])
        acc = acc * alpha[:, :, None] + _bmm(p, v, ((2,), (1,)))
        l_i = l_i * alpha + jnp.sum(p, axis=2)
        return acc, m_new, l_i

    acc = jnp.zeros((bb, block_q, d), jnp.float32)
    m_i = jnp.full((bb, block_q), -1e30, jnp.float32)
    l_i = jnp.zeros((bb, block_q), jnp.float32)
    acc, m_i, l_i = jax.lax.fori_loop(
        0, seq_k // block_k, body, (acc, m_i, l_i)
    )
    o_ref[...] = (acc / l_i[:, :, None]).astype(o_ref.dtype)
    # lse stays 2D [bb, bq]: a trailing size-1 dim would pad 128x in HBM
    # (T(8,128) tiling), costing ~400MB/block at DiT-B scale.
    lse_ref[...] = m_i + jnp.log(l_i)


def _bwd_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, do_ref,
                dq_ref, dk_ref, dv_ref, *, scale, block_k, seq_k):
    i = pl.program_id(1)

    @pl.when(i == 0)
    def _():
        dk_ref[...] = jnp.zeros_like(dk_ref[...])
        dv_ref[...] = jnp.zeros_like(dv_ref[...])

    q = q_ref[...].astype(jnp.float32) * scale  # [bb, bq, d]
    do = do_ref[...].astype(jnp.float32)
    o = o_ref[...].astype(jnp.float32)
    lse = lse_ref[...]  # [bb, bq]
    bb, block_q, d = q.shape
    delta = jnp.sum(do * o, axis=2)  # rowsum(dO * O) [bb, bq]

    def body(j, dq):
        ks = pl.ds(j * block_k, block_k)
        k = k_ref[:, ks, :].astype(jnp.float32)
        v = v_ref[:, ks, :].astype(jnp.float32)
        s = _bmm(q, k, ((2,), (2,)))
        p = jnp.exp(s - lse[:, :, None])  # [bb, bq, bk]
        dp = _bmm(do, v, ((2,), (2,)))
        ds = p * (dp - delta[:, :, None])
        # p^T do over bq -> [bb, bk, d]; dK accumulates ds^T q (the q here
        # already carries one factor of `scale` = dK = scale * ds^T q_raw).
        # dk/dv refs are bf16 when the q grid is a single block (no true
        # accumulation) — halves the padded HBM writeback.
        dv_ref[:, ks, :] += _bmm(p, do, ((1,), (1,))).astype(dv_ref.dtype)
        dk_ref[:, ks, :] += _bmm(ds, q, ((1,), (1,))).astype(dk_ref.dtype)
        return dq + _bmm(ds, k, ((2,), (1,)))

    dq = jnp.zeros((bb, block_q, d), jnp.float32)
    dq = jax.lax.fori_loop(0, seq_k // block_k, body, dq)
    dq_ref[...] = (dq * scale).astype(dq_ref.dtype)


def _pad_q(x, multiple):
    size = x.shape[1]
    rem = size % multiple
    if rem == 0:
        return x, size
    return jnp.pad(x, ((0, 0), (0, multiple - rem), (0, 0))), size


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _flash(q, k, v, scale):
    out, _ = _flash_fwd(q, k, v, scale)
    return out


def _flash_fwd(q, k, v, scale):
    bh, seq_q, d = q.shape
    seq_k = k.shape[1]
    block_q = min(DEFAULT_BLOCK_Q, seq_q)
    block_k = min(DEFAULT_BLOCK_K, seq_k)
    assert seq_k % block_k == 0, (
        f"flash_attention requires seq_k divisible by {block_k}; got {seq_k}"
    )
    block_b, block_q = _pick_blocks(bh, block_q, block_k)
    q_p, orig_q = _pad_q(q, block_q)
    padded_q = q_p.shape[1]

    kernel = functools.partial(
        _fwd_kernel, scale=scale, block_k=block_k, seq_k=seq_k
    )
    out, lse = pl.pallas_call(
        kernel,
        grid=(bh // block_b, padded_q // block_q),
        in_specs=[
            pl.BlockSpec((block_b, block_q, d), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, seq_k, d), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, seq_k, d), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((block_b, block_q, d), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, block_q), lambda b, i: (b, i),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bh, padded_q, d), q.dtype),
            jax.ShapeDtypeStruct((bh, padded_q), jnp.float32),
        ],
        interpret=_interpret(),
        compiler_params=_COMPILER_PARAMS,
    )(q_p, k, v)
    return out[:, :orig_q], (q, k, v, out, lse)


def _flash_bwd(scale, res, g):
    q, k, v, out_p, lse = res
    bh, seq_q, d = q.shape
    seq_k = k.shape[1]
    block_q = min(DEFAULT_BLOCK_Q, seq_q)
    block_k = min(DEFAULT_BLOCK_K, seq_k)
    # The backward holds twice the live tiles (s/p plus dp/ds and the dq/dk/
    # dv accumulators), so it gets half the forward's score-tile budget.
    block_b, block_q = _pick_blocks(bh, block_q, block_k,
                                    _SCORE_TILE_BYTES // 2)
    q_p, orig_q = _pad_q(q, block_q)
    g_p, _ = _pad_q(g, block_q)
    padded_q = q_p.shape[1]
    acc_dtype = jnp.float32 if padded_q // block_q > 1 else k.dtype

    kernel = functools.partial(
        _bwd_kernel, scale=scale, block_k=block_k, seq_k=seq_k
    )
    dq, dk, dv = pl.pallas_call(
        kernel,
        grid=(bh // block_b, padded_q // block_q),
        in_specs=[
            pl.BlockSpec((block_b, block_q, d), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, seq_k, d), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, seq_k, d), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, block_q, d), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, block_q), lambda b, i: (b, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, block_q, d), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((block_b, block_q, d), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, seq_k, d), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, seq_k, d), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bh, padded_q, d), q.dtype),
            # f32 accumulators only when several q blocks truly accumulate;
            # single-block grids write the final value once, so emitting the
            # input dtype directly halves the padded HBM writeback.
            jax.ShapeDtypeStruct((bh, seq_k, d), acc_dtype),
            jax.ShapeDtypeStruct((bh, seq_k, d), acc_dtype),
        ],
        interpret=_interpret(),
        compiler_params=_COMPILER_PARAMS,
    )(q_p, k, v, out_p, lse, g_p)
    return (
        dq[:, :orig_q].astype(q.dtype),
        dk.astype(k.dtype),
        dv.astype(v.dtype),
    )


_flash.defvjp(lambda q, k, v, scale: _flash_fwd(q, k, v, scale), _flash_bwd)


def flash_attention(q, k, v, scale=None):
    """q/k/v: [B, T, H, D] -> [B, T, H, D], f32 online softmax."""
    b, tq, h, d = q.shape
    tk = k.shape[1]
    if scale is None:
        scale = 1.0 / math.sqrt(d)
    qf = q.transpose(0, 2, 1, 3).reshape(b * h, tq, d)
    kf = k.transpose(0, 2, 1, 3).reshape(b * h, tk, d)
    vf = v.transpose(0, 2, 1, 3).reshape(b * h, tk, d)
    out = _flash(qf, kf, vf, float(scale))
    return out.reshape(b, h, tq, d).transpose(0, 2, 1, 3)
