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

Layout: all HBM operands are **d-major** [batch*heads, head_dim, T].
Head-minor [bh, T, 64] tensors pad 2x under the TPU's (8, 128) tiling
(64 -> 128 lanes), doubling every DMA; with head_dim on the sublane axis
(64 % 8 == 0) and T on the lane axis (multiples of 128) there is no padding
at all, and the PV / dV / dK matmuls contract over T (K=256) instead of
head_dim (K=64) — better MXU shapes.

Short-sequence shapes (DiT/ViT image tokens: T = 256..1026, head_dim 64)
are grid-overhead-bound, not FLOP-bound, so the kernels additionally block
over the fused batch*heads dimension (`block_b` pairs per grid step, batched
`dot_general`s inside the kernel). The win over XLA's unfused path at T=256
is skipping the ~400MB HBM round-trip of materialized [B,H,T,T]
probabilities, not matmul FLOPs.
"""

from __future__ import annotations

import functools
import math
import os

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
# 8MB default from the round-3 sweep at the flagship shape (bh=1920,
# T=256): grad 2.64 -> 2.20 ms/layer vs the old 2MB tile (block_b 8 -> 32,
# 240 -> 60 grid steps); fwd flat. 16MB regressed fwd. probes/
# _flash_tile_sweep.py.
_SCORE_TILE_BYTES = int(
    os.environ.get("VAW_FLASH_TILE_BYTES", 8 << 20))
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


# Batched dot_generals over the leading block_b dim.
def _bmm(a, b, contract, batch=((0,), (0,))):
    return jax.lax.dot_general(
        a, b, (contract, batch), preferred_element_type=jnp.float32
    )


def _fwd_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, *, scale, block_k,
                seq_k, valid_k):
    """Scores are computed TRANSPOSED, st = K^T Q in [bb, bk, bq]: with
    d-major operands this gives every dot_general classic MXU shapes (lhs
    contracting on lanes, rhs on sublanes) — a sublane-contracted batched
    dot would be lowered as a broadcast-multiply-reduce (68MB VMEM at DiT-B
    tiles). Softmax reduces over the sublane (bk) axis."""
    q = q_ref[...].astype(jnp.float32) * scale  # [bb, d, bq]
    bb, d, block_q = q.shape

    def body(j, carry):
        acc, m_i, l_i = carry
        ks = pl.ds(j * block_k, block_k)
        k = k_ref[:, :, ks].astype(jnp.float32)  # [bb, d, bk]
        v = v_ref[:, :, ks].astype(jnp.float32)
        kt = jnp.swapaxes(k, 1, 2)  # [bb, bk, d]
        st = _bmm(kt, q, ((2,), (1,)))  # [bb, bk, bq]
        if valid_k != seq_k:  # static: K was padded; mask the tail rows
            kidx = j * block_k + jax.lax.broadcasted_iota(
                jnp.int32, st.shape, 1
            )
            st = jnp.where(kidx < valid_k, st, -1e30)
        m_new = jnp.maximum(m_i, jnp.max(st, axis=1))
        alpha = jnp.exp(m_i - m_new)
        p = jnp.exp(st - m_new[:, None, :])
        # PV: [bb,d,bk] x [bb,bk,bq] -> [bb, d, bq]
        acc = acc * alpha[:, None, :] + _bmm(v, p, ((2,), (1,)))
        l_i = l_i * alpha + jnp.sum(p, axis=1)
        return acc, m_new, l_i

    acc = jnp.zeros((bb, d, block_q), jnp.float32)
    m_i = jnp.full((bb, block_q), -1e30, jnp.float32)
    l_i = jnp.zeros((bb, block_q), jnp.float32)
    acc, m_i, l_i = jax.lax.fori_loop(
        0, seq_k // block_k, body, (acc, m_i, l_i)
    )
    o_ref[...] = (acc / l_i[:, None, :]).astype(o_ref.dtype)
    # lse stays 2D [bb, bq]: a trailing size-1 dim would pad 128x in HBM
    # (T(8,128) tiling), costing ~400MB/block at DiT-B scale.
    lse_ref[...] = m_i + jnp.log(l_i)


def _bwd_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, do_ref,
                dq_ref, dk_ref, dv_ref, *, scale, block_k, seq_k, valid_k):
    i = pl.program_id(1)

    @pl.when(i == 0)
    def _():
        dk_ref[...] = jnp.zeros_like(dk_ref[...])
        dv_ref[...] = jnp.zeros_like(dv_ref[...])

    q = q_ref[...].astype(jnp.float32) * scale  # [bb, d, bq]
    do = do_ref[...].astype(jnp.float32)
    o = o_ref[...].astype(jnp.float32)
    lse = lse_ref[...]  # [bb, bq]
    delta = jnp.sum(do * o, axis=1)  # rowsum over d -> [bb, bq]
    qt = jnp.swapaxes(q, 1, 2)  # [bb, bq, d]
    dot = jnp.swapaxes(do, 1, 2)  # [bb, bq, d]

    def body(j, dq):
        ks = pl.ds(j * block_k, block_k)
        k = k_ref[:, :, ks].astype(jnp.float32)  # [bb, d, bk]
        v = v_ref[:, :, ks].astype(jnp.float32)
        kt = jnp.swapaxes(k, 1, 2)
        vt = jnp.swapaxes(v, 1, 2)
        st = _bmm(kt, q, ((2,), (1,)))  # [bb, bk, bq]
        if valid_k != seq_k:  # static: zero the padded K rows' probabilities
            kidx = j * block_k + jax.lax.broadcasted_iota(
                jnp.int32, st.shape, 1
            )
            st = jnp.where(kidx < valid_k, st, -1e30)
        p = jnp.exp(st - lse[:, None, :])
        dp = _bmm(vt, do, ((2,), (1,)))  # [bb, bk, bq]
        ds = p * (dp - delta[:, None, :])
        # dV^T = P dO^T, dK^T = dS Q^T -> [bb, bk, d], stored d-major (the
        # q factor already carries `scale` = scale * dS q_raw^T). dk/dv
        # refs are bf16 when the q grid is a single block (no true
        # accumulation) — halves the HBM writeback.
        dvt = _bmm(p, dot, ((2,), (1,)))
        dkt = _bmm(ds, qt, ((2,), (1,)))
        dv_ref[:, :, ks] += jnp.swapaxes(dvt, 1, 2).astype(dv_ref.dtype)
        dk_ref[:, :, ks] += jnp.swapaxes(dkt, 1, 2).astype(dk_ref.dtype)
        # dQ += K dS (contract bk) -> [bb, d, bq]
        return dq + _bmm(k, ds, ((2,), (1,)))

    dq = jnp.zeros(q.shape, jnp.float32)
    dq = jax.lax.fori_loop(0, seq_k // block_k, body, dq)
    dq_ref[...] = (dq * scale).astype(dq_ref.dtype)


def _pad_q(x, multiple):
    """Pad the trailing (T) axis of a d-major [bh, d, T] tensor."""
    size = x.shape[2]
    rem = size % multiple
    if rem == 0:
        return x, size
    return jnp.pad(x, ((0, 0), (0, 0), (0, multiple - rem))), size


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _flash(q, k, v, scale):
    out, _ = _flash_fwd(q, k, v, scale)
    return out


def _flash_fwd(q, k, v, scale):
    bh, d, seq_q = q.shape
    k_orig, v_orig = k, v
    valid_k = k.shape[2]
    block_k = min(DEFAULT_BLOCK_K, valid_k)
    # Non-divisible K sequences (e.g. ViT's 1026 cls+time tokens) are padded
    # to the block size; the kernels mask the padded rows' scores to -inf.
    k, _ = _pad_q(k, block_k)
    v, _ = _pad_q(v, block_k)
    seq_k = k.shape[2]
    block_q = min(DEFAULT_BLOCK_Q, seq_q)
    block_b, block_q = _pick_blocks(bh, block_q, block_k)
    q_p, orig_q = _pad_q(q, block_q)
    padded_q = q_p.shape[2]

    kernel = functools.partial(
        _fwd_kernel, scale=scale, block_k=block_k, seq_k=seq_k,
        valid_k=valid_k,
    )
    out, lse = pl.pallas_call(
        kernel,
        grid=(bh // block_b, padded_q // block_q),
        in_specs=[
            pl.BlockSpec((block_b, d, block_q), lambda b, i: (b, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, d, seq_k), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, d, seq_k), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((block_b, d, block_q), lambda b, i: (b, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, block_q), lambda b, i: (b, i),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bh, d, padded_q), q.dtype),
            jax.ShapeDtypeStruct((bh, padded_q), jnp.float32),
        ],
        interpret=_interpret(),
        compiler_params=_COMPILER_PARAMS,
    )(q_p, k, v)
    # residuals keep the UNPADDED k/v (the bwd wrapper re-pads).
    return out[:, :, :orig_q], (q, k_orig, v_orig, out, lse)


def _flash_bwd(scale, res, g):
    q, k, v, out_p, lse = res
    bh, d, seq_q = q.shape
    valid_k = k.shape[2]
    block_k = min(DEFAULT_BLOCK_K, valid_k)
    k, _ = _pad_q(k, block_k)
    v, _ = _pad_q(v, block_k)
    seq_k = k.shape[2]
    block_q = min(DEFAULT_BLOCK_Q, seq_q)
    # The backward holds twice the live tiles (s/p plus dp/ds and the dq/dk/
    # dv accumulators), so it gets half the forward's score-tile budget.
    block_b, block_q = _pick_blocks(bh, block_q, block_k,
                                    _SCORE_TILE_BYTES // 2)
    q_p, orig_q = _pad_q(q, block_q)
    g_p, _ = _pad_q(g, block_q)
    padded_q = q_p.shape[2]
    acc_dtype = jnp.float32 if padded_q // block_q > 1 else k.dtype

    kernel = functools.partial(
        _bwd_kernel, scale=scale, block_k=block_k, seq_k=seq_k,
        valid_k=valid_k,
    )
    dq, dk, dv = pl.pallas_call(
        kernel,
        grid=(bh // block_b, padded_q // block_q),
        in_specs=[
            pl.BlockSpec((block_b, d, block_q), lambda b, i: (b, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, d, seq_k), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, d, seq_k), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, d, block_q), lambda b, i: (b, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, block_q), lambda b, i: (b, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, d, block_q), lambda b, i: (b, 0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((block_b, d, block_q), lambda b, i: (b, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, d, seq_k), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, d, seq_k), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bh, d, padded_q), q.dtype),
            # f32 accumulators only when several q blocks truly accumulate;
            # single-block grids write the final value once, so emitting the
            # input dtype directly halves the HBM writeback.
            jax.ShapeDtypeStruct((bh, d, seq_k), acc_dtype),
            jax.ShapeDtypeStruct((bh, d, seq_k), acc_dtype),
        ],
        interpret=_interpret(),
        compiler_params=_COMPILER_PARAMS,
    )(q_p, k, v, out_p, lse, g_p)
    return (
        dq[:, :, :orig_q].astype(q.dtype),
        dk[:, :, :valid_k].astype(k.dtype),
        dv[:, :, :valid_k].astype(v.dtype),
    )


_flash.defvjp(lambda q, k, v, scale: _flash_fwd(q, k, v, scale), _flash_bwd)


def flash_attention(q, k, v, scale=None):
    """q/k/v: [B, T, H, D] -> [B, T, H, D], f32 online softmax."""
    b, tq, h, d = q.shape
    tk = k.shape[1]
    if scale is None:
        scale = 1.0 / math.sqrt(d)
    # to d-major [B*H, D, T] (zero HBM padding; see module docstring)
    qf = q.transpose(0, 2, 3, 1).reshape(b * h, d, tq)
    kf = k.transpose(0, 2, 3, 1).reshape(b * h, d, tk)
    vf = v.transpose(0, 2, 3, 1).reshape(b * h, d, tk)
    out = _flash(qf, kf, vf, float(scale))
    return out.reshape(b, h, d, tq).transpose(0, 3, 1, 2)


def flash_attention_packed(qkv, scale=None, d_major_out=False):
    """Fused-projection self-attention: qkv [B, T, 3, H, D] -> [B, T, H, D]
    (or d-major [B, H*D, T] when d_major_out — callers can contract that
    layout directly with a DenseGeneral(axis=1) out-projection and skip the
    final transpose pair entirely).

    Skips the lane-dim split + three separate d-major transposes of the
    unpacked path: ONE fused reshape+transpose produces [3, B*H, D, T] and
    q/k/v are contiguous leading-dim slices of it (and dq/dk/dv concatenate
    back along the same leading dim on the grad path).
    """
    b, t, three, h, d = qkv.shape
    assert three == 3, qkv.shape
    if scale is None:
        scale = 1.0 / math.sqrt(d)
    # ONE minor-dim 2D transpose [b, t, 3hd] -> [b, 3hd, t] (well-tiled on
    # TPU, unlike a general 5D permute — measured 192 vs 178 ms/step for
    # the transpose(2,0,3,4,1) form), then leading-ish slices.
    f = jnp.swapaxes(qkv.reshape(b, t, 3 * h * d), 1, 2)
    f = f.reshape(b, 3, h, d, t)
    if _packed5_supported(b, h, d, t):
        # Zero-copy: q/k/v are BlockSpec views of f itself; dqkv comes
        # back as one [b,3,h,d,t] array (no slice copies / no concat).
        out = _flash_p5(f, float(scale))
    else:
        q = f[:, 0].reshape(b * h, d, t)
        k = f[:, 1].reshape(b * h, d, t)
        v = f[:, 2].reshape(b * h, d, t)
        out = _flash(q, k, v, float(scale))
    if d_major_out:
        return out.reshape(b, h * d, t)
    return out.reshape(b, h, d, t).transpose(0, 3, 1, 2)


# ------------------------------------------------------------------ #
# Zero-copy packed path: q/k/v are three BlockSpec VIEWS of the SAME
# [b, 3, h, d, t] buffer (the swapaxes'd fused projection) — no slice
# copies on the forward, and the backward writes dq/dk/dv into ONE
# [b, 3, h, d, t] output (no concatenate on the qkv gradient path).
# Restricted to single-q-block shapes (t == DEFAULT_BLOCK_Q, the DiT/
# flagship T=256 regime): every dqkv section is then written exactly
# once per grid step, so no cross-step f32 accumulation is needed.
# ------------------------------------------------------------------ #


def _pick_p5_bb(b: int, h: int, d: int, t: int):
    """Largest batch-block Bb such that (Bb*h) satisfies the Mosaic
    sublane rule for the [bh, t] lse block and the kernel's counted
    buffer bytes stay within _P5_SWEPT_BYTES — the exact counted bytes
    of the hardware-validated operating point (the count deliberately
    overstates actual VMEM residency — Mosaic double-buffers only a
    subset — so the budget exceeds the 64MB physical limit by design;
    see the calibration note).

    Sized off the BACKWARD (_bwd_kernel_p5), the larger of the two
    programs: d*t-shaped buffers — q/k/v/o/do inputs, the 3-section
    dqkv output, f32 copies of q/do/o, the f32 dq accumulator, and the
    per-iteration k/v/kt/vt/dvt/dkt tiles (block_k <= t) — plus the
    t*t-class f32 score tiles st/p/dp/ds. Counting worst-case 4-byte
    elements: ~12 d*t buffers and ~4 t*t tiles per row block. The
    budget is calibrated so the TPU-swept flagship operating point
    (rows=48, d=64, t=256 -> ~88MB counted; compiles and runs, PERF.md
    round-3 sweep) sits inside it — the point of the gate is that
    UNswept larger shapes route to _flash instead of failing Mosaic
    VMEM allocation at compile time."""
    for bb in (4, 2, 1):
        rows = bb * h
        if b % bb or (rows % 8 and rows != b * h):
            continue
        est = rows * t * t * 4 * 4 + rows * d * t * 4 * 12
        # Admit only up to the exact counted bytes of the hardware-
        # validated operating point: a round 90MB budget admitted unswept
        # shapes in the 88-90MB band with no evidence they compile, and a
        # Mosaic VMEM failure there is a hard compile error, not a
        # fallback. Raise only with a new swept point.
        if est <= _P5_SWEPT_BYTES:
            return bb
    return None


# Counted bytes of the largest TPU-swept p5 operating point (rows=48,
# d=64, t=256 — the flagship shape; PERF.md round-3 sweep) via the same
# `est` formula above: 48*(256*256*16 + 64*256*48) = 88,080,384.
_P5_SWEPT_BYTES = 88_080_384


def _packed5_supported(b, h, d, t) -> bool:
    return (t == DEFAULT_BLOCK_Q and t % DEFAULT_BLOCK_K == 0
            and d % 8 == 0 and d <= 128
            and _pick_p5_bb(b, h, d, t) is not None)


def _fwd_kernel_p5(q_ref, k_ref, v_ref, o_ref, lse_ref, *, scale, block_k,
                   seq_k):
    bb5, _, h, d, t = q_ref.shape
    bb = bb5 * h
    q = q_ref[...].reshape(bb, d, t).astype(jnp.float32) * scale

    def body(j, carry):
        acc, m_i, l_i = carry
        ks = pl.ds(j * block_k, block_k)
        k = k_ref[:, :, :, :, ks].reshape(bb, d, block_k).astype(jnp.float32)
        v = v_ref[:, :, :, :, ks].reshape(bb, d, block_k).astype(jnp.float32)
        kt = jnp.swapaxes(k, 1, 2)
        st = _bmm(kt, q, ((2,), (1,)))  # [bb, bk, bq]
        m_new = jnp.maximum(m_i, jnp.max(st, axis=1))
        alpha = jnp.exp(m_i - m_new)
        p = jnp.exp(st - m_new[:, None, :])
        acc = acc * alpha[:, None, :] + _bmm(v, p, ((2,), (1,)))
        l_i = l_i * alpha + jnp.sum(p, axis=1)
        return acc, m_new, l_i

    acc = jnp.zeros((bb, d, t), jnp.float32)
    m_i = jnp.full((bb, t), -1e30, jnp.float32)
    l_i = jnp.zeros((bb, t), jnp.float32)
    acc, m_i, l_i = jax.lax.fori_loop(
        0, seq_k // block_k, body, (acc, m_i, l_i))
    o_ref[...] = (acc / l_i[:, None, :]).astype(o_ref.dtype)
    lse_ref[...] = m_i + jnp.log(l_i)


def _bwd_kernel_p5(q_ref, k_ref, v_ref, o_ref, lse_ref, do_ref, dqkv_ref,
                   *, scale, block_k, seq_k):
    bb5, _, h, d, t = q_ref.shape
    bb = bb5 * h
    q = q_ref[...].reshape(bb, d, t).astype(jnp.float32) * scale
    do = do_ref[...].astype(jnp.float32)
    o = o_ref[...].astype(jnp.float32)
    lse = lse_ref[...]
    delta = jnp.sum(do * o, axis=1)
    qt = jnp.swapaxes(q, 1, 2)
    dot = jnp.swapaxes(do, 1, 2)

    def body(j, dq):
        ks = pl.ds(j * block_k, block_k)
        k = k_ref[:, :, :, :, ks].reshape(bb, d, block_k).astype(jnp.float32)
        v = v_ref[:, :, :, :, ks].reshape(bb, d, block_k).astype(jnp.float32)
        kt = jnp.swapaxes(k, 1, 2)
        vt = jnp.swapaxes(v, 1, 2)
        st = _bmm(kt, q, ((2,), (1,)))
        p = jnp.exp(st - lse[:, None, :])
        dp = _bmm(vt, do, ((2,), (1,)))
        ds = p * (dp - delta[:, None, :])
        dvt = _bmm(p, dot, ((2,), (1,)))
        dkt = _bmm(ds, qt, ((2,), (1,)))
        # single q block: each K section is written exactly once
        dqkv_ref[:, 2, :, :, ks] = jnp.swapaxes(dvt, 1, 2).reshape(
            bb5, h, d, block_k).astype(dqkv_ref.dtype)
        dqkv_ref[:, 1, :, :, ks] = jnp.swapaxes(dkt, 1, 2).reshape(
            bb5, h, d, block_k).astype(dqkv_ref.dtype)
        return dq + _bmm(k, ds, ((2,), (1,)))

    dq = jnp.zeros(q.shape, jnp.float32)
    dq = jax.lax.fori_loop(0, seq_k // block_k, body, dq)
    dqkv_ref[:, 0] = (dq * scale).reshape(bb5, h, d, t).astype(
        dqkv_ref.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def _flash_p5(f5, scale):
    out, _ = _flash_p5_fwd(f5, scale)
    return out


def _flash_p5_fwd(f5, scale):
    b, three, h, d, t = f5.shape
    bb = _pick_p5_bb(b, h, d, t)
    block_k = min(DEFAULT_BLOCK_K, t)
    kernel = functools.partial(
        _fwd_kernel_p5, scale=scale, block_k=block_k, seq_k=t)
    view = lambda j: pl.BlockSpec(  # noqa: E731
        (bb, 1, h, d, t), lambda i, j=j: (i, j, 0, 0, 0),
        memory_space=pltpu.VMEM)
    out, lse = pl.pallas_call(
        kernel,
        grid=(b // bb,),
        in_specs=[view(0), view(1), view(2)],
        out_specs=[
            pl.BlockSpec((bb * h, d, t), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bb * h, t), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b * h, d, t), f5.dtype),
            jax.ShapeDtypeStruct((b * h, t), jnp.float32),
        ],
        interpret=_interpret(),
        compiler_params=_COMPILER_PARAMS,
    )(f5, f5, f5)
    return out, (f5, out, lse)


def _flash_p5_bwd(scale, res, g):
    f5, out, lse = res
    b, three, h, d, t = f5.shape
    bb = _pick_p5_bb(b, h, d, t)
    block_k = min(DEFAULT_BLOCK_K, t)
    kernel = functools.partial(
        _bwd_kernel_p5, scale=scale, block_k=block_k, seq_k=t)
    view = lambda j: pl.BlockSpec(  # noqa: E731
        (bb, 1, h, d, t), lambda i, j=j: (i, j, 0, 0, 0),
        memory_space=pltpu.VMEM)
    ohd = lambda: pl.BlockSpec(  # noqa: E731
        (bb * h, d, t), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    dqkv = pl.pallas_call(
        kernel,
        grid=(b // bb,),
        in_specs=[view(0), view(1), view(2), ohd(),
                  pl.BlockSpec((bb * h, t), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
                  ohd()],
        out_specs=pl.BlockSpec((bb, 3, h, d, t),
                               lambda i: (i, 0, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, 3, h, d, t), f5.dtype),
        interpret=_interpret(),
        compiler_params=_COMPILER_PARAMS,
    )(f5, f5, f5, out, lse, g)
    return (dqkv,)


_flash_p5.defvjp(lambda f5, scale: _flash_p5_fwd(f5, scale), _flash_p5_bwd)


# ------------------------------------------------------------------ #
# t-major zero-transpose path (p6): the kernel consumes the RAW fused
# projection [b, t, 3hd] via three LANE-dim BlockSpec views (hd-lane
# chunks — no HBM padding, no host-side transposes at all), relayouts
# t-major -> d-major inside VMEM, and writes o / dqkv back t-major so
# the out-projection and the qkv Dense backward consume them natively.
# Same single-q-block gating as p5 (t == DEFAULT_BLOCK_Q).
# ------------------------------------------------------------------ #


def _packed6_supported(b, h, d, t) -> bool:
    return ((h * d) % 128 == 0 and _packed5_supported(b, h, d, t))


def _t2d(x5, Bb, t, h, d):
    """[Bb, t, hd] VMEM value -> d-major [Bb*h, d, t].

    Order matters for Mosaic: transpose the minor-2 dims FIRST (batched
    2D transpose), THEN split the now-sublane hd dim into (h, d) — a
    lane-dim split (t,hd)->(t,h,d) is an unsupported shape cast."""
    return x5.swapaxes(1, 2).reshape(Bb * h, d, t)


def _fwd_kernel_p6(q_ref, k_ref, v_ref, o_ref, lse_ref, *, scale, block_k,
                   seq_k, h):
    # Single-k-block regime (t == block_k, enforced by _packed6_supported):
    # no streaming loop — one softmax over the full score tile.
    Bb, t, hd = q_ref.shape
    d = hd // h
    q = _t2d(q_ref[...], Bb, t, h, d).astype(jnp.float32) * scale
    k = _t2d(k_ref[...], Bb, t, h, d).astype(jnp.float32)
    v = _t2d(v_ref[...], Bb, t, h, d).astype(jnp.float32)
    kt = jnp.swapaxes(k, 1, 2)
    st = _bmm(kt, q, ((2,), (1,)))           # [bb, tk, tq]
    m_i = jnp.max(st, axis=1)
    p = jnp.exp(st - m_i[:, None, :])
    l_i = jnp.sum(p, axis=1)
    acc = _bmm(v, p, ((2,), (1,)))           # [bb, d, tq]
    o = acc / l_i[:, None, :]
    # d-major -> t-major write: merge (h,d) on the sublane axis, then one
    # batched minor-2 transpose. [bb, d, t] -> [Bb, hd, t] -> [Bb, t, hd]
    o_ref[...] = o.reshape(Bb, h * d, t).swapaxes(1, 2).astype(o_ref.dtype)
    lse_ref[...] = m_i + jnp.log(l_i)


def _bwd_kernel_p6(q_ref, k_ref, v_ref, o_ref, lse_ref, do_ref, dqkv_ref,
                   *, scale, block_k, seq_k, h):
    Bb, t, hd3 = dqkv_ref.shape
    hd = hd3 // 3
    d = hd // h
    q = _t2d(q_ref[...], Bb, t, h, d).astype(jnp.float32) * scale
    k = _t2d(k_ref[...], Bb, t, h, d).astype(jnp.float32)
    v = _t2d(v_ref[...], Bb, t, h, d).astype(jnp.float32)
    do = _t2d(do_ref[...], Bb, t, h, d).astype(jnp.float32)
    o = _t2d(o_ref[...], Bb, t, h, d).astype(jnp.float32)
    lse = lse_ref[...]
    delta = jnp.sum(do * o, axis=1)
    qt = jnp.swapaxes(q, 1, 2)
    dot = jnp.swapaxes(do, 1, 2)

    def d2t(x):  # [bb, d, t] -> [Bb, t, hd] (merge majors, then minor-2
        # batched transpose — the Mosaic-supported order)
        return x.reshape(Bb, hd, t).swapaxes(1, 2)

    # Single k-block (t == block_k): straight-line, no streaming loop.
    kt = jnp.swapaxes(k, 1, 2)
    vt = jnp.swapaxes(v, 1, 2)
    st = _bmm(kt, q, ((2,), (1,)))
    p = jnp.exp(st - lse[:, None, :])
    dp = _bmm(vt, do, ((2,), (1,)))
    ds = p * (dp - delta[:, None, :])
    dv_ = jnp.swapaxes(_bmm(p, dot, ((2,), (1,))), 1, 2)   # [bb, d, t]
    dk_ = jnp.swapaxes(_bmm(ds, qt, ((2,), (1,))), 1, 2)
    dq_ = _bmm(k, ds, ((2,), (1,)))
    dqkv_ref[:, :, 0:hd] = d2t(dq_ * scale).astype(dqkv_ref.dtype)
    dqkv_ref[:, :, hd:2 * hd] = d2t(dk_).astype(dqkv_ref.dtype)
    dqkv_ref[:, :, 2 * hd:] = d2t(dv_).astype(dqkv_ref.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def _flash_p6(f, h, scale):
    out, _ = _flash_p6_fwd(f, h, scale)
    return out


def _flash_p6_fwd(f, h, scale):
    b, t, hd3 = f.shape
    hd = hd3 // 3
    d = hd // h
    bb = _pick_p5_bb(b, h, d, t)
    block_k = min(DEFAULT_BLOCK_K, t)
    kernel = functools.partial(
        _fwd_kernel_p6, scale=scale, block_k=block_k, seq_k=t, h=h)
    view = lambda j: pl.BlockSpec(  # noqa: E731
        (bb, t, hd), lambda i, j=j: (i, 0, j), memory_space=pltpu.VMEM)
    out, lse = pl.pallas_call(
        kernel,
        grid=(b // bb,),
        in_specs=[view(0), view(1), view(2)],
        out_specs=[
            pl.BlockSpec((bb, t, hd), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bb * h, t), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, t, hd), f.dtype),
            jax.ShapeDtypeStruct((b * h, t), jnp.float32),
        ],
        interpret=_interpret(),
        compiler_params=_COMPILER_PARAMS,
    )(f, f, f)
    return out, (f, out, lse)


def _flash_p6_bwd(h, scale, res, g):
    f, out, lse = res
    b, t, hd3 = f.shape
    hd = hd3 // 3
    d = hd // h
    bb = _pick_p5_bb(b, h, d, t)
    block_k = min(DEFAULT_BLOCK_K, t)
    kernel = functools.partial(
        _bwd_kernel_p6, scale=scale, block_k=block_k, seq_k=t, h=h)
    view = lambda j: pl.BlockSpec(  # noqa: E731
        (bb, t, hd), lambda i, j=j: (i, 0, j), memory_space=pltpu.VMEM)
    thd = lambda: pl.BlockSpec(  # noqa: E731
        (bb, t, hd), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    dqkv = pl.pallas_call(
        kernel,
        grid=(b // bb,),
        in_specs=[view(0), view(1), view(2), thd(),
                  pl.BlockSpec((bb * h, t), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
                  thd()],
        out_specs=pl.BlockSpec((bb, t, hd3), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, t, hd3), f.dtype),
        interpret=_interpret(),
        compiler_params=_COMPILER_PARAMS,
    )(f, f, f, out, lse, g)
    return (dqkv,)


_flash_p6.defvjp(
    lambda f, h, scale: _flash_p6_fwd(f, h, scale), _flash_p6_bwd)


def flash_attention_fused(qkv2d, num_heads, scale=None):
    """Fully t-major fused-projection attention: qkv2d [B, T, 3*H*D]
    (the raw Dense output) -> [B, T, H*D]. Zero host-side transposes.
    Caller must check flash_fused_supported first."""
    b, t, hd3 = qkv2d.shape
    d = hd3 // 3 // num_heads
    if scale is None:
        scale = 1.0 / math.sqrt(d)
    return _flash_p6(qkv2d, num_heads, float(scale))


def flash_fused_supported(b, num_heads, d, t) -> bool:
    return _packed6_supported(b, num_heads, d, t)
