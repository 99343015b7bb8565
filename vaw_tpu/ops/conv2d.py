"""Pallas 3x3 conv for the ADM UNet hot path (stride 1, symmetric pad).

Why: XLA:TPU's conv lowering reaches only ~54% MFU on the ADM-64 decoder
shapes (PERF.md round-2 anatomy — 286 ms of a 384 ms step in conv fusions;
reference hot stack: models/unet.py:397-687). The kernel here reformulates
the 3x3 conv as ONE implicit-GEMM per spatial tile:

    t9  = x_tile[(TH+2)x(W+2), Cin] @ w[Cin, 9*Cout]     (MXU, lanes ~full)
    out = sum_taps t9[dy:dy+TH, dx:dx+W, tap-slab]       (VPU shifted adds)

so the tap dimension rides the MXU lane axis (9*Cout = 1728 lanes for
Cout=192 vs 192 -> 75% padding in the native lowering) and the t9
intermediate never leaves VMEM (the same decomposition in pure XLA
materializes a 9x activation tensor in HBM).

The input row-halo is DMA'd manually from HBM (overlapping windows cannot
be expressed with BlockSpec index maps).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["conv3x3", "conv3x3_pallas", "conv3x3_wgrad_pallas",
           "conv3x3_supported", "use_pallas_conv"]


def use_pallas_conv() -> bool:
    """Routing flag for the UNet 3x3 convs (models/unet.py _conv): opt-in
    via VAW_PALLAS_CONV=1 until the TPU benchmark table
    (probes/_conv_probe.py -> PERF.md) decides the default."""
    return os.environ.get("VAW_PALLAS_CONV", "0") == "1"


def _fwd_kernel(xp_ref, wf_ref, out_ref, xtile, sem, *, TH, W, WP, cin,
                cout):
    n = pl.program_id(0)
    i = pl.program_id(1)
    cp = pltpu.make_async_copy(
        xp_ref.at[n, pl.ds(i * TH, TH + 2)], xtile, sem
    )
    cp.start()
    cp.wait()
    m = (TH + 2) * WP
    t9 = jax.lax.dot_general(
        xtile[...].reshape(m, cin), wf_ref[...],
        (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
    ).reshape(TH + 2, WP, 9 * cout)
    acc = None
    for dy in range(3):
        for dx in range(3):
            tap = dy * 3 + dx
            s = t9[dy:dy + TH, dx:dx + W, tap * cout:(tap + 1) * cout]
            acc = s if acc is None else acc + s
    out_ref[0] = acc.astype(out_ref.dtype)


def conv3x3_supported(shape, cout, tile_h=8, *, itemsize) -> bool:
    """itemsize (required, keyword-only): bytes per element of the conv's
    compute dtype (2 for the usual bf16 amp path, 4 for f32) — a default
    would silently re-open the f32 under-estimation. The f32 budget
    matters: shapes that
    fit the 12MB gate at 2 B/elem (e.g. the decoder skip-concat
    geometries cin=1152,cout=192,w=8) need >16MB at 4 B/elem and would
    fail Mosaic's scoped-VMEM allocation at compile time instead of
    falling back to XLA."""
    n, h, w, cin = shape
    # w%8: the output block's sublane (width) dim must be tile-aligned.
    if not (h % tile_h == 0 and h >= tile_h and w % 8 == 0):
        return False
    # Scoped-VMEM budget (16 MB on v5e): every kernel this conv can spawn
    # (fwd, dgrad = fwd with cin/cout swapped, wgrad) must fit. The
    # high-channel 8px blocks (e.g. 768->1536) exceed it — leave to XLA.
    wp = w + 2 + ((-(w + 2)) % 8)
    b = itemsize

    def fwd_est(ci, co):
        ci_p = ci + ((-ci) % 128)
        return (ci_p * 9 * co * b               # wf block
                + (tile_h + 2) * wp * ci_p * b  # xtile scratch
                + (tile_h + 2) * wp * 9 * co * 4  # t9 + acc (f32 stack)
                + tile_h * w * co * b)          # out block

    cin_p = cin + ((-cin) % 128)
    wgrad_est = ((tile_h + 2) * wp * cin_p * b      # xtile
                 + (tile_h + 2) * wp * 9 * cout * b  # gpad scratch
                 + cin_p * 9 * cout * 4             # dw accum block
                 + tile_h * w * cout * b)           # g block
    est = max(fwd_est(cin, cout), fwd_est(cout, cin), wgrad_est)
    return est <= 12 * 1024 * 1024


@functools.partial(jax.jit, static_argnames=("tile_h",))
def conv3x3_pallas(x, w, tile_h: int = 8):
    """y = conv3x3(x, w), stride 1, pad 1. x [N,H,W,Cin] (bf16/f32),
    w [3,3,Cin,Cout]. Output dtype follows x."""
    n, h, wd, cin = x.shape
    cout = w.shape[-1]
    assert w.shape[:3] == (3, 3, cin), w.shape
    assert h % tile_h == 0, (h, tile_h)
    # Mosaic tiling constraints on the manually-DMA'd HBM input: the lane
    # (channel) dim must be 128-aligned and the sublane (width) dim of both
    # the HBM slice and the VMEM tile 8-aligned. Pad Cin to 128 (free — the
    # MXU K dim pads to 128 regardless) and W+2 up to a multiple of 8 (the
    # extra zero columns fall outside every dx tap slice, so they never
    # contribute).
    cpad = (-cin) % 128
    cin_p = cin + cpad
    wp = wd + 2 + ((-(wd + 2)) % 8)
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, wp - wd - 1), (0, cpad)))
    wf = jnp.pad(w.astype(x.dtype), ((0, 0), (0, 0), (0, cpad), (0, 0))
                 ).transpose(2, 0, 1, 3).reshape(cin_p, 9 * cout)
    cin = cin_p

    kernel = functools.partial(
        _fwd_kernel, TH=tile_h, W=wd, WP=wp, cin=cin, cout=cout)
    return pl.pallas_call(
        kernel,
        grid=(n, h // tile_h),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((cin, 9 * cout), lambda ni, ii: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile_h, wd, cout),
                               lambda ni, ii: (ni, ii, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((n, h, wd, cout), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((tile_h + 2, wp, cin), x.dtype),
            pltpu.SemaphoreType.DMA,
        ],
    )(xp, wf)


def _wgrad_kernel(xp_ref, g_ref, dw_ref, xtile, gpad, sem, *,
                  TH, W, WP, cin, cout):
    n = pl.program_id(0)
    i = pl.program_id(1)
    cp = pltpu.make_async_copy(
        xp_ref.at[n, pl.ds(i * TH, TH + 2)], xtile, sem
    )
    cp.start()

    @pl.when(jnp.logical_and(n == 0, i == 0))
    def _():
        dw_ref[...] = jnp.zeros_like(dw_ref)

    # G[(u,v), tap*cout+co] = g zero-padded to the halo grid, shifted by
    # the tap offset: dw_tap = sum_p x_pad[p] (x) G[p, tap-slab].
    gpad[...] = jnp.zeros_like(gpad)
    g = g_ref[0]
    for dy in range(3):
        for dx in range(3):
            tap = dy * 3 + dx
            gpad[dy:dy + TH, dx:dx + W,
                 tap * cout:(tap + 1) * cout] = g
    cp.wait()
    m = (TH + 2) * WP
    dw_ref[...] += jax.lax.dot_general(
        xtile[...].reshape(m, cin), gpad[...].reshape(m, 9 * cout),
        (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32,
    )


@functools.partial(jax.jit, static_argnames=("tile_h",))
def conv3x3_wgrad_pallas(x, g, tile_h: int = 8):
    """dw[3,3,Cin,Cout] = wgrad of conv3x3(x, .) against cotangent g
    ([N,H,W,Cout]). One implicit GEMM per spatial tile, accumulated into
    the (constant-block) f32 output across the sequential TPU grid."""
    n, h, wd, cin = x.shape
    cout = g.shape[-1]
    assert g.shape == (n, h, wd, cout), (x.shape, g.shape)
    assert h % tile_h == 0, (h, tile_h)
    cpad = (-cin) % 128
    cin_p = cin + cpad
    wp = wd + 2 + ((-(wd + 2)) % 8)
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, wp - wd - 1), (0, cpad)))

    kernel = functools.partial(
        _wgrad_kernel, TH=tile_h, W=wd, WP=wp, cin=cin_p, cout=cout)
    dw = pl.pallas_call(
        kernel,
        grid=(n, h // tile_h),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, tile_h, wd, cout),
                         lambda ni, ii: (ni, ii, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((cin_p, 9 * cout), lambda ni, ii: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((cin_p, 9 * cout), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((tile_h + 2, wp, cin_p), x.dtype),
            pltpu.VMEM((tile_h + 2, wp, 9 * cout), g.dtype),
            pltpu.SemaphoreType.DMA,
        ],
    )(xp, g)
    dw = dw[:cin].reshape(cin, 3, 3, cout).transpose(1, 2, 0, 3)
    return dw.astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def conv3x3(x, w, tile_h: int = 8):
    """Differentiable Pallas 3x3 conv (stride 1, pad 1): fwd implicit-GEMM
    kernel; bwd dgrad reuses the fwd kernel on the 180-rotated transposed
    filter, wgrad is its own accumulate kernel."""
    return conv3x3_pallas(x, w, tile_h=tile_h)


def _conv3x3_fwd(x, w, tile_h):
    return conv3x3_pallas(x, w, tile_h=tile_h), (x, w)


def _conv3x3_bwd(tile_h, res, g):
    x, w = res
    # dgrad: conv of g with the spatially-rotated, in/out-swapped filter
    w_rot = w[::-1, ::-1].transpose(0, 1, 3, 2)
    dx = conv3x3_pallas(g, w_rot.astype(g.dtype), tile_h=tile_h)
    dw = conv3x3_wgrad_pallas(x, g, tile_h=tile_h).astype(w.dtype)
    return dx, dw


conv3x3.defvjp(_conv3x3_fwd, _conv3x3_bwd)
