"""Fused nearest-2x upsample + 3x3 conv (stride 1, SAME) as four phase
convolutions — an exact algebraic rewrite, not an approximation.

The reference pattern `conv3x3(F.interpolate(x, scale_factor=2, mode=
"nearest"))` appears in every decoder/up path (reference: models/unet.py:
81-110 Upsample, :143-256 ResBlock up; the SD VAE decoder mirrors it).
Lowered naively on TPU it (a) materializes the 4x-size upsampled tensor in
HBM and (b) runs a 3x3 conv over it: 36·H·W·Cin·Cout MACs per image.

Because nearest upsampling repeats each input pixel into a 2x2 block, every
output pixel of the big conv reads only a 2x2 neighborhood of DISTINCT
input pixels, with weights that depend only on the output parity (a, b) =
(p mod 2, q mod 2). Grouping the 3x3 taps by the input pixel they land on
gives four 2x2 kernels:

    row tap map (parity a=0): u=0 <- {t=-1},  u=1 <- {t=0, t=+1}
    row tap map (parity a=1): u=0 <- {t=-1, t=0},  u=1 <- {t=+1}

(and identically for columns), i.e. K_ab[u, v] = sum of w3[t_r, t_c] over
the taps mapping to (u, v). One VALID 2x2 conv over the 1-padded input with
the [2, 2, Cin, 4*Cout] phase-stacked kernel computes all four phases at
once — 16·H·W·Cin·Cout MACs (2.25x fewer) and no upsampled intermediate;
the phases interleave back with a reshape/transpose. Autodiff flows through
the kernel-combination and the small conv, so no custom_vjp is needed.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

__all__ = [
    "nearest2x_conv3x3",
    "nearest2x_conv3x3_reference",
    "upsample_nearest2x",
    "fused_upsample_conv_enabled",
]


def fused_upsample_conv_enabled() -> bool:
    """Opt-in switch (VAW_FUSED_UPSAMPLE=1) for the fused phase-conv path.

    Default OFF: the round-5 on-TPU A/B (probes/_r5_decode_ab.py, v5e,
    6-trial wall + profiler device time) measured the fused path 10.7%
    SLOWER on the SD-VAE 256px decode (492 vs 444 device ms/batch-128) —
    the 2.25x MAC saving (conv 430 -> 368 ms) is more than repaid by the
    phase de-stack's data-formatting cost (+124 ms) — and neutral on the
    ADM-64 train step (358.1 vs 359.7 ms/step). PERF.md "Fused nearest-2x
    upsample" has the full table. The rewrite stays available (exact in
    values and gradients, tests/test_ops.py) for shapes where the balance
    may differ.
    """
    return os.environ.get("VAW_FUSED_UPSAMPLE", "0") == "1"


def upsample_nearest2x(x):
    """[N, H, W, C] -> [N, 2H, 2W, C] by pixel repetition."""
    n, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (n, h, 2, w, 2, c))
    return x.reshape(n, 2 * h, 2 * w, c)


def nearest2x_conv3x3_reference(x, w3):
    """Unfused reference: nearest-2x upsample, then SAME 3x3 conv."""
    return jax.lax.conv_general_dilated(
        upsample_nearest2x(x), w3, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def _phase_kernel(w3):
    """[3, 3, Cin, Cout] -> [2, 2, Cin, 4*Cout] phase-stacked kernel.
    Output channel block ab = 2a + b holds K_ab (a = row parity)."""
    # per-dimension tap sums: rows of the 3x3 kernel grouped by the input
    # tap they hit at each parity
    def groups(w, axis, parity):
        t = [jnp.take(w, i, axis=axis) for i in range(3)]
        if parity == 0:
            return [t[0], t[1] + t[2]]
        return [t[0] + t[1], t[2]]

    phases = []
    for a in (0, 1):
        rows = groups(w3, 0, a)  # two [3, Cin, Cout] row-combined slabs
        for b in (0, 1):
            k = jnp.stack(
                [jnp.stack(groups(r, 0, b), axis=0) for r in rows], axis=0)
            phases.append(k)  # [2, 2, Cin, Cout]
    return jnp.concatenate(phases, axis=-1)  # [2, 2, Cin, 4*Cout]


def nearest2x_conv3x3(x, w3, kernel_dtype=None):
    """Fused nearest-2x upsample + SAME 3x3 conv.

    x: [N, H, W, Cin] (NHWC), w3: [3, 3, Cin, Cout] (HWIO) ->
    [N, 2H, 2W, Cout]; bit-equivalent to nearest2x_conv3x3_reference up to
    fp reassociation of the kernel-tap sums. kernel_dtype casts the
    phase-stacked kernel AFTER the tap sums (pass the compute dtype with a
    f32 w3 to keep the sums in f32 under an amp policy).
    """
    n, h, w, cin = x.shape
    cout = w3.shape[-1]
    k = _phase_kernel(w3)
    if kernel_dtype is not None:
        k = k.astype(kernel_dtype)
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    # one VALID 2x2 conv computes every phase at every offset
    out = jax.lax.conv_general_dilated(
        xp, k, (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))  # [N, H+1, W+1, 4*Cout]
    out = out.reshape(n, h + 1, w + 1, 4, cout)
    # phase (a, b) lives at out[:, q+a, r+b, 2a+b]; interleave to
    # y[:, 2q+a, 2r+b]
    z = jnp.stack(
        [out[:, a:a + h, b:b + w, 2 * a + b]
         for a in (0, 1) for b in (0, 1)],
        axis=3)  # [N, H, W, 4, Cout]
    z = z.reshape(n, h, w, 2, 2, cout).transpose(0, 1, 3, 2, 4, 5)
    return z.reshape(n, 2 * h, 2 * w, cout)
