"""upfirdn2d — upsample, FIR filter, downsample (StyleGAN2 resampling).

TPU-native equivalent of the reference's tiled CUDA kernel + double-backward
autograd wrapper (reference: tools/op/upfirdn2d_kernel.cu:49-368,
tools/op/upfirdn2d.cpp:17-31, tools/op/upfirdn2d.py:20-209). On TPU the
right formulation is a single `lax.conv_general_dilated`: the upsample is
lhs dilation, the pad is conv padding, and the downsample is the conv
stride — XLA lowers this straight onto the MXU and differentiates it to any
order, which subsumes the hand-written gradient geometry of the reference
(the flipped-kernel + complementary-pad backward at upfirdn2d.py:104-117
is exactly the transposed convolution XLA derives). A hand-rolled Pallas
kernel would only re-implement what the MXU conv already does optimally,
so none is used (SURVEY.md section 7, hard part 2).

Layout: NHWC; the per-channel (depthwise) FIR filter is applied with
feature_group_count = C.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["upfirdn2d", "make_kernel", "upsample2d", "downsample2d", "blur",
           "no_weight_gradients"]


def make_kernel(k) -> np.ndarray:
    """Normalize a 1D/2D FIR kernel (StyleGAN2 make_kernel semantics)."""
    k = np.asarray(k, dtype=np.float64)
    if k.ndim == 1:
        k = np.outer(k, k)
    k /= k.sum()
    return k.astype(np.float32)


def upfirdn2d(x, kernel, up=1, down=1, pad=(0, 0)):
    """x: [N, H, W, C]; kernel: [kh, kw] FIR filter applied per channel.

    Semantics (reference: tools/op/upfirdn2d.py:149-209 native path):
      1. zero-stuff by `up` (insert up-1 zeros between pixels),
      2. pad by (pad[0], pad[1]) on both spatial dims (negative pad crops),
      3. correlate with `kernel`,
      4. subsample by `down`.
    """
    if isinstance(up, int):
        up_x = up_y = up
    else:
        up_x, up_y = up
    if isinstance(down, int):
        down_x = down_y = down
    else:
        down_x, down_y = down
    pad_x0, pad_x1 = pad[0], pad[1]
    pad_y0, pad_y1 = (pad[2], pad[3]) if len(pad) == 4 else (pad[0], pad[1])

    n, h, w, c = x.shape
    kh, kw = kernel.shape

    # Depthwise conv: rhs [kh, kw, 1, C] with feature_group_count=C.
    # The reference correlates with the FLIPPED kernel
    # (tools/op/upfirdn2d.py:193: conv2d with torch.flip(kernel)), i.e. a
    # true convolution with `kernel`; XLA's conv op is a correlation, so
    # flip here to match.
    rhs = jnp.broadcast_to(
        jnp.asarray(kernel, x.dtype)[::-1, ::-1][:, :, None, None],
        (kh, kw, 1, c),
    )

    # Negative pads crop: conv padding must be >= 0, so split into conv pad
    # and explicit crop.
    def split_pad(p):
        return (max(p, 0), -min(p, 0))

    (py0, cy0), (py1, cy1) = split_pad(pad_y0), split_pad(pad_y1)
    (px0, cx0), (px1, cx1) = split_pad(pad_x0), split_pad(pad_x1)

    # The reference zero-stuffs to h*up rows (up-1 trailing zeros kept,
    # tools/op/upfirdn2d.py:176-180) BEFORE padding, so the effective
    # bottom/right pad is pad_1 + (up - 1); XLA's lhs_dilation produces
    # h*up - (up-1) rows, so fold the difference into the conv padding.
    py1_eff = py1 + (up_y - 1)
    px1_eff = px1 + (up_x - 1)

    if cy0 or cy1 or cx0 or cx1:
        # Negative pads crop after zero-stuffing: materialize the stuffed
        # tensor, pad/crop explicitly, then a plain strided conv.
        x_up = jnp.zeros((n, h * up_y, w * up_x, c), x.dtype)
        x_up = x_up.at[:, ::up_y, ::up_x, :].set(x)
        x_up = jnp.pad(x_up, ((0, 0), (py0, py1), (px0, px1), (0, 0)))
        x_up = x_up[
            :, cy0: x_up.shape[1] - cy1, cx0: x_up.shape[2] - cx1, :
        ]
        out = jax.lax.conv_general_dilated(
            x_up, rhs, window_strides=(down_y, down_x), padding="VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=c,
        )
        return out

    out = jax.lax.conv_general_dilated(
        x, rhs,
        window_strides=(down_y, down_x),
        padding=((py0, py1_eff), (px0, px1_eff)),
        lhs_dilation=(up_y, up_x),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
    )
    return out


def upsample2d(x, kernel=(1, 3, 3, 1), factor=2, gain=1):
    """StyleGAN2 upsample: zero-stuff + FIR, gain-corrected."""
    k = make_kernel(kernel) * (gain * factor ** 2)
    p = k.shape[0] - factor
    return upfirdn2d(
        x, k, up=factor, pad=((p + 1) // 2 + factor - 1, p // 2)
    )


def downsample2d(x, kernel=(1, 3, 3, 1), factor=2, gain=1):
    k = make_kernel(kernel) * gain
    p = k.shape[0] - factor
    return upfirdn2d(x, k, down=factor, pad=((p + 1) // 2, p // 2))


def blur(x, kernel=(1, 3, 3, 1), pad=(2, 1)):
    return upfirdn2d(x, make_kernel(kernel), pad=pad)


def no_weight_gradients(conv_fn):
    """Equivalent of the reference's conv2d_gradfix.no_weight_gradients
    (reference: tools/op/conv2d_gradfix.py:22-48): on TPU XLA convs are
    natively differentiable to second order, so suppressing the weight
    gradient is a stop_gradient on the kernel operand."""

    def wrapped(x, w, *args, **kwargs):
        return conv_fn(x, jax.lax.stop_gradient(w), *args, **kwargs)

    return wrapped
