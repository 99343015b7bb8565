"""TF1 GraphDef -> JAX compiler for the InceptionV3 metrics backend.

The reference computes FID features by running OpenAI's frozen TF1
InceptionV3 graph inside a TF session (reference: evaluations/evaluator.py
:574-620). This module instead *compiles* that frozen graph to a pure JAX
function: constants become closed-over arrays, ops become jnp/lax calls, and
the whole feature extractor jits onto the TPU MXU — no TF session at eval
time (TF is used only to parse the protobuf).

Bit-parity notes (SURVEY.md section 7 hard part 1):
- `ResizeBilinear` in the 2015 graph runs with align_corners=False under
  *legacy* TF1 sampling (src = dst * in/out, no half-pixel offset), which
  `jax.image.resize` does NOT reproduce — implemented exactly here.
- `BatchNormWithGlobalNormalization` (deprecated op used throughout the
  2015 graph) is evaluated in f32 as (x - m) / sqrt(v + eps) * gamma + beta.
- Convs accumulate in f32 (`preferred_element_type`).

Supported op set = the transitive closure of the pool_3 / spatial / softmax
heads of classify_image_graph_def.pb, plus common friends so small test
graphs compile too.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, List, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

__all__ = ["GraphDefFunction", "load_graph_def", "SUPPORTED_OPS"]


def load_graph_def(pb_path: str):
    """Parse a frozen GraphDef. TF is required only for protobuf parsing."""
    from tensorflow.core.framework import graph_pb2

    gd = graph_pb2.GraphDef()
    with open(pb_path, "rb") as f:
        gd.ParseFromString(f.read())
    return gd


# --------------------------------------------------------------------- #
# attr / tensor decoding
# --------------------------------------------------------------------- #

_DT_NP = {
    1: np.float32, 2: np.float64, 3: np.int32, 4: np.uint8, 5: np.int16,
    6: np.int8, 9: np.int64, 10: np.bool_, 17: np.uint16, 22: np.uint32,
    23: np.uint64,
}


def _const_value(node) -> np.ndarray:
    t = node.attr["value"].tensor
    dtype = _DT_NP.get(t.dtype)
    if dtype is None:
        raise NotImplementedError(f"Const dtype {t.dtype} ({node.name})")
    shape = [d.size for d in t.tensor_shape.dim]
    if t.tensor_content:
        arr = np.frombuffer(t.tensor_content, dtype=dtype)
        return arr.reshape(shape)
    for field in ("float_val", "double_val", "int_val", "int64_val",
                  "bool_val"):
        vals = getattr(t, field, None)
        if vals:
            arr = np.array(list(vals), dtype=dtype)
            if shape:
                if arr.size == 1:
                    arr = np.broadcast_to(arr, shape).copy()
                else:
                    arr = arr.reshape(shape)
            else:
                arr = arr.reshape(())
            return arr
    return np.zeros(shape, dtype=dtype)


def _attr_list_int(node, key) -> List[int]:
    return list(node.attr[key].list.i)


def _attr_s(node, key) -> str:
    return node.attr[key].s.decode()


def _ref(name: str) -> Tuple[str, int]:
    """'node:2' -> ('node', 2); control deps '^node' are skipped upstream."""
    if ":" in name:
        base, idx = name.rsplit(":", 1)
        return base, int(idx)
    return name, 0


# --------------------------------------------------------------------- #
# op kernels
# --------------------------------------------------------------------- #


def _resize_bilinear_tf1(x, out_hw, align_corners: bool):
    """Legacy TF1 ResizeBilinear: float source coords src = dst * scale with
    scale = in/out (align_corners=False) or (in-1)/(out-1) (True); edge
    clamp; bilinear lerp. No half-pixel offset (pre-TF2 semantics)."""
    n, in_h, in_w, c = x.shape
    out_h, out_w = int(out_hw[0]), int(out_hw[1])

    def axis_coords(in_sz, out_sz):
        if align_corners and out_sz > 1:
            scale = (in_sz - 1) / (out_sz - 1)
        else:
            scale = in_sz / out_sz
        src = np.arange(out_sz, dtype=np.float64) * scale
        lo = np.floor(src).astype(np.int64)
        lo = np.clip(lo, 0, in_sz - 1)
        hi = np.clip(lo + 1, 0, in_sz - 1)
        frac = (src - lo).astype(np.float32)
        return lo, hi, frac

    h_lo, h_hi, h_frac = axis_coords(in_h, out_h)
    w_lo, w_hi, w_frac = axis_coords(in_w, out_w)

    x = x.astype(jnp.float32)
    top = x[:, h_lo, :, :]
    bot = x[:, h_hi, :, :]
    hf = jnp.asarray(h_frac)[None, :, None, None]
    rows = top + (bot - top) * hf
    left = rows[:, :, w_lo, :]
    right = rows[:, :, w_hi, :]
    wf = jnp.asarray(w_frac)[None, None, :, None]
    return left + (right - left) * wf


def _pool(x, node, reducer, init, avg: bool):
    ksize = _attr_list_int(node, "ksize")
    strides = _attr_list_int(node, "strides")
    padding = _attr_s(node, "padding")
    out = lax.reduce_window(
        x.astype(jnp.float32), init, reducer,
        window_dimensions=tuple(ksize), window_strides=tuple(strides),
        padding=padding,
    )
    if avg:
        if padding == "VALID":
            out = out / float(np.prod(ksize))
        else:
            ones = jnp.ones(x.shape[1:3], jnp.float32)[None, :, :, None]
            counts = lax.reduce_window(
                ones, 0.0, lax.add, tuple(ksize), tuple(strides), padding
            )
            out = out / counts
    return out


def _conv2d(x, w, node):
    strides = _attr_list_int(node, "strides")
    padding = _attr_s(node, "padding")
    return lax.conv_general_dilated(
        x.astype(jnp.float32), w.astype(jnp.float32),
        window_strides=tuple(strides[1:3]), padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    )


def _matmul(a, b, node):
    if node.attr["transpose_a"].b:
        a = a.T
    if node.attr["transpose_b"].b:
        b = b.T
    return jnp.matmul(a, b, preferred_element_type=jnp.float32)


def _batch_norm_global(inputs, node):
    x, m, v, beta, gamma = [t.astype(jnp.float32) for t in inputs]
    eps = node.attr["variance_epsilon"].f
    inv = lax.rsqrt(v + eps)
    if node.attr["scale_after_normalization"].b:
        inv = inv * gamma
    return x * inv + (beta - m * inv)


_ELEMWISE = {
    "Add": jnp.add, "AddV2": jnp.add, "Sub": jnp.subtract,
    "Mul": jnp.multiply, "RealDiv": jnp.divide, "Maximum": jnp.maximum,
    "Minimum": jnp.minimum,
}

# Every GraphDef op _eval_node dispatches (audited against the
# classify_image_graph_def.pb census — the evaluated subgraph from the
# ExpandDims feed to pool_3/spatial/softmax, reference:
# evaluations/evaluator.py:587-614). tests/test_tf_graph.py asserts the
# expected census is covered; the VAW_INCEPTION_PB-gated test re-checks
# against the real pb's node list when present.
SUPPORTED_OPS = frozenset(
    list(_ELEMWISE)
    + [
        "Const", "Identity", "CheckNumerics", "StopGradient",
        "PlaceholderWithDefault", "BiasAdd", "Relu", "Relu6", "Rsqrt",
        "Sqrt", "Square", "Neg", "Softmax", "Conv2D", "MaxPool", "AvgPool",
        "BatchNormWithGlobalNormalization", "FusedBatchNorm",
        "FusedBatchNormV3", "Concat", "ConcatV2", "Reshape", "ExpandDims",
        "Squeeze", "Cast", "MatMul", "ResizeBilinear", "Pad", "Shape",
        "Mean",
    ]
)


# --------------------------------------------------------------------- #
# compiler
# --------------------------------------------------------------------- #


class GraphDefFunction:
    """Compiles named output tensors of a frozen GraphDef into a JAX fn.

    feed: maps tensor refs (e.g. "ExpandDims:0") to positional argument
    indices — the same mechanism as tf.import_graph_def's input_map
    (reference: evaluations/evaluator.py:591-597).
    """

    def __init__(self, graph_def, feeds: Sequence[str],
                 fetches: Sequence[str]):
        self.nodes = {n.name: n for n in graph_def.node}
        self.feeds = [_ref(f) for f in feeds]
        self.fetches = [_ref(f) for f in fetches]
        for name, _ in self.feeds + self.fetches:
            if name not in self.nodes:
                raise KeyError(f"node '{name}' not in graph")
        # Constants are materialized once (host) and closed over.
        self._consts: Dict[str, np.ndarray] = {}

    def const(self, name: str) -> np.ndarray:
        """Materialize a Const node's value (e.g. the softmax weight matrix,
        reference: evaluations/evaluator.py:613-620)."""
        node = self.nodes[_ref(name)[0]]
        assert node.op == "Const", node.op
        if node.name not in self._consts:
            self._consts[node.name] = _const_value(node)
        return self._consts[node.name]

    # -- evaluation -------------------------------------------------- #

    def __call__(self, *args):
        feed_map = {self.feeds[i]: a for i, a in enumerate(args)}
        memo: Dict[Tuple[str, int], Any] = dict(feed_map)

        def ev(ref: Tuple[str, int]):
            if ref in memo:
                return memo[ref]
            name, idx = ref
            node = self.nodes[name]
            ins = [ev(_ref(i)) for i in node.input
                   if not i.startswith("^")]
            outs = self._eval_node(node, ins, memo)
            if not isinstance(outs, (list, tuple)):
                outs = (outs,)
            for j, o in enumerate(outs):
                memo[(name, j)] = o
            return memo[ref]

        results = [ev(r) for r in self.fetches]
        return results[0] if len(results) == 1 else tuple(results)

    def jit(self) -> Callable:
        return jax.jit(self.__call__)

    # -- per-op dispatch --------------------------------------------- #

    def _eval_node(self, node, ins, memo):
        op = node.op
        if op == "Const":
            # Stays numpy: shape-feeding consts (resize sizes, concat axes,
            # reshape targets) must be static under jit, and jnp.asarray
            # would trace them into tracers on current JAX.
            if node.name not in self._consts:
                self._consts[node.name] = _const_value(node)
            return self._consts[node.name]
        if op in ("Identity", "CheckNumerics", "StopGradient", "PlaceholderWithDefault"):
            return ins[0]
        if op in _ELEMWISE:
            return _ELEMWISE[op](ins[0], ins[1])
        if op == "BiasAdd":
            return ins[0] + ins[1]
        if op == "Relu":
            return jnp.maximum(ins[0], 0)
        if op == "Relu6":
            return jnp.clip(ins[0], 0, 6)
        if op == "Rsqrt":
            return lax.rsqrt(ins[0].astype(jnp.float32))
        if op == "Sqrt":
            return jnp.sqrt(ins[0].astype(jnp.float32))
        if op == "Square":
            return jnp.square(ins[0])
        if op == "Neg":
            return -ins[0]
        if op == "Softmax":
            return jax.nn.softmax(ins[0].astype(jnp.float32), axis=-1)
        if op == "Conv2D":
            return _conv2d(ins[0], ins[1], node)
        if op == "MaxPool":
            return _pool(ins[0], node, lax.max, -jnp.inf, avg=False)
        if op == "AvgPool":
            return _pool(ins[0], node, lax.add, 0.0, avg=True)
        if op == "BatchNormWithGlobalNormalization":
            return _batch_norm_global(ins, node)
        if op == "FusedBatchNorm" or op == "FusedBatchNormV3":
            x, gamma, beta, m, v = [t.astype(jnp.float32) for t in ins]
            eps = node.attr["epsilon"].f
            inv = lax.rsqrt(v + eps) * gamma
            return (x * inv + (beta - m * inv),)
        if op == "Concat":  # old style: dim is input[0]
            axis = int(np.asarray(ins[0]))
            return jnp.concatenate(ins[1:], axis=axis)
        if op == "ConcatV2":  # axis is the LAST input
            axis = int(np.asarray(ins[-1]))
            return jnp.concatenate(ins[:-1], axis=axis)
        if op == "Reshape":
            shape = [int(s) for s in np.asarray(ins[1])]
            return jnp.reshape(ins[0], shape)
        if op == "ExpandDims":
            return jnp.expand_dims(ins[0], int(np.asarray(ins[1])))
        if op == "Squeeze":
            dims = _attr_list_int(node, "squeeze_dims")
            return jnp.squeeze(
                ins[0], axis=tuple(dims) if dims else None
            )
        if op == "Cast":
            return ins[0].astype(_DT_NP[node.attr["DstT"].type])
        if op == "MatMul":
            return _matmul(ins[0], ins[1], node)
        if op == "ResizeBilinear":
            out_hw = np.asarray(ins[1])
            return _resize_bilinear_tf1(
                ins[0], out_hw, node.attr["align_corners"].b
            )
        if op == "Pad":
            pads = np.asarray(ins[1])
            return jnp.pad(ins[0], [(int(a), int(b)) for a, b in pads])
        if op == "Shape":
            return jnp.asarray(ins[0].shape, jnp.int32)
        if op == "Mean":
            axes = tuple(int(a) for a in np.asarray(ins[1]))
            return jnp.mean(
                ins[0], axis=axes, keepdims=node.attr["keep_dims"].b
            )
        raise NotImplementedError(
            f"GraphDef op '{op}' (node '{node.name}') not supported"
        )
