"""InceptionV3 feature backend for FID/sFID/IS.

The reference embeds OpenAI's TF1 frozen InceptionV3 graph and evaluates
pool_3 (2048-d) and mixed_6/conv[..., :7] spatial features
(reference: evaluations/evaluator.py:21-25, 574-620). Bit-matched mu/sigma
against that graph is the FID-parity requirement (SURVEY.md section 7 hard
part 1), so this backend runs the SAME frozen graph through TF (present in
the image); the graph file is looked up locally (zero-egress environments)
with an optional download fallback when networking exists.
"""

from __future__ import annotations

import os
import random
from typing import Optional, Tuple

import numpy as np

__all__ = ["InceptionV3Features", "InceptionV3JAXFeatures",
           "make_inception_backend", "find_inception_pb"]

INCEPTION_V3_URL = (
    "https://openaipublic.blob.core.windows.net/diffusion/jul-2021/"
    "ref_batches/classify_image_graph_def.pb"
)
FID_POOL_NAME = "pool_3:0"
FID_SPATIAL_NAME = "mixed_6/conv:0"


def find_inception_pb() -> Optional[str]:
    candidates = [
        os.environ.get("VAW_INCEPTION_PB", ""),
        "classify_image_graph_def.pb",
        os.path.join("evaluations", "classify_image_graph_def.pb"),
        os.path.join("reference_batches", "classify_image_graph_def.pb"),
        "/tmp/classify_image_graph_def.pb",
    ]
    for c in candidates:
        if c and os.path.exists(c):
            return c
    return None


def _maybe_download(path: str = "/tmp/classify_image_graph_def.pb"
                    ) -> Optional[str]:
    try:
        import requests

        with requests.get(INCEPTION_V3_URL, stream=True, timeout=30) as r:
            r.raise_for_status()
            tmp = path + ".tmp"
            with open(tmp, "wb") as f:
                for chunk in r.iter_content(chunk_size=1 << 20):
                    f.write(chunk)
            os.rename(tmp, path)
        return path
    except Exception:  # noqa: BLE001 — zero-egress environments
        return None


class InceptionV3Features:
    """TF1 frozen-graph pool_3 + spatial features + softmax head
    (reference: evaluations/evaluator.py:123-141, 585-620)."""

    def __init__(self, pb_path: Optional[str] = None, batch_size: int = 64,
                 softmax_batch_size: int = 512):
        pb_path = pb_path or find_inception_pb() or _maybe_download()
        if pb_path is None:
            raise FileNotFoundError(
                "InceptionV3 frozen graph not found; set VAW_INCEPTION_PB or "
                "place classify_image_graph_def.pb in ./evaluations/"
            )
        import tensorflow.compat.v1 as tf

        tf.disable_eager_execution()
        self.tf = tf
        self.batch_size = batch_size
        self.softmax_batch_size = softmax_batch_size
        config = tf.ConfigProto(allow_soft_placement=True)
        self.sess = tf.Session(config=config)

        with open(pb_path, "rb") as f:
            graph_def = tf.GraphDef()
            graph_def.ParseFromString(f.read())

        with self.sess.graph.as_default():
            self.image_input = tf.placeholder(
                tf.float32, shape=[None, None, None, 3]
            )
            prefix = f"{random.randrange(2**32)}_{random.randrange(2**32)}"
            pool3, spatial = tf.import_graph_def(
                graph_def,
                input_map={"ExpandDims:0": self.image_input},
                return_elements=[FID_POOL_NAME, FID_SPATIAL_NAME],
                name=prefix,
            )
            self._unbatch_shapes(pool3)
            self.pool_features = pool3
            # Only the first 7 spatial channels feed sFID
            # (reference: evaluations/evaluator.py:600-601).
            self.spatial_features = spatial[..., :7]

            prefix2 = f"{random.randrange(2**32)}_{random.randrange(2**32)}"
            (matmul,) = tf.import_graph_def(
                graph_def, return_elements=["softmax/logits/MatMul"],
                name=prefix2,
            )
            w = matmul.inputs[1]
            self.softmax_input = tf.placeholder(
                tf.float32, shape=[None, int(w.shape[0])]
            )
            self.softmax = tf.nn.softmax(tf.matmul(self.softmax_input, w))

    @staticmethod
    def _unbatch_shapes(pool3):
        """Clear the frozen batch-1 static shapes so arbitrary batch sizes
        flow through (TTUR trick, reference: evaluations/evaluator.py:622-638).
        """
        import tensorflow.compat.v1 as tf

        for op in pool3.graph.get_operations():
            for o in op.outputs:
                shape = o.get_shape()
                if shape._dims is not None:  # noqa: SLF001
                    dims = [s for s in shape]
                    new_shape = [
                        None if (j == 0 and s == 1) else s
                        for j, s in enumerate(dims)
                    ]
                    o.__dict__["_shape_val"] = tf.TensorShape(new_shape)

    def features(self, batch: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
        """NHWC uint8-range floats [0,255] -> (pool[N,2048], spatial[N,...])"""
        pool, spatial = self.sess.run(
            [self.pool_features, self.spatial_features],
            {self.image_input: batch.astype(np.float32)},
        )
        return (
            pool.reshape(pool.shape[0], -1),
            spatial.reshape(spatial.shape[0], -1),
        )

    def softmax_probs(self, pool_features: np.ndarray) -> np.ndarray:
        out = []
        for i in range(0, len(pool_features), self.softmax_batch_size):
            out.append(self.sess.run(
                self.softmax,
                {self.softmax_input: pool_features[i: i + self.softmax_batch_size]},
            ))
        return np.concatenate(out, axis=0)


class InceptionV3JAXFeatures:
    """TPU-native Inception backend: the frozen TF1 graph compiled to a
    jitted JAX function (evals/tf_graph.py) — same weights, same ops, no TF
    session in the eval hot path. Feature semantics match the reference
    (pool_3 + mixed_6/conv[..., :7], softmax over pool @ W with no bias,
    reference: evaluations/evaluator.py:585-620)."""

    def __init__(self, pb_path: Optional[str] = None, batch_size: int = 64,
                 softmax_batch_size: int = 512):
        pb_path = pb_path or find_inception_pb() or _maybe_download()
        if pb_path is None:
            raise FileNotFoundError(
                "InceptionV3 frozen graph not found; set VAW_INCEPTION_PB or "
                "place classify_image_graph_def.pb in ./evaluations/"
            )
        import jax
        import jax.numpy as jnp

        from .tf_graph import GraphDefFunction, load_graph_def

        self.batch_size = batch_size
        self.softmax_batch_size = softmax_batch_size
        gd = load_graph_def(pb_path)
        fn = GraphDefFunction(
            gd, feeds=["ExpandDims:0"],
            fetches=[FID_POOL_NAME, FID_SPATIAL_NAME],
        )
        self._graph_fn = fn

        def run(x):
            pool, spatial = fn(x)
            return (
                pool.reshape(pool.shape[0], -1),
                # Only the first 7 spatial channels feed sFID
                # (reference: evaluations/evaluator.py:600-601).
                spatial[..., :7].reshape(spatial.shape[0], -1),
            )

        self._run = jax.jit(run)

        # Softmax head: W from the frozen graph's logits MatMul, no bias
        # (reference: evaluations/evaluator.py:613-620). Resolved through
        # Identity indirections.
        w = self._resolve_const("softmax/logits/MatMul", input_index=1)
        self._softmax_w = jnp.asarray(w, jnp.float32)
        self._softmax = jax.jit(
            lambda p: jax.nn.softmax(p @ self._softmax_w, axis=-1)
        )

    def _resolve_const(self, node_name: str, input_index: int) -> np.ndarray:
        nodes = self._graph_fn.nodes
        name = nodes[node_name].input[input_index].split(":")[0]
        while nodes[name].op in ("Identity", "CheckNumerics"):
            name = nodes[name].input[0].split(":")[0]
        return self._graph_fn.const(name)

    def features(self, batch: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
        """NHWC uint8-range floats [0,255] -> (pool[N,2048], spatial[N,...]).
        Ragged tails are padded to `batch_size` so the TPU program compiles
        once per (batch, H, W) shape."""
        import jax

        n = batch.shape[0]
        pools, spatials = [], []
        for i in range(0, n, self.batch_size):
            chunk = np.asarray(
                batch[i: i + self.batch_size], dtype=np.float32
            )
            k = chunk.shape[0]
            if k < self.batch_size:
                pad = np.zeros(
                    (self.batch_size - k,) + chunk.shape[1:], np.float32
                )
                chunk = np.concatenate([chunk, pad], axis=0)
            pool, spatial = self._run(chunk)
            pool, spatial = jax.device_get((pool, spatial))
            pools.append(pool[:k])
            spatials.append(spatial[:k])
        return np.concatenate(pools, axis=0), np.concatenate(spatials, axis=0)

    def softmax_probs(self, pool_features: np.ndarray) -> np.ndarray:
        import jax

        out = []
        bs = self.softmax_batch_size
        for i in range(0, len(pool_features), bs):
            chunk = np.asarray(pool_features[i: i + bs], np.float32)
            k = chunk.shape[0]
            if k < bs:
                chunk = np.concatenate(
                    [chunk, np.zeros((bs - k, chunk.shape[1]), np.float32)]
                )
            out.append(jax.device_get(self._softmax(chunk))[:k])
        return np.concatenate(out, axis=0)


def make_inception_backend(backend: str = "auto",
                           pb_path: Optional[str] = None,
                           batch_size: int = 64,
                           softmax_batch_size: int = 512):
    """Backend factory: 'jax' (GraphDef compiled to XLA — the TPU-native
    path), 'tf' (reference-identical TF1 session), or 'auto' (jax with tf
    fallback). Overridable via VAW_INCEPTION_BACKEND."""
    backend = os.environ.get("VAW_INCEPTION_BACKEND", backend)
    kwargs = dict(pb_path=pb_path, batch_size=batch_size,
                  softmax_batch_size=softmax_batch_size)
    if backend == "jax":
        return InceptionV3JAXFeatures(**kwargs)
    if backend == "tf":
        return InceptionV3Features(**kwargs)
    if backend == "auto":
        try:
            be = InceptionV3JAXFeatures(**kwargs)
            # Constructing the backend only parses the graph; unsupported
            # ops surface at the first evaluation. Trace a 1-image dummy
            # HERE so a graph outside tf_graph.py's op census falls back to
            # the TF session instead of raising NotImplementedError
            # mid-eval.
            import numpy as np

            be.features(np.zeros((1, 64, 64, 3), np.uint8))
            return be
        except FileNotFoundError:
            raise
        except Exception:  # noqa: BLE001 — unsupported op in custom graphs
            return InceptionV3Features(**kwargs)
    raise ValueError(f"unknown inception backend '{backend}'")
