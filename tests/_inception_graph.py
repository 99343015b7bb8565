"""Synthetic full-architecture 2015 InceptionV3 GraphDef builder.

Reconstructs the COMPLETE topology of OpenAI's frozen
classify_image_graph_def.pb — every layer, node type, and activation shape
of the real graph (stem, mixed..mixed_10 towers with 5x5/factorized-7/
split-3 branches, pool_3, softmax head), with random weights — using the
same legacy ops the 2015 file contains: raw
BatchNormWithGlobalNormalization nodes, old-style Concat (dim-first
input), CheckNumerics, legacy ResizeBilinear. Running it through BOTH the
TF1 session backend and the GraphDef->JAX compiler
(tests/test_evaluator_pipeline.py) reduces the remaining FID-parity risk
to the pb's weight VALUES only (reference surgery being matched:
evaluations/evaluator.py:574-620 — feed ExpandDims:0, fetch pool_3:0,
mixed_6/conv:0, softmax/logits/MatMul).

Channel schedule per the public 2015 Inception-v3 classify_image graph.
"""

from __future__ import annotations

import numpy as np


def build_inception_v3_pb(path: str, seed: int = 0) -> str:
    import tensorflow.compat.v1 as tf

    tf.disable_eager_execution()
    rs = np.random.RandomState(seed)
    units = []  # conv-unit names whose bn chains get fused to legacy nodes

    def conv(x, cout, kh, kw, name, stride=1, padding="SAME"):
        """conv -> legacy batchnorm (fused post-hoc) -> CheckNumerics ->
        relu, the per-unit node group of the 2015 graph."""
        cin = int(x.shape[-1])
        fan = kh * kw * cin
        w = tf.constant(
            (rs.randn(kh, kw, cin, cout) * (1.2 / np.sqrt(fan))).astype(
                np.float32), name=f"{name}/conv2d_params")
        y = tf.nn.conv2d(x, w, [1, stride, stride, 1], padding, name=name)
        m = tf.constant(rs.randn(cout).astype(np.float32) * 0.1,
                        name=f"{name}/batchnorm/moving_mean")
        v = tf.constant((rs.rand(cout) * 0.5 + 0.5).astype(np.float32),
                        name=f"{name}/batchnorm/moving_variance")
        beta = tf.constant(rs.randn(cout).astype(np.float32) * 0.1,
                           name=f"{name}/batchnorm/beta")
        gamma = tf.constant(
            (rs.randn(cout) * 0.1 + 1.0).astype(np.float32),
            name=f"{name}/batchnorm/gamma")
        # primitive stand-in chain, replaced by ONE legacy node in
        # _fuse_legacy_batchnorm (modern TF cannot BUILD the deprecated op
        # but still EXECUTES it for old producer versions)
        inv = tf.math.rsqrt(tf.add(v, 0.001, name=f"{name}/bnarith/a"),
                            name=f"{name}/bnarith/b")
        inv = tf.multiply(inv, gamma, name=f"{name}/bnarith/c")
        y2 = tf.multiply(y, inv, name=f"{name}/bnarith/d")
        off = tf.multiply(m, inv, name=f"{name}/bnarith/e")
        off = tf.subtract(beta, off, name=f"{name}/bnarith/f")
        y2 = tf.add(y2, off, name=f"{name}/bnarith/g")
        y2 = tf.raw_ops.CheckNumerics(tensor=y2, message="bn",
                                      name=f"{name}/CheckNumerics")
        units.append(name)
        return tf.nn.relu(y2, name=f"{name}/relu")

    def avgp(x, k, s, pad, name):
        return tf.nn.avg_pool(x, [1, k, k, 1], [1, s, s, 1], pad, name=name)

    def maxp(x, k, s, pad, name):
        return tf.nn.max_pool(x, [1, k, k, 1], [1, s, s, 1], pad, name=name)

    def cat(xs, name):
        return tf.concat(xs, 3, name=name)

    def mixed_35(x, n, pool_proj):
        b0 = conv(x, 64, 1, 1, f"{n}/conv")
        t = conv(x, 48, 1, 1, f"{n}/tower/conv")
        b1 = conv(t, 64, 5, 5, f"{n}/tower/conv_1")
        t = conv(x, 64, 1, 1, f"{n}/tower_1/conv")
        t = conv(t, 96, 3, 3, f"{n}/tower_1/conv_1")
        b2 = conv(t, 96, 3, 3, f"{n}/tower_1/conv_2")
        p = avgp(x, 3, 1, "SAME", f"{n}/tower_2/pool")
        b3 = conv(p, pool_proj, 1, 1, f"{n}/tower_2/conv")
        return cat([b0, b1, b2, b3], f"{n}/join")

    def mixed_17(x, n, mid):
        b0 = conv(x, 192, 1, 1, f"{n}/conv")
        t = conv(x, mid, 1, 1, f"{n}/tower/conv")
        t = conv(t, mid, 1, 7, f"{n}/tower/conv_1")
        b1 = conv(t, 192, 7, 1, f"{n}/tower/conv_2")
        t = conv(x, mid, 1, 1, f"{n}/tower_1/conv")
        t = conv(t, mid, 7, 1, f"{n}/tower_1/conv_1")
        t = conv(t, mid, 1, 7, f"{n}/tower_1/conv_2")
        t = conv(t, mid, 7, 1, f"{n}/tower_1/conv_3")
        b2 = conv(t, 192, 1, 7, f"{n}/tower_1/conv_4")
        p = avgp(x, 3, 1, "SAME", f"{n}/tower_2/pool")
        b3 = conv(p, 192, 1, 1, f"{n}/tower_2/conv")
        return cat([b0, b1, b2, b3], f"{n}/join")

    def mixed_8x8(x, n, pool_kind):
        b0 = conv(x, 320, 1, 1, f"{n}/conv")
        t = conv(x, 384, 1, 1, f"{n}/tower/conv")
        s0 = conv(t, 384, 1, 3, f"{n}/tower/mixed/conv")
        s1 = conv(t, 384, 3, 1, f"{n}/tower/mixed/conv_1")
        b1 = cat([s0, s1], f"{n}/tower/mixed")
        t = conv(x, 448, 1, 1, f"{n}/tower_1/conv")
        t = conv(t, 384, 3, 3, f"{n}/tower_1/conv_1")
        s0 = conv(t, 384, 1, 3, f"{n}/tower_1/mixed/conv")
        s1 = conv(t, 384, 3, 1, f"{n}/tower_1/mixed/conv_1")
        b2 = cat([s0, s1], f"{n}/tower_1/mixed")
        p = (avgp if pool_kind == "avg" else maxp)(
            x, 3, 1, "SAME", f"{n}/tower_2/pool")
        b3 = conv(p, 192, 1, 1, f"{n}/tower_2/conv")
        return cat([b0, b1, b2, b3], f"{n}/join")

    graph = tf.Graph()
    with graph.as_default():
        img = tf.placeholder(tf.float32, [299, 299, 3], name="img")
        x = tf.expand_dims(img, 0, name="ExpandDims")
        x = tf.image.resize_bilinear(x, (299, 299), align_corners=False,
                                     name="ResizeBilinear")
        x = tf.subtract(x, 128.0, name="Sub")
        x = tf.multiply(x, 1.0 / 128.0, name="Mul")
        # stem: 299 -> 149 -> 147 -> 73 -> 71 -> 35
        x = conv(x, 32, 3, 3, "conv", stride=2, padding="VALID")
        x = conv(x, 32, 3, 3, "conv_1", padding="VALID")
        x = conv(x, 64, 3, 3, "conv_2")
        x = maxp(x, 3, 2, "VALID", "pool")
        x = conv(x, 80, 1, 1, "conv_3", padding="VALID")
        x = conv(x, 192, 3, 3, "conv_4", padding="VALID")
        x = maxp(x, 3, 2, "VALID", "pool_1")
        # 35x35 towers: 256 -> 288 -> 288
        x = mixed_35(x, "mixed", 32)
        x = mixed_35(x, "mixed_1", 64)
        x = mixed_35(x, "mixed_2", 64)
        # reduction to 17x17x768
        b0 = conv(x, 384, 3, 3, "mixed_3/conv", stride=2, padding="VALID")
        t = conv(x, 64, 1, 1, "mixed_3/tower/conv")
        t = conv(t, 96, 3, 3, "mixed_3/tower/conv_1")
        b1 = conv(t, 96, 3, 3, "mixed_3/tower/conv_2", stride=2,
                  padding="VALID")
        p = maxp(x, 3, 2, "VALID", "mixed_3/pool")
        x = cat([b0, b1, p], "mixed_3/join")
        # 17x17 factorized-7 towers (mixed_6/conv is the sFID fetch)
        x = mixed_17(x, "mixed_4", 128)
        x = mixed_17(x, "mixed_5", 160)
        x = mixed_17(x, "mixed_6", 160)
        x = mixed_17(x, "mixed_7", 192)
        # reduction to 8x8x1280
        t = conv(x, 192, 1, 1, "mixed_8/tower/conv")
        b0 = conv(t, 320, 3, 3, "mixed_8/tower/conv_1", stride=2,
                  padding="VALID")
        t = conv(x, 192, 1, 1, "mixed_8/tower_1/conv")
        t = conv(t, 192, 1, 7, "mixed_8/tower_1/conv_1")
        t = conv(t, 192, 7, 1, "mixed_8/tower_1/conv_2")
        b1 = conv(t, 192, 3, 3, "mixed_8/tower_1/conv_3", stride=2,
                  padding="VALID")
        p = maxp(x, 3, 2, "VALID", "mixed_8/pool")
        x = cat([b0, b1, p], "mixed_8/join")
        # 8x8 split-branch towers -> 2048
        x = mixed_8x8(x, "mixed_9", "avg")
        x = mixed_8x8(x, "mixed_10", "max")
        # heads
        pooled = avgp(x, 8, 1, "VALID", "pool_3")
        flat = tf.reshape(pooled, [1, 2048], name="pool_3/_reshape")
        wsm = tf.constant(
            (rs.randn(2048, 1008) * 0.02).astype(np.float32),
            name="softmax/weights")
        # the real pb reads weights through an Identity — the softmax-head
        # weight extraction must resolve the indirection
        wsm = tf.identity(wsm, name="softmax/weights/read")
        logits = tf.matmul(flat, wsm, name="softmax/logits/MatMul")
        bsm = tf.constant(rs.randn(1008).astype(np.float32) * 0.05,
                          name="softmax/biases")
        logits = tf.nn.bias_add(logits, bsm, name="softmax/logits")
        tf.nn.softmax(logits, name="softmax")

    gd = _fuse_legacy_batchnorm(graph.as_graph_def(), units, tf)
    _legacy_concat(gd)
    with open(path, "wb") as f:
        f.write(gd.SerializeToString())
    return path


def _fuse_legacy_batchnorm(gd, units, tf):
    """Replace each unit's primitive bn chain with ONE raw
    BatchNormWithGlobalNormalization node, as the 2015 pb contains."""
    out = tf.GraphDef()
    out.versions.producer = 8  # pre-deprecation GraphDef version
    for node in gd.node:
        if any(node.name.startswith(f"{u}/bnarith") for u in units):
            continue
        n = out.node.add()
        n.CopyFrom(node)
        for u in units:
            if n.name == f"{u}/CheckNumerics":
                del n.input[:]
                n.input.append(f"{u}/batchnorm")
    for u in units:
        n = out.node.add()
        n.name = f"{u}/batchnorm"
        n.op = "BatchNormWithGlobalNormalization"
        n.input.extend([u, f"{u}/batchnorm/moving_mean",
                        f"{u}/batchnorm/moving_variance",
                        f"{u}/batchnorm/beta", f"{u}/batchnorm/gamma"])
        n.attr["T"].type = 1  # DT_FLOAT
        n.attr["variance_epsilon"].f = 0.001
        n.attr["scale_after_normalization"].b = True
    return out


def _legacy_concat(gd):
    """ConcatV2 (axis last) -> old-style Concat (dim first) in place —
    the op flavor the 2015 producer wrote."""
    for node in gd.node:
        if node.op == "ConcatV2":
            node.op = "Concat"
            axis = node.input[-1]
            del node.input[-1]
            node.input.insert(0, axis)
            if "Tidx" in node.attr:
                del node.attr["Tidx"]
