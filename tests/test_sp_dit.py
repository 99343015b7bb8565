"""Sequence-parallel DiT (ring attention reachable from the flagship
backbone): sp forward/grads equal the plain forward on the virtual CPU
mesh, standalone and composed with data parallelism."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from vaw_tpu.models.dit import DiT
from vaw_tpu.parallel import make_mesh
from vaw_tpu.parallel.sp_dit import sequence_parallel_dit_apply


def _model(**kw):
    return DiT(image_size=16, patch_size=2, in_channels=4, hidden_size=32,
               depth=2, num_heads=2, num_classes=10,
               class_dropout_prob=0.0, **kw)


def _data(batch=4):
    rs = np.random.RandomState(0)
    return (jnp.asarray(rs.randn(batch, 16, 16, 4).astype(np.float32)),
            jnp.asarray(rs.rand(batch).astype(np.float32) * 10),
            jnp.asarray((np.arange(batch) % 10).astype(np.int32)))


@pytest.mark.parametrize("n_sp", [2, 4])
def test_sp_forward_matches_plain(n_sp):
    model = _model()
    x, t, y = _data()
    variables = model.init(
        {"params": jax.random.key(0), "label_dropout": jax.random.key(1)},
        x, t, y)
    ref, _ = model.apply(variables, x, t, y)

    mesh = Mesh(np.array(jax.devices()[:n_sp]), ("sp",))
    apply_fn = sequence_parallel_dit_apply(model, mesh)
    out, _ = jax.jit(lambda v, x, t, y: apply_fn(v, x, t, y))(
        variables, x, t, y)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=1e-4)


def test_sp_grads_match_plain():
    model = _model()
    x, t, y = _data()
    variables = model.init(
        {"params": jax.random.key(0), "label_dropout": jax.random.key(1)},
        x, t, y)
    target = jnp.asarray(
        np.random.RandomState(5).randn(4, 16, 16, 4).astype(np.float32))
    mesh = Mesh(np.array(jax.devices()[:4]), ("sp",))
    apply_fn = sequence_parallel_dit_apply(model, mesh)

    def loss_plain(p):
        out, _ = model.apply({"params": p}, x, t, y)
        return jnp.mean((out - target) ** 2)

    def loss_sp(p):
        out, _ = apply_fn({"params": p}, x, t, y)
        return jnp.mean((out - target) ** 2)

    g_ref = jax.jit(jax.grad(loss_plain))(variables["params"])
    g_sp = jax.jit(jax.grad(loss_sp))(variables["params"])
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=3e-5, rtol=1e-3),
        g_ref, g_sp,
    )


def test_sp_composes_with_data_parallel():
    model = _model()
    x, t, y = _data(batch=8)
    variables = model.init(
        {"params": jax.random.key(0), "label_dropout": jax.random.key(1)},
        x, t, y)
    ref, _ = model.apply(variables, x, t, y)

    devs = np.array(jax.devices()[:8]).reshape(2, 4)
    mesh = Mesh(devs, ("data", "sp"))
    apply_fn = sequence_parallel_dit_apply(model, mesh, batch_axis="data")
    out, _ = jax.jit(lambda v, x, t, y: apply_fn(v, x, t, y))(
        variables, x, t, y)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=1e-4)


def test_sp_scan_blocks_path():
    model = _model(scan_blocks=True)
    x, t, y = _data()
    variables = model.init(
        {"params": jax.random.key(0), "label_dropout": jax.random.key(1)},
        x, t, y)
    ref, _ = model.apply(variables, x, t, y)

    mesh = Mesh(np.array(jax.devices()[:4]), ("sp",))
    apply_fn = sequence_parallel_dit_apply(model, mesh)
    out, _ = jax.jit(lambda v, x, t, y: apply_fn(v, x, t, y))(
        variables, x, t, y)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=1e-4)
