"""Pipeline-parallel (GPipe over a 'stage' mesh axis) tests on the virtual
CPU mesh. The reference has no PP (SURVEY.md section 2.8); these assert the
TPU extension computes exactly what sequential block application computes,
for both forward values and gradients."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

from vaw_tpu.parallel.pipeline import pipeline, stack_stage_params


def _block_fn(block_params, x, aux):
    w, b = block_params["w"], block_params["b"]
    return jnp.tanh(x @ w + b + aux)


def _make(depth=8, dim=16, batch=8, stages=4, microbatches=4, seed=0):
    rs = np.random.RandomState(seed)
    blocks = [
        {"w": jnp.asarray(rs.randn(dim, dim) * 0.3, jnp.float32),
         "b": jnp.asarray(rs.randn(dim) * 0.1, jnp.float32)}
        for _ in range(depth)
    ]
    x = jnp.asarray(rs.randn(batch, dim), jnp.float32)
    aux = jnp.asarray(rs.randn(batch, dim) * 0.1, jnp.float32)
    stage_params = stack_stage_params(blocks, stages)
    mesh = Mesh(np.array(jax.devices()[:stages]), ("stage",))
    return blocks, stage_params, mesh, x, aux


def _sequential(blocks, x, aux):
    for bp in blocks:
        x = _block_fn(bp, x, aux)
    return x


def test_pipeline_forward_matches_sequential():
    blocks, stage_params, mesh, x, aux = _make()
    piped = pipeline(_block_fn, mesh, num_microbatches=4)
    y = jax.jit(piped)(stage_params, x, aux)
    ref = _sequential(blocks, x, aux)
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_pipeline_single_microbatch():
    blocks, stage_params, mesh, x, aux = _make(microbatches=1)
    piped = pipeline(_block_fn, mesh, num_microbatches=1)
    y = jax.jit(piped)(stage_params, x, aux)
    ref = _sequential(blocks, x, aux)
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_pipeline_gradients_match_sequential():
    blocks, stage_params, mesh, x, aux = _make()
    piped = pipeline(_block_fn, mesh, num_microbatches=4)

    def loss_piped(sp, x):
        return jnp.sum(piped(sp, x, aux) ** 2)

    def loss_seq(blocks, x):
        return jnp.sum(_sequential(blocks, x, aux) ** 2)

    g_piped = jax.jit(jax.grad(loss_piped))(stage_params, x)
    g_seq = jax.grad(loss_seq)(blocks, x)
    # reshape sequential per-block grads into the [S, L/S] stage layout
    g_seq_stacked = stack_stage_params(g_seq, 4)
    for a, b in zip(jax.tree_util.tree_leaves(g_piped),
                    jax.tree_util.tree_leaves(g_seq_stacked)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_pipeline_two_stages_eight_microbatches():
    blocks, _, _, x, aux = _make(depth=6, stages=2)
    stage_params = stack_stage_params(blocks, 2)
    mesh = Mesh(np.array(jax.devices()[:2]), ("stage",))
    piped = pipeline(_block_fn, mesh, num_microbatches=8)
    y = jax.jit(piped)(stage_params, x, aux)
    ref = _sequential(blocks, x, aux)
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
