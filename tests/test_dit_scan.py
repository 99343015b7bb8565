"""DiT scan_blocks: lax.scan over stacked block params must compute exactly
what the unrolled loop computes (same weights transplanted), with a single
compiled block (O(1) compile time for deep models)."""

import jax
import jax.numpy as jnp
import numpy as np

from vaw_tpu.models.dit import DiT


def _mk(scan):
    return DiT(image_size=8, patch_size=2, in_channels=4, hidden_size=32,
               depth=3, num_heads=2, num_classes=10, class_dropout_prob=0.0,
               scan_blocks=scan)


def test_scan_blocks_matches_unrolled():
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.randn(2, 8, 8, 4), jnp.float32)
    t = jnp.asarray([1.0, 7.0])
    y = jnp.asarray([3, 5], jnp.int32)

    unrolled = _mk(False)
    scanned = _mk(True)
    v_u = unrolled.init(jax.random.key(0), x, t, y)
    v_s = scanned.init(jax.random.key(0), x, t, y)

    # transplant: stack the unrolled DiTBlock_i params into the scan layout
    pu = dict(v_u["params"])
    blocks = [pu.pop(f"DiTBlock_{i}") for i in range(3)]
    stacked = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *blocks)
    ps = dict(v_s["params"])
    assert jax.tree_util.tree_structure(
        ps["ScanBlocks"]["DiTBlock_0"]
    ) == jax.tree_util.tree_structure(stacked)
    ps["ScanBlocks"] = {"DiTBlock_0": stacked}
    ps.update({k: pu[k] for k in pu})  # shared embedders/final layer

    out_u, _ = unrolled.apply({"params": v_u["params"]}, x, t, y)
    out_s, _ = scanned.apply({"params": ps}, x, t, y)
    np.testing.assert_allclose(np.asarray(out_u), np.asarray(out_s),
                               rtol=1e-5, atol=1e-5)


def test_scan_blocks_gradients_finite():
    x = jnp.asarray(np.random.RandomState(1).randn(2, 8, 8, 4), jnp.float32)
    t = jnp.asarray([1.0, 7.0])
    y = jnp.asarray([3, 5], jnp.int32)
    model = _mk(True)
    variables = model.init(jax.random.key(0), x, t, y)

    def loss(p):
        out, _ = model.apply({"params": p}, x, t, y)
        return jnp.mean(out ** 2) + 0.0 * jnp.mean(out)

    g = jax.grad(loss)(variables["params"])
    for leaf in jax.tree_util.tree_leaves(g):
        assert np.isfinite(np.asarray(leaf)).all()
