"""MM-DiT, SuperResModel, kvlogger, profiling tests."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vaw_tpu.models.mmdit import MMDiT
from vaw_tpu.models.unet import SuperResModel, UNetModel
from vaw_tpu.utils import kvlogger
from vaw_tpu.utils.profiling import compiled_flops, estimate_train_flops


def test_mmdit_forward():
    model = MMDiT(image_size=8, patch_size=2, in_channels=4, hidden_size=64,
                  depth=2, num_heads=2, num_classes=10,
                  class_dropout_prob=0.1)
    x = jnp.ones((2, 8, 8, 4))
    t = jnp.array([0.0, 500.0])
    y = jnp.array([1, 2])
    rngs = {"params": jax.random.key(0), "label_dropout": jax.random.key(1)}
    variables = model.init(rngs, x, t, y)
    out, zs = model.apply(variables, x, t, y)
    assert zs is None
    assert out.shape == (2, 8, 8, 4)
    # zero-init head -> exact zero output at init
    np.testing.assert_allclose(np.asarray(out), 0.0)


def test_mmdit_learn_sigma():
    model = MMDiT(image_size=8, patch_size=2, in_channels=3, hidden_size=64,
                  depth=1, num_heads=2, num_classes=0, learn_sigma=True)
    x = jnp.ones((1, 8, 8, 3))
    t = jnp.array([1.0])
    variables = model.init({"params": jax.random.key(0)}, x, t)
    out, _ = model.apply(variables, x, t)
    assert out.shape == (1, 8, 8, 6)


def test_superres_model():
    unet = UNetModel(
        image_size=16, in_channels=6, model_channels=16, out_channels=3,
        num_res_blocks=1, attention_resolutions=(4,), channel_mult=(1, 2),
        num_classes=0,
    )
    model = SuperResModel(unet=unet)
    x = jnp.ones((2, 16, 16, 3))
    low = jnp.ones((2, 8, 8, 3))
    t = jnp.array([0, 10])
    variables = model.init({"params": jax.random.key(0)}, x, t, low_res=low)
    out = model.apply(variables, x, t, low_res=low)
    assert out.shape == (2, 16, 16, 3)


def test_kvlogger_formats(tmp_path):
    logger = kvlogger.configure(str(tmp_path), formats=("csv", "json"))
    kvlogger.logkv("step", 1)
    kvlogger.logkv_mean("loss", 2.0)
    kvlogger.logkv_mean("loss", 4.0)
    out = kvlogger.dumpkvs()
    assert out["loss"] == pytest.approx(3.0)
    kvlogger.logkv("step", 2)
    kvlogger.logkv("loss", 1.0)
    kvlogger.logkv("new_key", 7)  # header extension
    kvlogger.dumpkvs()
    csv_text = open(tmp_path / "progress.csv").read()
    assert "new_key" in csv_text.splitlines()[0]
    assert len(csv_text.splitlines()) == 3
    json_lines = open(tmp_path / "progress.json").read().splitlines()
    assert len(json_lines) == 2
    logger.close()


def test_csv_resume_partial_line(tmp_path):
    """Crash-mid-write recovery: an ASCII partial tail is terminated; a
    tail that split a multi-byte UTF-8 character is DROPPED (it would
    otherwise poison every later text-mode read); clean files untouched."""
    from vaw_tpu.utils.kvlogger import CSVOutputFormat

    p = tmp_path / "multibyte.csv"
    p.write_bytes("a,b\n1,2\n3,µ".encode()[:-1])  # truncated mid-µ
    w = CSVOutputFormat(str(p)); w.writekvs({"a": 5, "b": 6}); w.close()
    assert p.read_text().splitlines() == ["a,b", "1,2", "5,6"]

    p = tmp_path / "ascii.csv"
    p.write_bytes(b"a,b\n1,2\n3,")
    w = CSVOutputFormat(str(p)); w.writekvs({"a": 7, "b": 8}); w.close()
    assert p.read_text().splitlines() == ["a,b", "1,2", "3,", "7,8"]

    p = tmp_path / "clean.csv"
    p.write_text("a,unit\n1,µs\n", encoding="utf-8")
    w = CSVOutputFormat(str(p)); w.writekvs({"a": 2, "unit": "µs"})
    w.close()
    assert p.read_text(encoding="utf-8").splitlines() == [
        "a,unit", "1,µs", "2,µs"]


def test_profile_kv(tmp_path):
    kvlogger.configure(str(tmp_path), formats=("json",))
    with kvlogger.profile_kv("data"):
        pass
    out = kvlogger.dumpkvs()
    assert "wait_data" in out


def test_flop_accounting():
    def f(a, b):
        return a @ b

    flops = compiled_flops(f, jnp.ones((64, 64)), jnp.ones((64, 64)))
    if flops is not None:
        assert flops == pytest.approx(2 * 64 ** 3, rel=0.1)
    assert estimate_train_flops(1e6, 256) == pytest.approx(6e6 * 256)


def test_dit_remat_grad():
    from vaw_tpu.models.dit import DiT

    m = DiT(image_size=8, patch_size=2, in_channels=3, hidden_size=32,
            depth=2, num_heads=2, num_classes=0, class_dropout_prob=0.0,
            use_checkpoint=True)
    x = jnp.ones((2, 8, 8, 3))
    t = jnp.ones((2,))
    v = m.init({"params": jax.random.key(0)}, x, t)

    def loss(p):
        out, _ = m.apply({"params": p}, x, t)
        return jnp.sum((out - 1.0) ** 2)

    g = jax.grad(loss)(v["params"])
    total = sum(float(jnp.abs(l).sum()) for l in jax.tree_util.tree_leaves(g))
    assert np.isfinite(total)
    # adaLN-Zero: at init only the final head has nonzero grads.
    final = g["FinalLayer_0"]
    fsum = sum(float(jnp.abs(l).sum())
               for l in jax.tree_util.tree_leaves(final))
    assert fsum > 0


def test_vit_shared_rel_pos_bias():
    from vaw_tpu.models.vit import ViT

    m = ViT(image_size=8, patch_size=4, in_channels=3, num_classes=5,
            embed_dim=32, depth=1, num_heads=2,
            use_shared_rel_pos_bias=True, drop_label_prob=0.0)
    x = jnp.ones((2, 8, 8, 3))
    t = jnp.zeros((2,))
    y = jnp.array([0, 1])
    rngs = {"params": jax.random.key(0)}
    v = m.init(rngs, x, t, y)
    out = m.apply(v, x, t, y)
    assert out.shape == (2, 8, 8, 3)
    assert np.isfinite(np.asarray(out)).all()


@pytest.mark.parametrize("model_kind", ["dit", "unet", "vit", "uvit"])
def test_remat_policy_dots_matches_full(model_kind):
    """--remat_policy dots (save MXU outputs, recompute elementwise) must
    produce the same gradients as the full-recompute policy — it only
    changes WHAT the backward rematerializes, not the math."""
    if model_kind == "dit":
        from vaw_tpu.models.dit import DiT

        def build(policy):
            return DiT(image_size=8, patch_size=2, in_channels=3,
                       hidden_size=32, depth=2, num_heads=2, num_classes=0,
                       class_dropout_prob=0.0, use_checkpoint=True,
                       remat_policy=policy)

        x = jnp.ones((2, 8, 8, 3)) * 0.3
    else:
        from vaw_tpu.models.unet import create_unet_model

        def build(policy):
            return create_unet_model(
                image_size=32, num_channels=32, num_res_blocks=1,
                in_channels=3, class_cond=False, use_checkpoint=True,
                remat_policy=policy)

        x = jnp.ones((2, 32, 32, 3)) * 0.3
    if model_kind == "vit":
        from vaw_tpu.models.vit import ViT

        def build(policy):
            return ViT(image_size=8, patch_size=2, in_channels=3,
                       embed_dim=32, depth=2, num_heads=2, num_classes=0,
                       use_checkpoint=True, remat_policy=policy)

        x = jnp.ones((2, 8, 8, 3)) * 0.3
    if model_kind == "uvit":
        from vaw_tpu.models.uvit import UViT

        def build(policy):
            return UViT(image_size=8, patch_size=2, in_channels=3,
                        embed_dim=32, depth=2, num_heads=2, num_classes=0,
                        class_dropout_prob=0.0, use_checkpoint=True,
                        remat_policy=policy)

        x = jnp.ones((2, 8, 8, 3)) * 0.3
    t = jnp.full((2,), 3.0)

    grads = {}
    for policy in ("full", "dots"):
        m = build(policy)
        v = m.init({"params": jax.random.key(0)}, x, t)

        def loss(p):
            out = m.apply({"params": p}, x, t)
            if isinstance(out, tuple):
                out = out[0]
            return jnp.sum((out - 0.5) ** 2)

        grads[policy] = jax.grad(loss)(v["params"])
    for (ka, a), (kb, b) in zip(
            jax.tree_util.tree_leaves_with_path(grads["full"]),
            jax.tree_util.tree_leaves_with_path(grads["dots"])):
        assert ka == kb
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6,
                                   err_msg=jax.tree_util.keystr(ka))


def test_remat_policy_unknown_raises():
    from vaw_tpu.models.dit import DiT

    m = DiT(image_size=8, patch_size=2, in_channels=3, hidden_size=32,
            depth=1, num_heads=2, num_classes=0, class_dropout_prob=0.0,
            use_checkpoint=True, remat_policy="bogus")
    with pytest.raises(ValueError, match="remat_policy"):
        m.init({"params": jax.random.key(0)}, jnp.ones((1, 8, 8, 3)),
               jnp.ones((1,)))


def test_mmdit_remat_policy_matches_plain():
    """MM-DiT use_checkpoint (+'dots' policy) must not change the math."""
    from vaw_tpu.models.mmdit import MMDiT

    kw = dict(image_size=8, patch_size=2, in_channels=4, hidden_size=32,
              depth=2, num_heads=2, num_classes=10, class_dropout_prob=0.0)
    x = jnp.ones((2, 8, 8, 4)) * 0.3
    t = jnp.full((2,), 3.0)
    y = jnp.zeros((2,), jnp.int32)
    outs = {}
    for tag, extra in (("plain", {}),
                       ("dots", dict(use_checkpoint=True,
                                     remat_policy="dots"))):
        m = MMDiT(**kw, **extra)
        v = m.init({"params": jax.random.key(0)}, x, t, y)

        def loss(p):
            out, _ = m.apply({"params": p}, x, t, y)
            return jnp.sum((out - 0.5) ** 2)

        outs[tag] = (float(loss(v["params"])),
                     jax.grad(loss)(v["params"]))
    assert outs["plain"][0] == pytest.approx(outs["dots"][0], rel=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(outs["plain"][1]),
                    jax.tree_util.tree_leaves(outs["dots"][1])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)
