"""Real-pretrained-weight smoke hooks (VERDICT r3 next-8).

Every converter/loader in vaw_tpu is parity-tested against the reference
torch teacher classes with RANDOM weights (test_encoder_parity.py); the one
residual risk is a key-fixup or resample bug that only bites on the actual
released checkpoint files — unobtainable in this zero-egress environment.

These tests close that gap the day weights appear: point VAW_ENCODER_DIR at
a directory of `{family}-vit-{size}.(safetensors|pth|pt|bin)` checkpoints
(and/or VAW_VAE_PATH at a diffusers sd-vae file) and each present file gets
a full feature-parity check against the reference torch teacher loaded from
the SAME file (reference: tools/encoders.py:38-262 loader flows, including
its pos-embed resampling and state-dict fixups). Absent files skip cleanly.

Run: VAW_ENCODER_DIR=/path/to/weights pytest tests/test_real_weights.py
"""

import os
import sys

import numpy as np
import pytest
import torch

sys.path.insert(0, "tests")
from _reference import load_reference  # noqa: E402  (installs timm stubs)

import jax.numpy as jnp  # noqa: E402

from vaw_tpu.encoders import load_encoders  # noqa: E402
from vaw_tpu.encoders.loaders import (  # noqa: E402
    _load_torch_state,
    find_encoder_weights,
    runtime_image_size,
)

ATOL = 5e-4  # real weights: larger magnitudes than the random-init tests


def _real(family, size):
    path = find_encoder_weights(family, size)
    if path is None:
        pytest.skip(
            f"no real {family}-vit-{size} checkpoint; set VAW_ENCODER_DIR")
    return path


def _image(size: int, seed: int = 0) -> np.ndarray:
    rs = np.random.RandomState(seed)
    return rs.rand(1, 3, size, size).astype(np.float32)


def _ours(family, size, resolution, x_nchw):
    fns, _, _ = load_encoders(f"{family}-vit-{size}", image_size=resolution)
    eff = runtime_image_size(family, resolution)
    assert x_nchw.shape[-1] == eff
    return np.asarray(fns[0](jnp.asarray(np.transpose(x_nchw, (0, 2, 3, 1)))))


def _resample_to(sd, grid, key="pos_embed", prefix_tokens=1):
    """The reference's load-time resample (tools/encoders.py:117-155,217-225)
    via the same timm stub its parity oracle uses."""
    import timm.layers.pos_embed as tpe

    if key in sd:
        sd = dict(sd)
        sd[key] = tpe.resample_abs_pos_embed(
            torch.as_tensor(np.asarray(sd[key])), [grid, grid],
            num_prefix_tokens=prefix_tokens)
    return sd


def _torch_sd(sd):
    return {k: torch.as_tensor(np.asarray(v)) for k, v in sd.items()}


@pytest.mark.parametrize("size", ["b", "l"])
def test_real_mocov3_parity(size):
    path = _real("mocov3", size)
    moco = load_reference("encoders.mocov3_vit")
    enc = load_reference("tools.encoders")
    encoder = moco.vit_base() if size == "b" else moco.vit_large()
    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    raw = ckpt.get("state_dict", ckpt) if isinstance(ckpt, dict) else ckpt
    fixed = enc.fix_mocov3_state_dict(
        {k: torch.as_tensor(np.asarray(v)) for k, v in raw.items()})
    encoder.head = torch.nn.Identity()
    encoder.load_state_dict(fixed, strict=True)
    encoder.eval()
    x = _image(256, 1)
    with torch.no_grad():
        ref = encoder.forward_features(torch.tensor(x)).numpy()
    out = _ours("mocov3", size, 256, x)
    np.testing.assert_allclose(out, ref, atol=ATOL, rtol=1e-3)


@pytest.mark.parametrize("size", ["b", "l"])
def test_real_mae_parity(size):
    path = _real("mae", size)
    mae = load_reference("encoders.mae_vit")
    builder = {"b": mae.vit_base_patch16, "l": mae.vit_large_patch16}[size]
    encoder = builder(img_size=256)
    sd = _resample_to(_load_torch_state(path), 16)
    encoder.load_state_dict(_torch_sd(sd), strict=True)
    encoder.eval()
    x = _image(256, 2)
    with torch.no_grad():
        ref = encoder.forward_features(torch.tensor(x)).numpy()
    out = _ours("mae", size, 256, x)
    # the reference strips cls WITHOUT final norm (mae_vit.py:34-48)
    np.testing.assert_allclose(out[:, 1:], ref, atol=ATOL, rtol=1e-3)


@pytest.mark.parametrize("size", ["s", "b"])
def test_real_dinov1_parity(size):
    path = _real("dinov1", size)
    dinov1 = load_reference("encoders.dinov1")
    encoder = dinov1.vit_small() if size == "s" else dinov1.vit_base()
    sd = _resample_to(_load_torch_state(path), 16)
    encoder.head = torch.nn.Identity()
    encoder.load_state_dict(_torch_sd(sd), strict=True)
    encoder.eval()
    x = _image(256, 3)
    with torch.no_grad():
        ref_cls = encoder(torch.tensor(x)).numpy()  # forward == cls token
    out = _ours("dinov1", size, 256, x)
    np.testing.assert_allclose(out[:, 0], ref_cls, atol=ATOL, rtol=1e-3)


@pytest.mark.parametrize("family,size", [("dinov2", "b"), ("dinov2", "l"),
                                         ("dinov2reg", "b")])
def test_real_dinov2_parity(family, size):
    path = _real(family, size)
    from _dinov2 import DinoVisionTransformer

    dims = {"s": (384, 12, 6), "b": (768, 12, 12), "l": (1024, 24, 16)}
    embed, depth, heads = dims[size]
    eff = runtime_image_size(family, 256)
    model = DinoVisionTransformer(
        img_size=eff, patch_size=14, embed_dim=embed, depth=depth,
        num_heads=heads,
        num_register_tokens=4 if family == "dinov2reg" else 0)
    # hub checkpoints carry the 518-px 37x37 grid; the reference resamples
    # at load (tools/encoders.py:117-125)
    sd = _resample_to(_load_torch_state(path), eff // 14)
    model.load_state_dict(_torch_sd(sd), strict=True)
    model.eval()
    x = _image(eff, 4)
    with torch.no_grad():
        ref = model.forward_features(torch.tensor(x))
    out = _ours(family, size, 256, x)
    n_reg = 4 if family == "dinov2reg" else 0
    np.testing.assert_allclose(out[:, 0], ref["x_norm_clstoken"].numpy(),
                               atol=ATOL, rtol=1e-3)
    np.testing.assert_allclose(
        out[:, 1 + n_reg:], ref["x_norm_patchtokens"].numpy(),
        atol=ATOL, rtol=1e-3)


def test_real_jepa_parity():
    path = _real("jepa", "h")
    jepa = load_reference("encoders.jepa")
    encoder = jepa.vit_huge(img_size=[224, 224], patch_size=14)
    raw = torch.load(path, map_location="cpu", weights_only=False)
    raw = raw.get("state_dict", raw.get("encoder", raw)) \
        if isinstance(raw, dict) else raw
    sd = {k.removeprefix("module.").removeprefix("encoder."): v
          for k, v in raw.items()}
    encoder.load_state_dict(sd, strict=True)
    encoder.eval()
    x = _image(224, 5)
    with torch.no_grad():
        ref = encoder(torch.tensor(x)).numpy()
    out = _ours("jepa", "h", 256, x)
    np.testing.assert_allclose(out, ref, atol=ATOL, rtol=1e-3)


def test_real_clip_parity():
    path = _real("clip", "l")
    clip_vit = load_reference("encoders.clip_vit")
    sd = _load_torch_state(path)
    sd = {k[len("visual."):] if k.startswith("visual.") else k: v
          for k, v in sd.items()}
    width, layers, heads = 1024, 24, 16
    from test_encoder_parity import _ClipVisual

    visual = _ClipVisual(clip_vit, res=224, patch=14, width=width,
                         layers=layers, heads=heads)
    wanted = {k for k, _ in visual.named_parameters()} | {
        k for k, _ in visual.named_buffers()}
    visual.load_state_dict(
        {k: torch.as_tensor(np.asarray(v)) for k, v in sd.items()
         if k in wanted}, strict=True)
    model = clip_vit.UpdatedVisionTransformer(visual)
    model.eval()
    x = _image(224, 6)
    with torch.no_grad():
        ref = model(torch.tensor(x)).numpy()
    out = _ours("clip", "l", 256, x)
    np.testing.assert_allclose(out[:, 1:], ref, atol=ATOL, rtol=1e-3)


def test_inception_download_fallback_logic(tmp_path, monkeypatch):
    """The pb download fallback (evals/inception.py _maybe_download,
    mirroring the reference's rank-0 urlretrieve,
    evaluations/evaluator.py:574-580) is unreachable in this zero-egress
    env; prove the streaming/rename/error logic against a mocked HTTP
    layer so the code path is verified before networking ever exists."""
    import io
    import sys
    import types

    from vaw_tpu.evals import inception

    payload = b"\x08\x01" * 4096  # fake pb bytes

    class _Resp:
        def __init__(self, ok=True):
            self._ok = ok

        def __enter__(self):
            return self

        def __exit__(self, *a):
            return False

        def raise_for_status(self):
            if not self._ok:
                raise IOError("HTTP 403")

        def iter_content(self, chunk_size):
            buf = io.BytesIO(payload)
            while True:
                chunk = buf.read(chunk_size)
                if not chunk:
                    return
                yield chunk

    fake = types.ModuleType("requests")
    fake.get = lambda url, stream, timeout: _Resp(ok=True)
    monkeypatch.setitem(sys.modules, "requests", fake)
    monkeypatch.chdir(tmp_path)  # keep /tmp pb pollution out of discovery
    target = str(tmp_path / "classify_image_graph_def.pb")

    got = inception._maybe_download(path=target)
    assert got == target and os.path.exists(target)
    with open(target, "rb") as f:
        assert f.read() == payload
    assert not os.path.exists(target + ".tmp")  # atomic rename, no debris

    # failure path: error surfaces as None, no partial file left behind
    os.remove(target)
    fake.get = lambda url, stream, timeout: _Resp(ok=False)
    assert inception._maybe_download(path=target) is None
    assert not os.path.exists(target) and not os.path.exists(target + ".tmp")


def test_real_vae_roundtrip():
    """sd-vae: encode->decode a smooth natural-statistics image and demand
    faithful reconstruction (PSNR) — a wrong conv transpose or key fixup
    destroys reconstruction outright. Bit-parity vs diffusers would need
    the diffusers package (absent here); this catches the load-path bugs."""
    from vaw_tpu.data.vae import (
        find_vae_checkpoint, load_vae_decoder, load_vae_encoder,
    )

    if find_vae_checkpoint() is None:
        pytest.skip("no sd-vae checkpoint; set VAW_VAE_PATH")
    encode = load_vae_encoder()
    decode = load_vae_decoder()
    rs = np.random.RandomState(0)
    # smooth image: low-frequency mixture, [-1, 1]
    yy, xx = np.mgrid[0:256, 0:256] / 256.0
    img = np.stack([np.sin(4 * np.pi * xx + p) * np.cos(2 * np.pi * yy + p)
                    for p in (0.0, 1.0, 2.0)], axis=-1)
    img = (0.7 * img + 0.1 * rs.randn(256, 256, 3)).clip(-1, 1)
    x = jnp.asarray(img[None], jnp.float32)

    moments = encode(x)  # [mean | std] stacks, unscaled latent space
    mean = moments[..., :4]
    recon = np.asarray(decode(mean))
    mse = float(np.mean((recon - img[None]) ** 2))
    psnr = 10 * np.log10(4.0 / mse)  # peak-to-peak 2.0
    assert psnr > 18.0, f"VAE roundtrip PSNR {psnr:.1f} dB — load path broken?"
