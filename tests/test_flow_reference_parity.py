"""Differential parity: FlowMatching vs the reference implementation on
CPU torch (reference: tools/gaussian_diffusion.py:1151-1419) — interpolants,
output->vector/score conversions, q_sample/targets, and full
training_losses on a shared closed-form model. Completes the numerics
parity surface (schedules/weights/DDIM/EDM/backbones are covered by
test_reference_parity.py / test_backbone_parity.py)."""

import sys
from types import SimpleNamespace

import jax.numpy as jnp
import numpy as np
import pytest
import torch

sys.path.insert(0, "tests")
from _reference import load_reference  # noqa: E402

from vaw_tpu.core import FlowMatching, ModelMeanType  # noqa: E402
from vaw_tpu.core.flow import interpolant  # noqa: E402

PATHS = ["linear", "cosine", "linear_logsnr"]
MEAN_TYPES = ["START_X", "EPSILON", "VELOCITY", "VECTOR"]


def _ref_flow(mean_type, path_type, weight_type="lambda"):
    gd = load_reference("tools.gaussian_diffusion")
    args = SimpleNamespace(
        weight_type=weight_type, path_type=path_type, sampler_type="sde",
        p2_gamma=1.0, p2_k=1.0, gamma=0.0, learn_sigma=False,
        learn_align=False, align_type="mse", time_dist=["uniform"],
    )
    return gd.FlowMatching(
        args=args, model_mean_type=gd.ModelMeanType[mean_type],
        device="cpu"), gd


def _ours(mean_type, path_type, weight_type="lambda"):
    return FlowMatching(
        model_mean_type=ModelMeanType[mean_type], path_type=path_type,
        sampler_type="sde", weight_type=weight_type)


@pytest.mark.parametrize("path", PATHS)
def test_interpolant_parity(path):
    ref, _ = _ref_flow("VECTOR", path)
    t = np.linspace(0.001, 0.999, 23).astype(np.float32)
    ra, rs_, rda, rds = (
        v.numpy() for v in ref.interpolant(torch.tensor(t)))
    a, s, da, ds = (np.asarray(v) for v in interpolant(path, jnp.asarray(t)))
    np.testing.assert_allclose(a, ra, atol=1e-6)
    np.testing.assert_allclose(s, rs_, atol=1e-6)
    np.testing.assert_allclose(da, rda, atol=1e-5)
    np.testing.assert_allclose(ds, rds, atol=1e-5)


@pytest.mark.parametrize("mean_type", MEAN_TYPES)
@pytest.mark.parametrize("path", ["linear", "cosine"])
def test_vector_and_score_conversion_parity(mean_type, path):
    ref, _ = _ref_flow(mean_type, path)
    ours = _ours(mean_type, path)
    rs = np.random.RandomState(0)
    out = rs.randn(4, 5, 5, 3).astype(np.float32)
    x_t = rs.randn(4, 5, 5, 3).astype(np.float32)
    t = rs.uniform(0.05, 0.95, size=(4,)).astype(np.float32)
    te = torch.tensor(t).view(4, 1, 1, 1)

    rv = ref.convert_model_output_to_vector(
        torch.tensor(out), torch.tensor(x_t), te).numpy()
    ov = np.asarray(ours.convert_model_output_to_vector(
        jnp.asarray(out), jnp.asarray(x_t),
        jnp.asarray(t).reshape(4, 1, 1, 1)))
    np.testing.assert_allclose(ov, rv, atol=2e-5, rtol=1e-5)

    rsc = ref.convert_model_output_to_score(
        torch.tensor(out), torch.tensor(x_t), te).numpy()
    osc = np.asarray(ours.convert_model_output_to_score(
        jnp.asarray(out), jnp.asarray(x_t),
        jnp.asarray(t).reshape(4, 1, 1, 1)))
    np.testing.assert_allclose(osc, rsc, atol=2e-4, rtol=1e-4)


@pytest.mark.parametrize("mean_type", MEAN_TYPES + ["SCORE"])
def test_q_sample_and_target_parity(mean_type):
    ref, _ = _ref_flow(mean_type, "cosine")
    ours = _ours(mean_type, "cosine")
    rs = np.random.RandomState(1)
    x0 = rs.randn(4, 5, 5, 3).astype(np.float32)
    noise = rs.randn(4, 5, 5, 3).astype(np.float32)
    t = rs.uniform(0.05, 0.95, size=(4,)).astype(np.float32)

    r_xt = ref.q_sample(torch.tensor(x0), torch.tensor(noise),
                        torch.tensor(t)).numpy()
    o_xt = np.asarray(ours.q_sample(jnp.asarray(x0), jnp.asarray(noise),
                                    jnp.asarray(t)))
    np.testing.assert_allclose(o_xt, r_xt, atol=1e-6)

    r_tg = ref.compute_target(torch.tensor(x0), torch.tensor(noise),
                              torch.tensor(t)).numpy()
    o_tg = np.asarray(ours.compute_target(jnp.asarray(x0),
                                          jnp.asarray(noise),
                                          jnp.asarray(t)))
    np.testing.assert_allclose(o_tg, r_tg, atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("mean_type", MEAN_TYPES)
@pytest.mark.parametrize("weight_type", ["lambda", "constant"])
def test_training_losses_parity(mean_type, weight_type):
    """Full loss pipeline on a shared closed-form model
    model(x, t) = x * (1 + 0.3 t), explicit t and noise."""
    ref, _ = _ref_flow(mean_type, "cosine", weight_type)
    ours = _ours(mean_type, "cosine", weight_type)
    rs = np.random.RandomState(2)
    x0 = rs.randn(4, 5, 5, 3).astype(np.float32)
    noise = rs.randn(4, 5, 5, 3).astype(np.float32)
    t = rs.uniform(0.05, 0.95, size=(4,)).astype(np.float32)

    def ref_model(x, tt, **kw):
        return x * (1 + 0.3 * tt.view(-1, 1, 1, 1))

    r_terms = ref.training_losses(
        ref_model, torch.tensor(x0), t=torch.tensor(t),
        noise=torch.tensor(noise))
    r_loss = r_terms["loss"].numpy()

    def our_model(x, tt, **kw):
        return x * (1 + 0.3 * tt.reshape(-1, 1, 1, 1))

    o_terms = ours.training_losses(
        our_model, jnp.asarray(x0), jnp.asarray(t), jnp.asarray(noise))
    o_loss = np.asarray(o_terms["loss"])
    np.testing.assert_allclose(o_loss, r_loss, atol=2e-5, rtol=1e-4)
