"""Golden tests for coefficient tables vs closed-form schedule math
(SURVEY.md section 4 test-pyramid item (a))."""

import math

import numpy as np
import pytest

from vaw_tpu.core import schedules as S


def test_linear_betas_endpoints():
    betas = S.get_named_beta_schedule("linear", 1000)
    assert betas.dtype == np.float64
    assert betas[0] == pytest.approx(1e-4)
    assert betas[-1] == pytest.approx(0.02)
    # Any step count is rescaled to cover the same range.
    betas250 = S.get_named_beta_schedule("linear", 250)
    assert betas250[0] == pytest.approx(4e-4)
    assert betas250[-1] == pytest.approx(0.08)


def test_cosine_betas_match_alpha_bar():
    T = 100
    betas = S.get_named_beta_schedule("cosine", T)

    def alpha_bar(t):
        return math.cos((t + 0.008) / 1.008 * math.pi / 2) ** 2

    for i in [0, 1, 42, 99]:
        expected = min(1 - alpha_bar((i + 1) / T) / alpha_bar(i / T), 0.999)
        assert betas[i] == pytest.approx(expected, rel=1e-12)
    assert (betas <= 0.999).all() and (betas > 0).all()


def test_linear_logsnr_alpha_bar_is_sigmoid():
    T = 50
    betas = S.get_named_beta_schedule("linear_logsnr", T)
    sched = S.make_schedule(betas)
    # alpha_bar at step i should track sigmoid(lambda((i+1)/T)) / sigmoid(lambda(1/T)) ...
    # directly: cumprod(1-beta_i) == sigmoid(lam(t_{i+1})) / sigmoid(lam(t_1)) * sigmoid(lam(t_1))
    def ab(t):
        lam = 10.0 + t * (-20.0)
        return 1.0 / (1.0 + math.exp(-lam))

    acp = sched.alphas_cumprod
    for i in [0, 10, 49]:
        expected = ab((i + 1) / T) / ab(0.0)
        assert acp[i] == pytest.approx(expected, rel=1e-10)


def test_posterior_coefficients_ddpm_closed_form():
    """posterior q(x_{t-1}|x_t,x_0) coefficients from the DDPM paper eq. 7."""
    betas = S.get_named_beta_schedule("linear", 100)
    sched = S.make_schedule(betas)
    acp = sched.alphas_cumprod
    acp_prev = np.append(1.0, acp[:-1])
    alphas = 1.0 - betas
    coef1 = betas * np.sqrt(acp_prev) / (1 - acp)
    coef2 = (1 - acp_prev) * np.sqrt(alphas) / (1 - acp)
    var = betas * (1 - acp_prev) / (1 - acp)
    np.testing.assert_allclose(sched.posterior_mean_coef1, coef1, rtol=1e-14)
    np.testing.assert_allclose(sched.posterior_mean_coef2, coef2, rtol=1e-14)
    np.testing.assert_allclose(sched.posterior_variance, var, rtol=1e-14)
    # Clipped log variance reuses t=1 at t=0.
    assert sched.posterior_log_variance_clipped[0] == pytest.approx(
        np.log(var[1])
    )
    # x0 == xt at t --> posterior mean is (coef1+coef2) * x.
    assert np.isfinite(sched.posterior_log_variance_clipped).all()


def test_space_timesteps_ddim():
    steps = S.space_timesteps(1000, "ddim18")
    assert len(steps) == 18
    assert 0 in steps
    steps50 = S.space_timesteps(1000, "ddim50")
    assert len(steps50) == 50
    # section-count striding
    sec = S.space_timesteps(300, [10, 15, 20])
    assert len(sec) == 45


def test_respace_preserves_alpha_bar():
    base = S.make_schedule(S.get_named_beta_schedule("linear", 1000))
    kept = sorted(S.space_timesteps(1000, "ddim18"))
    sub = S.respace_schedule(base, kept)
    assert sub.num_timesteps == 18
    assert sub.original_num_steps == 1000
    np.testing.assert_array_equal(sub.timestep_map, np.array(kept))
    # The respaced alpha_bar chain must match the base chain on kept steps.
    np.testing.assert_allclose(
        sub.alphas_cumprod, base.alphas_cumprod[kept], rtol=1e-12
    )


def test_edm_sigma_ladder_recursion():
    """u[j-1]^2 + 1 == (u[j]^2 + 1) / max(ab[j-1]/ab[j], C1)
    (reference: tools/cfg_edm.py:43-48)."""
    for sched_name in ["linear", "cosine", "linear_logsnr"]:
        M = 1000
        u = S.edm_sigma_ladder(sched_name, M=M)
        assert u.shape == (M + 1,)
        assert u[M] == 0.0
        assert (np.diff(u) <= 0).all(), "sigma ladder must decrease in j"
        ab = S._edm_alpha_bar(np.arange(M + 1), sched_name, M)
        for j in [1, 5, 500, M]:
            ratio = max(ab[j - 1] / ab[j], 0.001)
            assert u[j - 1] ** 2 + 1 == pytest.approx(
                (u[j] ** 2 + 1) / ratio, rel=1e-8
            )


def test_edm_sigma_ladder_cosine_range():
    # Known iDDPM/EDM property for the cosine schedule: sigma_max ~ 80-ish
    # scale, sigma_min small.
    u = S.edm_sigma_ladder("cosine", M=1000)
    assert u[0] > 50  # sigma_max
    assert 0 < u[999] < 0.1  # sigma_min
