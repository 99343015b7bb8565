from .types import LossType, ModelMeanType, ModelVarType
from .schedules import (
    Schedule,
    betas_for_alpha_bar,
    edm_sigma_ladder,
    get_named_beta_schedule,
    make_schedule,
    respace_schedule,
    space_timesteps,
)
from .weighting import (
    LossSecondMomentResampler,
    UniformSampler,
    compute_mse_loss_weight,
    create_named_schedule_sampler,
)
from .losses import (
    compute_align_loss,
    discretized_gaussian_log_likelihood,
    mean_flat,
    normal_kl,
    projection_loss,
)
from .diffusion import GaussianDiffusion, unpack_model_output
from .flow import FlowMatching, interpolant

__all__ = [
    "LossType", "ModelMeanType", "ModelVarType",
    "Schedule", "betas_for_alpha_bar", "edm_sigma_ladder",
    "get_named_beta_schedule", "make_schedule", "respace_schedule",
    "space_timesteps",
    "LossSecondMomentResampler", "UniformSampler", "compute_mse_loss_weight",
    "create_named_schedule_sampler",
    "compute_align_loss", "discretized_gaussian_log_likelihood", "mean_flat",
    "normal_kl", "projection_loss",
    "GaussianDiffusion", "unpack_model_output",
    "FlowMatching", "interpolant",
]
