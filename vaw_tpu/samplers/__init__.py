from .driver import Sampler
from .edm import EDMPlan, ablation_sampler, build_edm_plan, round_sigma_index
from .guidance import IntervalCFG, cfg_scale_for_time, classifier_cond_fn

__all__ = [
    "Sampler",
    "EDMPlan", "build_edm_plan", "ablation_sampler", "round_sigma_index",
    "IntervalCFG", "cfg_scale_for_time", "classifier_cond_fn",
]
