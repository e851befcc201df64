from genie2_tpu.diffusion.schedule import (
    Schedule,
    cosine_beta_schedule,
    get_betas,
    q_sample,
    x0_from_eps,
    ddim_step_from_eps,
    posterior_mean_from_eps,
    posterior_mean_from_x0,
)

__all__ = [
    "Schedule",
    "cosine_beta_schedule",
    "get_betas",
    "q_sample",
    "x0_from_eps",
    "ddim_step_from_eps",
    "posterior_mean_from_eps",
    "posterior_mean_from_x0",
]
