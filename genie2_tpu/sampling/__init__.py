from genie2_tpu.sampling.base import BaseSampler, bucket_length
from genie2_tpu.sampling.ddpm import (
    ancestral_sample,
    ancestral_sample_injected,
    ancestral_sample_with_trajectory,
    ddim_sample,
    ddim_schedule,
    eta_schedule_below,
    reverse_step,
)
from genie2_tpu.sampling.unconditional import (
    PackedUnconditionalSampler,
    UnconditionalSampler,
)
from genie2_tpu.sampling.scaffold import ScaffoldSampler
from genie2_tpu.sampling.smc import SMCSampler, TDSTrace, tds_sample
from genie2_tpu.sampling.motif_target import load_motif_target, parse_motif_target_pdb
from genie2_tpu.sampling.dpm_solver import dpm_solver_sample
from genie2_tpu.sampling.feynman_kac import FKResult, smc_feynman_kac
from genie2_tpu.sampling.sse_guided import soft_sse_fraction, sse_guided_sample
from genie2_tpu.sampling.resampling import (
    RESAMPLERS,
    ess_from_log_weights,
    multinomial_resample_indices,
    normalize_log_weights,
    stratified_resample_indices,
    systematic_resample_indices,
)
from genie2_tpu.sampling.twisting import (
    enumerate_motif_placements,
    placements_to_positions,
    twisting_log_prob,
    xstart_variance,
)

__all__ = [
    "BaseSampler",
    "bucket_length",
    "ancestral_sample",
    "ancestral_sample_with_trajectory",
    "ddim_sample",
    "eta_schedule_below",
    "ddim_schedule",
    "dpm_solver_sample",
    "reverse_step",
    "UnconditionalSampler",
    "PackedUnconditionalSampler",
    "ScaffoldSampler",
    "SMCSampler",
    "TDSTrace",
    "tds_sample",
    "load_motif_target",
    "parse_motif_target_pdb",
    "FKResult",
    "smc_feynman_kac",
    "soft_sse_fraction",
    "sse_guided_sample",
    "RESAMPLERS",
    "ess_from_log_weights",
    "multinomial_resample_indices",
    "normalize_log_weights",
    "stratified_resample_indices",
    "systematic_resample_indices",
    "enumerate_motif_placements",
    "placements_to_positions",
    "twisting_log_prob",
    "xstart_variance",
]
