from .engine import (
    MCEMConfig,
    mcem_run,
    mcem_run_converged,
    mcem_run_converged_batch,
    mcem_m1_batch,
    mcem_m2_batch,
    nmf_m_step,
    mh_sample_posterior,
    mh_wiener_filter,
    pad_power,
)
from .pallas_engine import (
    mcem_batch_fused,
    mh_chain_pallas,
)
from .peem import (
    HybridConfig,
    PEEMConfig,
    peem_run,
    peem_m1_batch,
    peem_m2_batch,
    peem_mcem_m2_batch,
)
from .spp import (
    SPPNoiseEstimator,
    timo_mask_estimation,
    timo_vad_estimation,
    timo_noise_estimation,
    spp_track_jax,
    spp_track_chunk,
    spp_state_init,
    timo_mask_estimation_jax,
    timo_vad_estimation_jax,
)
