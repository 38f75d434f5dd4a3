from .si_sdr import si_sdr_components, energy_ratios, energy_ratios_jax
from .stoi import stoi, estoi, third_octave_band_matrix, remove_silent_frames
from .stats import (
    mean_confidence_interval,
    compute_stats,
    compute_stats_noisnr,
)

# PESQ: prefer the ITU C extension when the external `pesq` wheel is
# importable (bit-conformant); otherwise use the first-party P.862.2-wb
# implementation so the metric protocol's PESQ column is always produced
# (reference run_metrics_M1.py:19,83). HAS_PESQ_NATIVE records which.
# (import the submodule first: its parent-attribute binding must happen
# before the `pesq` name below is resolved, or it would shadow it)
from .pesq import mos_lqo_wb, mos_lqo_nb

try:  # pragma: no cover - wheel absent in this environment
    from pesq import pesq

    HAS_PESQ_NATIVE = True
except ImportError:
    from .pesq import pesq

    HAS_PESQ_NATIVE = False
HAS_PESQ = True

from .runner import (  # noqa: E402  (needs HAS_PESQ defined above)
    run_metrics,
    compute_metrics_utt,
    compute_metrics_mixture_utt,
)
from .polqa import run_polqa, HAS_POLQA  # noqa: E402
from .objective import seg_snr, fw_seg_snr, llr, wss  # noqa: E402
