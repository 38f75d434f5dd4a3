from .si_sdr import si_sdr_components, energy_ratios, energy_ratios_jax
from .stoi import stoi, estoi, third_octave_band_matrix, remove_silent_frames
from .stats import (
    mean_confidence_interval,
    compute_stats,
    compute_stats_noisnr,
)

try:  # optional: ITU-T P.862 PESQ via the external C extension if present
    from pesq import pesq  # pragma: no cover

    HAS_PESQ = True
except ImportError:  # pragma: no cover
    pesq = None
    HAS_PESQ = False

from .runner import (  # noqa: E402  (needs HAS_PESQ defined above)
    run_metrics,
    compute_metrics_utt,
    compute_metrics_mixture_utt,
)
from .polqa import run_polqa, HAS_POLQA  # noqa: E402
from .objective import seg_snr, fw_seg_snr, llr, wss  # noqa: E402
