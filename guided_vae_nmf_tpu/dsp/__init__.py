from .stft import (
    stft,
    istft,
    stft_jax,
    istft_jax,
    periodic_hann,
    stft_params,
)
from .stft import frame_count, istft_masked_jax, istft_masked_ri_jax
from .stft import pad_signal_for_stft, stft_batch_padded_jax
from .targets import (
    clean_speech_IBM_jax,
    clean_speech_VAD_jax,
    clean_speech_IBM,
    clean_speech_VAD,
    noise_robust_clean_speech_VAD,
    noise_robust_clean_speech_IBM,
    ideal_wiener_mask,
    noise_aware_IRM,
    noise_aware_IBM,
    lorenz_threshold,
)
