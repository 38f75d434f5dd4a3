from .figures import (
    power_to_db,
    display_waveplot,
    display_spectrogram,
    display_power_spectro,
    display_wav_spectro_mask,
    display_multiple_signals,
    display_multiple_spectro,
)
