from .wav import read_wav, write_wav, read_wav_int16, wav_num_samples
from .file_lists import speech_list, write_dataset, read_dataset
from .noise import (
    qut_noise_list,
    demand_noise_list,
    preprocess_noise,
    noise_segment,
    noise_list_preprocessed,
    write_preprocessed_noise,
    snr_gain,
    mix_at_snr,
    synthetic_noise_bank,
)
from .h5io import (H5FrameWriter, H5FrameReader, H5StreamSource,
                   frame_batches)
from . import native_loader
from .synthesis import (
    create_clean_frames,
    create_noisy_frames,
    create_test_mixtures,
)
