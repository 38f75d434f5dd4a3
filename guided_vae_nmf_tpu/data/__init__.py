from .wav import read_wav, write_wav
from .file_lists import speech_list, write_dataset, read_dataset
