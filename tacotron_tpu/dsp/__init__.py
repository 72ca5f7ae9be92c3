from tacotron_tpu.dsp.stft import stft, istft, stft_magnitude
from tacotron_tpu.dsp.mel import mel_filterbank
from tacotron_tpu.dsp.audio import (
    preemphasis,
    inv_preemphasis,
    spectrogram,
    melspectrogram,
    inv_spectrogram,
    amp_to_db,
    db_to_amp,
    normalize,
    denormalize,
)
from tacotron_tpu.dsp.griffin_lim import griffin_lim

__all__ = [
    "stft",
    "istft",
    "stft_magnitude",
    "mel_filterbank",
    "preemphasis",
    "inv_preemphasis",
    "spectrogram",
    "melspectrogram",
    "inv_spectrogram",
    "amp_to_db",
    "db_to_amp",
    "normalize",
    "denormalize",
    "griffin_lim",
]
