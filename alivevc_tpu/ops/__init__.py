from alivevc_tpu.ops.interp import linear_interpolate
from alivevc_tpu.ops.stft import (
    spectrogram,
    stft_magnitude,
    mel_filterbank,
    log_mel_spectrogram,
)
from alivevc_tpu.ops.resample import resample
from alivevc_tpu.ops.pitch import (
    f0_to_pitch,
    pitch_to_f0,
    shift_pitch,
    apply_intonation,
)
from alivevc_tpu.ops.knn import match_features

__all__ = [
    "linear_interpolate",
    "spectrogram",
    "stft_magnitude",
    "mel_filterbank",
    "log_mel_spectrogram",
    "resample",
    "f0_to_pitch",
    "pitch_to_f0",
    "shift_pitch",
    "apply_intonation",
    "match_features",
]
