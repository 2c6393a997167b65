from speech_intent_recognizer_tpu.ops.frontend_numpy import (
    amplitude_to_db_np,
    hann_window,
    log_mel_spectrogram_np,
    mel_filterbank,
    power_to_db_np,
    spectrogram_np,
)
from speech_intent_recognizer_tpu.ops.frontend_jax import (
    FrontendParams,
    frame_signal,
    log_mel_frontend,
    make_frontend_params,
)
from speech_intent_recognizer_tpu.ops.specaugment import spec_augment
from speech_intent_recognizer_tpu.ops.augment import augment_waveforms, mixup
from speech_intent_recognizer_tpu.ops.resample import resample_jax, resample_np

__all__ = [
    "FrontendParams",
    "amplitude_to_db_np",
    "augment_waveforms",
    "frame_signal",
    "hann_window",
    "log_mel_frontend",
    "log_mel_spectrogram_np",
    "make_frontend_params",
    "mel_filterbank",
    "mixup",
    "power_to_db_np",
    "resample_jax",
    "resample_np",
    "spec_augment",
    "spectrogram_np",
]
