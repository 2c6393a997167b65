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

__all__ = [
    "FrontendParams",
    "amplitude_to_db_np",
    "frame_signal",
    "hann_window",
    "log_mel_frontend",
    "log_mel_spectrogram_np",
    "make_frontend_params",
    "mel_filterbank",
    "power_to_db_np",
    "spectrogram_np",
]
