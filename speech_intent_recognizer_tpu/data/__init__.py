from speech_intent_recognizer_tpu.data.audio_io import (
    AudioDecodeError,
    load_audio,
    save_wav,
    validate_audio,
)
from speech_intent_recognizer_tpu.data.labelmap import (
    create_label_map,
    load_label_map,
    save_label_map,
)
from speech_intent_recognizer_tpu.data.manifest import Manifest, read_manifest

__all__ = [
    "AudioDecodeError",
    "Manifest",
    "create_label_map",
    "load_audio",
    "load_label_map",
    "read_manifest",
    "save_label_map",
    "save_wav",
    "validate_audio",
]
