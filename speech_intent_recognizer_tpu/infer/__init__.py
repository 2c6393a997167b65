from speech_intent_recognizer_tpu.infer.predict import Predictor
from speech_intent_recognizer_tpu.infer.vad import EnergyVAD, VADSegmenter
from speech_intent_recognizer_tpu.infer.streaming import (
    StreamingFeaturizer,
    StreamingRecognizer,
)

__all__ = [
    "EnergyVAD",
    "Predictor",
    "StreamingFeaturizer",
    "StreamingRecognizer",
    "VADSegmenter",
]
