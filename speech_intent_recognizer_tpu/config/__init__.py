from speech_intent_recognizer_tpu.config.schema import (
    AudioConfig,
    Config,
    DataConfig,
    ModelConfig,
    ParallelConfig,
    TrainConfig,
)
from speech_intent_recognizer_tpu.config.loader import load_config, save_config

__all__ = [
    "AudioConfig",
    "Config",
    "DataConfig",
    "ModelConfig",
    "ParallelConfig",
    "TrainConfig",
    "load_config",
    "save_config",
]
