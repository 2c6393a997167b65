from speech_intent_recognizer_tpu.train.state import (
    TrainState,
    create_optimizer,
    create_train_state,
    optimizer_from_config,
)
from speech_intent_recognizer_tpu.train.loop import Trainer, TrainResult

__all__ = [
    "TrainState",
    "Trainer",
    "TrainResult",
    "create_optimizer",
    "create_train_state",
    "optimizer_from_config",
]
