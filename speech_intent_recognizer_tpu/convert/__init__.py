from speech_intent_recognizer_tpu.convert.torch_import import (
    convert_torch_state_dict,
    infer_num_classes,
    load_torch_checkpoint,
)

__all__ = [
    "convert_torch_state_dict",
    "infer_num_classes",
    "load_torch_checkpoint",
]
