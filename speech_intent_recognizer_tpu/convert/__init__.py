from speech_intent_recognizer_tpu.convert.torch_import import (
    convert_torch_state_dict,
    infer_num_classes,
    load_torch_checkpoint,
)
from speech_intent_recognizer_tpu.convert.torch_export import (
    export_torch_state_dict,
    save_torch_checkpoint,
)

__all__ = [
    "convert_torch_state_dict",
    "export_torch_state_dict",
    "infer_num_classes",
    "load_torch_checkpoint",
    "save_torch_checkpoint",
]
