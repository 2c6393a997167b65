from speech_intent_recognizer_tpu.utils.profiling import (
    StepTimer,
    device_memory_stats,
    trace,
    trace_annotation,
)
from speech_intent_recognizer_tpu.utils.diagnostics import (
    device_smoke_test,
    print_device_info,
)

__all__ = [
    "StepTimer",
    "device_memory_stats",
    "device_smoke_test",
    "print_device_info",
    "trace",
    "trace_annotation",
]
