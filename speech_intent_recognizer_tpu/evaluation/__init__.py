from speech_intent_recognizer_tpu.evaluation.metrics import (
    accuracy_score,
    classification_report_dict,
    confusion_matrix,
    format_classification_report,
)
from speech_intent_recognizer_tpu.evaluation.evaluate import evaluate_dataset
from speech_intent_recognizer_tpu.evaluation.tts_holdout import (
    evaluate_tts_directory,
)

__all__ = [
    "accuracy_score",
    "classification_report_dict",
    "confusion_matrix",
    "evaluate_dataset",
    "evaluate_tts_directory",
    "format_classification_report",
]
