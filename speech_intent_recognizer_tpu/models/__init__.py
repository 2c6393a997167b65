from speech_intent_recognizer_tpu.models.cnn_gru import CNNAudioGRU

__all__ = ["CNNAudioGRU"]
