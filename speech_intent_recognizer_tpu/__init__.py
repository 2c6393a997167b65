"""speech_intent_recognizer_tpu — a TPU-native speech intent recognition framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of the reference
project ``avi2924/Speech-Intent-Recognizer`` (PyTorch/CUDA, single GPU):

* Fused log-mel feature front-end (GEMM-native DFT on the MXU, single Pallas
  kernel) with bit-faithful parity to the reference torchaudio front-end
  (``scripts/precompute_features.py:28-73`` in the reference).
* On-device SpecAugment and waveform augmentation inside the input pipeline
  (reference: ``scripts/augment.py``, ``scripts/dataset.py:160-176``).
* Flax CNN->BiGRU->attention intent classifier with a PyTorch checkpoint
  converter (reference: ``models/models.py:5-68``).
* Data-parallel training over a ``jax.sharding.Mesh`` (whole-epoch
  ``lax.scan``, bf16 compute), Orbax checkpoint/resume, early stopping
  (reference: ``scripts/train.py:164-302``).
* Evaluation with classification reports and confusion matrices
  (reference: ``scripts/evaluate.py:31-117``).
* Batch and streaming (incremental log-mel + carried GRU state) inference,
  energy VAD (reference: ``scripts/test_model.py``, ``scripts/testing.py``).

Everything device-side is JAX; host-side audio decode/resample has a native
C++ path (``native/``) with a pure-NumPy fallback.
"""

from speech_intent_recognizer_tpu.version import __version__

__all__ = ["__version__"]
