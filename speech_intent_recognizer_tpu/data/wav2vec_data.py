"""Raw-waveform batching for the wav2vec path.

Rebuild of the reference's orphaned wav2vec dataset/utils (bytecode-only:
``scripts/__pycache__/wav2vec_dataset...pyc`` and
``scripts/utils/__pycache__/wav2vec_utils...pyc`` — mono 16 kHz waveforms,
train-time Gaussian noise, batch padding with attention masks).

Batches are padded to a *fixed* ``max_length`` (not the per-batch max as the
reference did): static shapes are what keep every step on the same compiled
XLA program.
"""

from __future__ import annotations

import logging
from typing import Sequence, Tuple

import numpy as np

from speech_intent_recognizer_tpu.data.audio_io import load_audio

logger = logging.getLogger(__name__)


def load_waveform(path: str, sample_rate: int = 16000,
                  max_length: int = 80000) -> np.ndarray:
    x, _ = load_audio(path, target_sample_rate=sample_rate)
    return x[:max_length]


def batch_waveforms(
    paths: Sequence[str],
    sample_rate: int = 16000,
    max_length: int = 80000,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """-> (waveforms (B, max_length) f32, attention_mask (B, max_length) i32,
    ok mask). Failed decodes become zero rows with a 1-sample mask."""
    b = len(paths)
    buf = np.zeros((b, max_length), np.float32)
    mask = np.zeros((b, max_length), np.int32)
    ok = np.ones(b, bool)
    for i, p in enumerate(paths):
        try:
            x = load_waveform(p, sample_rate, max_length)
            n = max(len(x), 1)
            buf[i, : len(x)] = x
            mask[i, :n] = 1
        except Exception as e:
            logger.error("error loading %s: %s", p, e)
            mask[i, 0] = 1
            ok[i] = False
    return buf, mask, ok


def add_train_noise(waveforms, mask, key, prob: float = 0.8,
                    level: float = 1e-3):
    """Train-time additive noise (reference wav2vec dataset semantics)."""
    import jax

    k1, k2 = jax.random.split(key)
    gate = (jax.random.uniform(k1, (waveforms.shape[0], 1))
            < prob).astype(waveforms.dtype)
    noise = jax.random.normal(k2, waveforms.shape) * level
    return waveforms + gate * noise * mask.astype(waveforms.dtype)
