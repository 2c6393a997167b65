"""On-device augmentation tests (SpecAugment, waveform augs, mixup)."""

import numpy as np
import jax
import jax.numpy as jnp

from speech_intent_recognizer_tpu.ops.augment import (
    _RATE_KS, _linear_resample, _resample_bank, _resample_fixed,
    augment_waveforms, batched_time_shift, mixup, time_shift)
from speech_intent_recognizer_tpu.ops.specaugment import spec_augment


class TestSpecAugment:
    def test_shapes_preserved(self, rng):
        x = jnp.asarray(rng.standard_normal((4, 64, 200)), jnp.float32)
        out = spec_augment(x, jax.random.key(0), augment_prob=1.0)
        assert out.shape == x.shape

    def test_prob_zero_is_identity(self, rng):
        x = jnp.asarray(rng.standard_normal((4, 64, 200)), jnp.float32)
        out = spec_augment(x, jax.random.key(0), augment_prob=0.0)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(x))

    def test_masks_zero_contiguous_region(self, rng):
        x = jnp.ones((8, 64, 200), jnp.float32)
        out = np.asarray(spec_augment(x, jax.random.key(3), augment_prob=1.0,
                                      gate_prob=1.0))
        # each sample must have masked (zeroed) bins within param bounds
        for b in range(8):
            zero_t = (out[b] == 0).all(axis=0).sum()  # fully-zero time cols
            zero_f = (out[b] == 0).all(axis=1).sum()  # fully-zero freq rows
            assert zero_t <= 20 and zero_f <= 10
        assert (out == 0).any()  # something was masked somewhere

    def test_jit_compatible(self, rng):
        x = jnp.asarray(rng.standard_normal((2, 64, 200)), jnp.float32)
        f = jax.jit(lambda x, k: spec_augment(x, k, 0.7))
        out = f(x, jax.random.key(0))
        assert out.shape == x.shape


class TestWaveformAugment:
    def test_time_shift_exact(self):
        x = jnp.asarray(np.arange(10, dtype=np.float32))
        out = np.asarray(time_shift(x, jnp.int32(10), jnp.int32(3)))
        np.testing.assert_array_equal(out[:3], 0.0)
        np.testing.assert_array_equal(out[3:], np.arange(7))
        out2 = np.asarray(time_shift(x, jnp.int32(10), jnp.int32(-2)))
        np.testing.assert_array_equal(out2[:8], np.arange(2, 10))
        np.testing.assert_array_equal(out2[8:], 0.0)

    def test_batch_shapes_and_lengths(self, rng):
        waves = jnp.asarray(rng.standard_normal((4, 8000)), jnp.float32)
        lengths = jnp.asarray([8000, 4000, 6000, 2000], jnp.int32)
        out, new_len = augment_waveforms(waves, lengths, jax.random.key(0),
                                         augment_prob=1.0)
        assert out.shape == waves.shape
        assert (np.asarray(new_len) > 0).all()
        assert (np.asarray(new_len) <= 8000).all()

    def test_batched_shift_matches_scalar_golden(self, rng):
        """The two-level one-hot-matmul shift (TPU path: no per-row
        gathers) must be EXACT against the scalar golden for arbitrary
        integer shifts on zero-padded rows (the waveform-cache
        precondition), including lengths not divisible by the chunk."""
        L = 1000  # not a multiple of _SHIFT_CHUNK
        lengths = np.asarray([1000, 700, 513, 1], np.int32)
        x = rng.standard_normal((4, L)).astype(np.float32)
        x *= (np.arange(L)[None, :] < lengths[:, None])
        shifts = np.asarray([137, -1, -260, 999], np.int32)
        fast = np.asarray(batched_time_shift(jnp.asarray(x),
                                             jnp.asarray(shifts)))
        gold = np.stack([
            np.asarray(time_shift(jnp.asarray(x[i]), jnp.int32(lengths[i]),
                                  jnp.int32(shifts[i])))
            for i in range(4)])
        np.testing.assert_array_equal(fast, gold)

    def test_polyphase_resample_matches_scalar_golden(self, rng):
        """The fixed-rate polyphase matmul resampler must match the
        gather-based golden at every grid rate (zero-padded input)."""
        L = 1024  # multiple of the den=64 frame stride
        length = 800
        x = rng.standard_normal((2, L)).astype(np.float32)
        x[:, length:] = 0.0
        for k in (_RATE_KS[0], 64, _RATE_KS[-1]):
            fast = np.asarray(_resample_fixed(jnp.asarray(x), k))
            gold = np.stack([
                np.asarray(_linear_resample(jnp.asarray(x[i]),
                                            jnp.float32(k / 64.0)))
                for i in range(2)])
            np.testing.assert_allclose(fast, gold, atol=2e-6,
                                       err_msg=f"rate {k}/64")

    def test_resample_bank_selects_per_row_rate(self, rng):
        x = rng.standard_normal((3, 512)).astype(np.float32)
        idx = np.asarray([0, 9, len(_RATE_KS) - 1], np.int32)
        out = np.asarray(_resample_bank(jnp.asarray(x), jnp.asarray(idx)))
        for i, ki in enumerate(idx):
            ref = np.asarray(_resample_fixed(jnp.asarray(x[i : i + 1]),
                                             _RATE_KS[ki]))[0]
            np.testing.assert_allclose(out[i], ref, atol=2e-6)

    def test_prob_zero_identity(self, rng):
        waves = jnp.asarray(rng.standard_normal((2, 4000)), jnp.float32)
        lengths = jnp.asarray([4000, 4000], jnp.int32)
        out, new_len = augment_waveforms(waves, lengths, jax.random.key(0),
                                         augment_prob=0.0)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(waves))
        np.testing.assert_array_equal(np.asarray(new_len),
                                      np.asarray(lengths))


class TestMixup:
    def test_mixes_convexly(self, rng):
        x = jnp.asarray(rng.standard_normal((6, 64, 200)), jnp.float32)
        y = jax.nn.one_hot(jnp.asarray([0, 1, 2, 3, 0, 1]), 4)
        mx, my = mixup(x, y, jax.random.key(0), alpha=0.2)
        assert mx.shape == x.shape and my.shape == y.shape
        sums = np.asarray(my).sum(axis=1)
        np.testing.assert_allclose(sums, 1.0, atol=1e-6)
