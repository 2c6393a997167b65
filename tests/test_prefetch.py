"""Prefetch pipeline tests."""

import numpy as np

from speech_intent_recognizer_tpu.data.prefetch import (
    BackgroundLoader, device_prefetch)


class TestDevicePrefetch:
    def test_yields_all_batches_in_order(self, rng):
        batches = [{"x": rng.standard_normal((4, 8)).astype(np.float32),
                    "y": np.full(4, i, np.int32)} for i in range(7)]
        out = list(device_prefetch(iter(batches), buffer_size=2))
        assert len(out) == 7
        for i, b in enumerate(out):
            assert int(np.asarray(b["y"])[0]) == i
            np.testing.assert_allclose(np.asarray(b["x"]), batches[i]["x"])

    def test_empty_iterator(self):
        assert list(device_prefetch(iter([]), buffer_size=2)) == []

    def test_short_iterator(self, rng):
        batches = [np.zeros(3, np.float32)]
        assert len(list(device_prefetch(iter(batches), buffer_size=4))) == 1


class TestBackgroundLoader:
    def test_produces_everything(self):
        def producer():
            for i in range(20):
                yield i

        loader = BackgroundLoader(producer, capacity=3)
        assert sorted(loader) == list(range(20))

    def test_reiterable(self):
        loader = BackgroundLoader(lambda: iter([1, 2, 3]), capacity=2)
        assert list(loader) == [1, 2, 3]
        assert list(loader) == [1, 2, 3]
