"""Utility subsystem tests: diagnostics, profiling, platform config."""

import os

import numpy as np

from speech_intent_recognizer_tpu.utils.diagnostics import (
    audio_loading_benchmark, device_smoke_test, optimizer_walkthrough,
    print_device_info)
from speech_intent_recognizer_tpu.utils.profiling import (
    StepTimer, device_memory_stats)


class TestDiagnostics:
    def test_smoke_test_passes(self, capsys):
        assert device_smoke_test(size=128)

    def test_optimizer_walkthrough_converges(self, capsys):
        result = optimizer_walkthrough(steps=15)
        assert result["ok"]
        assert result["last_loss"] < result["first_loss"]

    def test_optimizer_walkthrough_reproducible(self, capsys):
        a = optimizer_walkthrough(steps=5, seed=7)
        b = optimizer_walkthrough(steps=5, seed=7)
        assert a["last_loss"] == b["last_loss"]

    def test_device_info_prints(self, capsys):
        print_device_info()
        out = capsys.readouterr().out
        assert "devices" in out

    def test_audio_loading_benchmark(self, reference_mic_dir, capsys):
        paths = [os.path.join(reference_mic_dir, f)
                 for f in sorted(os.listdir(reference_mic_dir))[:3]
                 if f.endswith(".wav")]
        stats = audio_loading_benchmark(paths)
        assert stats["files"] == len(paths)
        assert stats["audio_seconds"] > 0
        assert stats["realtime_factor"] > 1  # decode faster than realtime


class TestProfiling:
    def test_step_timer_ema(self):
        t = StepTimer(decay=0.5)
        import time

        for _ in range(3):
            with t:
                time.sleep(0.01)
        assert t.ema is not None and t.ema > 0.005
        assert t.rate(100) > 0

    def test_memory_stats_shape(self):
        stats = device_memory_stats()
        for _name, s in stats.items():
            assert set(s) == {"bytes_in_use", "peak_bytes_in_use",
                              "bytes_limit"}


class TestWaitForBackend:
    """wait_for_backend probes init in killable subprocesses (the tunnel
    to the TPU has outages during which in-process init hangs forever)."""

    def test_success_path(self, monkeypatch):
        import subprocess

        from speech_intent_recognizer_tpu.utils import platform as plat

        calls = []

        def fake_run(cmd, timeout, capture_output):
            calls.append(cmd)
            return subprocess.CompletedProcess(cmd, 0)

        monkeypatch.setattr(subprocess, "run", fake_run)
        assert plat.wait_for_backend(max_wait_s=5, probe_timeout_s=1)
        assert len(calls) == 1

    def test_outage_exhausts_budget(self, monkeypatch):
        import subprocess

        from speech_intent_recognizer_tpu.utils import platform as plat

        def fake_run(cmd, timeout, capture_output):
            raise subprocess.TimeoutExpired(cmd, timeout)

        monkeypatch.setattr(subprocess, "run", fake_run)
        assert not plat.wait_for_backend(max_wait_s=0.01, probe_timeout_s=0.01)
