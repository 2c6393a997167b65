"""Convergence A/B: torch vs this framework on the bundled 95-file corpus.

The FSC audio itself cannot ship here (zero egress), so the reference's
0.9477 accuracy claim is backed by layered evidence: converter logit
parity, train-step/full-loop trajectory equivalence
(``test_train_parity.py``), and THIS test — the experiment-level A/B in
``examples/convergence_ab.py``: both frameworks train the reference
architecture with the identical recipe on identical features of the
bundled gTTS corpus, each from its own init and dropout draws, and must
reach matching best held-out accuracy.

Runs in a fresh subprocess WITHOUT the CPU pin so the JAX side uses the
accelerator (XLA-CPU's conv/pool backward is ~30x slower than torch's on
this host — a 60-epoch run would take over an hour; on the TPU it is
seconds).  Skipped cleanly when no accelerator is present.
"""

import json
import os
import subprocess
import sys

import pytest


def test_same_recipe_same_data_matching_accuracy(reference_mic_dir,
                                                 tmp_path):
    pytest.importorskip("torch")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = tmp_path / "ab.json"
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS",)}
    # drop the test harness' virtual-device flag; keep any user XLA flags
    flags = [f for f in env.get("XLA_FLAGS", "").split()
             if "xla_force_host_platform_device_count" not in f]
    env["XLA_FLAGS"] = " ".join(flags)
    proc = subprocess.run(
        [sys.executable, os.path.join(repo, "examples", "convergence_ab.py"),
         "--mic_dir", reference_mic_dir, "--epochs", "60",
         "--out", str(out), "--require-accel"],
        env=env, cwd=repo, capture_output=True, text=True, timeout=2300)
    if proc.returncode == 3:
        pytest.skip("no accelerator available for the JAX side")
    assert proc.returncode == 0, (
        f"A/B run failed:\n{proc.stdout[-2000:]}\n{proc.stderr[-2000:]}")
    result = json.loads(out.read_text())

    torch_acc = result["torch_best_held_acc"]
    jax_acc = result["jax_best_held_acc"]
    # both frameworks learn the corpus (held-out = 19 unseen gTTS variants;
    # the data ceiling sits around 0.74 — see BENCH_NOTES.md)...
    assert torch_acc >= 0.55, f"torch failed to converge: {result}"
    assert jax_acc >= 0.55, f"jax failed to converge: {result}"
    # ...to the same accuracy within small-sample noise (3 of 19 ~ 0.16)
    assert abs(torch_acc - jax_acc) <= 3 / 19 + 1e-6, (
        f"accuracy gap too large: {result}")
