"""Convergence A/B: torch vs this framework, with defensible statistics.

The FSC audio itself cannot ship here (zero egress), so the reference's
0.9477 accuracy claim is backed by layered evidence: converter logit
parity, train-step/full-loop trajectory equivalence
(``test_train_parity.py``), and the experiment-level A/Bs in
``examples/convergence_ab.py`` — both frameworks train the reference
architecture with the identical recipe on identical features, each from
its own init and dropout draws.

Round-3 verdict (Weak #2): the old single-seed assertion on the bundled
corpus' 19-sample holdout was flaky by construction (1 sample = 5.3%
accuracy; measured seed spread sigma ~ 0.09).  Round 4 replaces it with
two tests:

* ``test_bundled_corpus_two_seed_guard`` — the in-suite both-frameworks
  smoke on the bundled 95-file corpus, now 2 seed pairs and a bound
  derived from the measured seed variance (BENCH_NOTES.md round 3:
  sigma_jax ~= 0.091, sigma_torch ~= 0.026 on this corpus).  3-sigma on a
  2-seed mean difference = 3*sqrt((0.091^2 + 0.026^2)/2) ~= 0.20.  This
  guards gross divergence (a broken step lands at chance, gap ~0.8), not
  fine accuracy.
* ``test_powered_corpus_jax_matches_recorded_torch`` — the statistically
  powered claim: 5 jax seeds on the 3,040-utterance synthetic corpus
  (608-sample stratified holdout, 1 sample = 0.16%), compared against the
  torch mean recorded from the identical recipe on the identical corpus
  (BENCH_NOTES.md round 4; examples/make_ab_corpus.py is deterministic,
  so the corpus is byte-reproducible).  The jax MEDIAN is asserted, not
  the mean: ~1 in 15 seeds is a late-plateau-escape run in either
  framework (measured; see BENCH_NOTES), and the median of 5 is robust to
  it while the mean is not.

Both run in fresh subprocesses WITHOUT the CPU pin so the JAX side uses
the accelerator (XLA-CPU's conv/pool backward is ~30x slower than
torch's on this host).  Skipped cleanly when no accelerator is present.
"""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # >2 min on the 1-core host

# Recorded torch-side statistics on the powered corpus (identical recipe:
# 20 epochs, batch 16, lr 2e-3, wd 1e-4, clip 1.0, dropout 0.5; corpus =
# make_ab_corpus.py --variants 80 --profile harder --seed 0).  Provenance:
# BENCH_NOTES.md "Round 4: statistically powered convergence A/B".
TORCH_POWERED_MEAN = 0.9539
TORCH_POWERED_STD = 0.0069  # 5 seeds
# jax good-seed spread on the same corpus: 14 of 15 seeds in [0.91, 0.98],
# sigma ~= 0.015 (excluding the one plateau seed).  Median-of-5 vs torch
# mean bound: 0.05 covers 3 sigma of both sides with margin.
POWERED_MEDIAN_BOUND = 0.05


def _repo():
    return os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _accel_env():
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS",)}
    # drop the test harness' virtual-device flag; keep any user XLA flags
    flags = [f for f in env.get("XLA_FLAGS", "").split()
             if "xla_force_host_platform_device_count" not in f]
    env["XLA_FLAGS"] = " ".join(flags)
    return env


def _run_ab(args, timeout):
    proc = subprocess.run(
        [sys.executable, os.path.join(_repo(), "examples",
                                      "convergence_ab.py"),
         "--require-accel", *args],
        env=_accel_env(), cwd=_repo(), capture_output=True, text=True,
        timeout=timeout)
    if proc.returncode == 3:
        pytest.skip("no accelerator available for the JAX side")
    assert proc.returncode == 0, (
        f"A/B run failed:\n{proc.stdout[-2000:]}\n{proc.stderr[-2000:]}")
    return proc


def test_bundled_corpus_two_seed_guard(reference_mic_dir, tmp_path):
    pytest.importorskip("torch")
    out = tmp_path / "ab.json"
    _run_ab(["--mic_dir", reference_mic_dir, "--epochs", "60",
             "--seeds", "2", "--out", str(out)], timeout=3000)
    result = json.loads(out.read_text())

    torch_mean = float(np.mean(result["torch_accs"]))
    jax_mean = float(np.mean(result["jax_accs"]))
    # both frameworks learn the corpus (held-out = 19 unseen gTTS variants;
    # the data ceiling sits around 0.74 — see BENCH_NOTES.md)...
    assert torch_mean >= 0.55, f"torch failed to converge: {result}"
    assert jax_mean >= 0.55, f"jax failed to converge: {result}"
    # ...to the same accuracy within the measured seed variance (3-sigma
    # bound on a 2-seed mean difference; see module docstring)
    assert abs(torch_mean - jax_mean) <= 0.20 + 1e-6, (
        f"accuracy gap beyond 3-sigma of measured seed variance: {result}")


@pytest.fixture(scope="session")
def powered_corpus():
    """The deterministic 3,040-utterance A/B corpus (features npz).

    Reuses an existing generation when present (the generator is seeded
    and byte-stable); otherwise synthesizes into a shared cache dir
    (~3 min of host CPU, once per container).
    """
    for cand in ("/root/ab_corpus_harder/features.npz",
                 "/tmp/sir_ab_corpus_harder/features.npz"):
        if os.path.exists(cand):
            d = np.load(cand)
            if d["features"].shape == (3040, 64, 200):
                return cand
    out = "/tmp/sir_ab_corpus_harder"
    proc = subprocess.run(
        [sys.executable, os.path.join(_repo(), "examples",
                                      "make_ab_corpus.py"),
         "--variants", "80", "--profile", "harder", "--seed", "0",
         "--out", out],
        cwd=_repo(), capture_output=True, text=True, timeout=3000)
    assert proc.returncode == 0, (
        f"corpus generation failed:\n{proc.stdout[-1500:]}\n"
        f"{proc.stderr[-1500:]}")
    return os.path.join(out, "features.npz")


def test_powered_corpus_jax_matches_recorded_torch(powered_corpus,
                                                   tmp_path):
    out = tmp_path / "ab_powered.json"
    _run_ab(["--features", powered_corpus, "--epochs", "20",
             "--seeds", "5", "--side", "jax", "--out", str(out)],
            timeout=3000)
    result = json.loads(out.read_text())

    accs = result["jax_accs"]
    assert len(accs) == 5
    median = float(np.median(accs))
    assert abs(median - TORCH_POWERED_MEAN) <= POWERED_MEDIAN_BOUND, (
        f"jax 5-seed median {median:.4f} vs recorded torch mean "
        f"{TORCH_POWERED_MEAN} (bound {POWERED_MEDIAN_BOUND}): {result}")
    # at least 4 of 5 seeds must individually converge past 0.85 (one
    # late-plateau-escape seed per ~15 is within measured behavior of
    # BOTH frameworks; two in five is not)
    assert sum(a >= 0.85 for a in accs) >= 4, (
        f"more than one non-converged seed: {result}")
