"""Device diagnostics.

TPU-native analog of the reference's GPU scratch checks
(``scripts/utils/{testing_cuda,minimal_gpu_test,looking_for_gpu}.py``):
device discovery, a compile+matmul smoke test, and a short sustained-matmul
stress loop with achieved-TFLOPs reporting.  Usable as a module
(``python -m speech_intent_recognizer_tpu.utils.diagnostics``).
"""

from __future__ import annotations

import time
from typing import Dict

import jax
import jax.numpy as jnp

from speech_intent_recognizer_tpu.utils.profiling import device_memory_stats


def print_device_info() -> None:
    print(f"backend: {jax.default_backend()}")
    print(f"devices ({len(jax.devices())}):")
    for d in jax.devices():
        print(f"  {d} (process {d.process_index})")
    for name, stats in device_memory_stats().items():
        gb = stats["bytes_in_use"] / 2**30
        lim = stats["bytes_limit"] / 2**30
        print(f"  {name}: {gb:.2f} / {lim:.2f} GiB in use")


def device_smoke_test(size: int = 1024) -> bool:
    """Minimal compile + matmul + correctness check on the default device
    (the reference's CUDA smoke test analog, ``train.py:324-332``)."""
    x = jnp.ones((size, size), jnp.bfloat16)
    y = jax.jit(lambda a: a @ a)(x)
    y.block_until_ready()
    expected = float(size)
    got = float(y[0, 0])
    ok = abs(got - expected) / expected < 1e-2
    print(f"smoke test: {size}x{size} matmul -> {got} "
          f"(expect {expected}) {'OK' if ok else 'FAIL'}")
    return ok


def stress_test(seconds: float = 5.0, size: int = 4096) -> Dict[str, float]:
    """Sustained bf16 matmul loop; reports achieved TFLOP/s."""
    a = jax.random.normal(jax.random.key(0), (size, size), jnp.bfloat16)
    f = jax.jit(lambda x: x @ x)
    f(a).block_until_ready()  # compile
    n = 0
    t0 = time.perf_counter()
    out = a
    while time.perf_counter() - t0 < seconds:
        out = f(out)
        n += 1
    out.block_until_ready()
    dt = time.perf_counter() - t0
    tflops = 2 * size**3 * n / dt / 1e12
    print(f"stress: {n} matmuls of {size}^2 in {dt:.1f}s -> "
          f"{tflops:.1f} TFLOP/s")
    return {"matmuls": n, "seconds": dt, "tflops": tflops}


def optimizer_walkthrough(steps: int = 20, seed: int = 42) -> Dict[str, float]:
    """Seeded, step-numbered optimizer sanity check (the reference's
    ``scripts/utils/debug_optimizer.py`` analog): Adam on a tiny regression
    must monotonically-ish reduce the loss; reruns are bit-reproducible."""
    import jax
    import jax.numpy as jnp
    import optax

    key = jax.random.key(seed)
    k1, k2, k3 = jax.random.split(key, 3)
    w_true = jax.random.normal(k1, (16, 4))
    x = jax.random.normal(k2, (64, 16))
    y = x @ w_true
    params = {"w": jax.random.normal(k3, (16, 4)) * 0.1}
    tx = optax.adam(1e-1)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state):
        def loss_fn(p):
            return jnp.mean(jnp.square(x @ p["w"] - y))

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    losses = []
    for i in range(steps):
        params, opt_state, loss = step(params, opt_state)
        losses.append(float(loss))
        print(f"step {i + 1:2d}: loss {losses[-1]:.6f}")
    ok = losses[-1] < losses[0] * 0.1
    print(f"optimizer walkthrough: {'OK' if ok else 'FAIL'} "
          f"({losses[0]:.4f} -> {losses[-1]:.4f})")
    return {"first_loss": losses[0], "last_loss": losses[-1], "ok": ok}


def audio_loading_benchmark(paths, sample_rate: int = 16000) -> Dict[str, float]:
    """Time host audio decode+resample over real files (the reference's
    ``scripts/utils/test_audio_loading.py`` analog)."""
    from speech_intent_recognizer_tpu.data import native
    from speech_intent_recognizer_tpu.data.audio_io import load_audio

    t0 = time.perf_counter()
    total_seconds = 0.0
    for p in paths:
        x, _ = load_audio(p, target_sample_rate=sample_rate)
        total_seconds += len(x) / sample_rate
    dt = time.perf_counter() - t0
    rtf = total_seconds / dt if dt else 0.0
    print(f"decoded {len(paths)} files ({total_seconds:.1f}s audio) in "
          f"{dt:.2f}s -> {rtf:.0f}x realtime "
          f"(native={'yes' if native.available() else 'no'})")
    return {"files": len(paths), "audio_seconds": total_seconds,
            "wall_seconds": dt, "realtime_factor": rtf}


if __name__ == "__main__":
    print_device_info()
    device_smoke_test()
    stress_test()
