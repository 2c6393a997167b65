"""JAX platform configuration.

Central place for runtime knobs every entry point wants:

* persistent compilation cache — first compilation of the big programs (the
  whole-epoch train scan, the fused feature+forward path) can take minutes
  on a cold backend; the on-disk cache makes every later process start
  warm.  Override the location with ``SIR_TPU_COMPILATION_CACHE`` (empty
  string disables).
"""

from __future__ import annotations

import logging
import os

logger = logging.getLogger(__name__)

_configured = False


def configure_jax(cache_dir: str | None = None) -> None:
    """Idempotent JAX setup; call before the first computation."""
    global _configured
    if _configured:
        return
    _configured = True
    import jax

    env = os.environ.get("SIR_TPU_COMPILATION_CACHE")
    if env == "":
        return
    cache_dir = env or cache_dir or os.path.expanduser(
        "~/.cache/sir_tpu/jax_cache")
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception as e:  # pragma: no cover
        logger.debug("compilation cache unavailable: %s", e)


def wait_for_backend(max_wait_s: float = 900.0,
                     probe_timeout_s: float = 120.0) -> bool:
    """Wait for the accelerator backend to become initializable.

    The TPU behind the ``axon`` tunnel has outages during which backend
    init either raises UNAVAILABLE or HANGS indefinitely — a hung init in
    an unattended benchmark records nothing.  Probe in short-lived
    SUBPROCESSES (a hung probe can be killed; a hung in-process init
    cannot) and return True as soon as one succeeds, False once
    ``max_wait_s`` is exhausted.  On a healthy tunnel the first probe
    succeeds in seconds.
    """
    import subprocess
    import sys
    import time

    deadline = time.monotonic() + max_wait_s
    while True:
        try:
            proc = subprocess.run(
                [sys.executable, "-c", "import jax; jax.devices()"],
                timeout=probe_timeout_s, capture_output=True)
            if proc.returncode == 0:
                return True
        except subprocess.TimeoutExpired:
            pass
        if time.monotonic() >= deadline:
            return False
        logger.warning("accelerator backend unavailable; retrying")
        time.sleep(min(30.0, max(1.0, deadline - time.monotonic())))


def ensure_live_platform(max_wait_s: float = 60.0) -> str:
    """Pin JAX to a platform that will actually come up.

    The container forces ``jax_platforms="axon,cpu"`` (sitecustomize), and
    during a tunnel outage *backend init hangs* — so any CLI that touches a
    jax array would hang forever before doing anything.  Probe the
    accelerator in killable subprocesses (:func:`wait_for_backend`); if it
    doesn't come up within ``max_wait_s``, pin ``jax_platforms="cpu"`` with
    a loud warning so the tool still works.  ``SIR_TPU_REQUIRE_ACCEL=1``
    turns the fallback into a hard error (exit-3 semantics are the
    caller's job).  A positive probe is cached on disk for 10 minutes so
    multi-process pipelines only pay it once.

    Returns "initialized" (too late to change), "accel", or "cpu".
    """
    import time

    import jax
    from jax._src import xla_bridge

    if xla_bridge.backends_are_initialized():
        return "initialized"
    if os.environ.get("JAX_PLATFORMS", "").strip() == "cpu":
        jax.config.update("jax_platforms", "cpu")
        return "cpu"

    stamp = os.path.join(os.path.expanduser("~/.cache/sir_tpu"),
                         "backend_ok")
    try:
        if time.time() - os.path.getmtime(stamp) < 600.0:
            return "accel"
    except OSError:
        pass
    if wait_for_backend(max_wait_s=max_wait_s,
                        probe_timeout_s=min(60.0, max_wait_s)):
        try:
            os.makedirs(os.path.dirname(stamp), exist_ok=True)
            with open(stamp, "w"):
                pass
            os.utime(stamp, None)
        except OSError:
            pass
        return "accel"
    if os.environ.get("SIR_TPU_REQUIRE_ACCEL"):
        raise RuntimeError(
            "accelerator backend unavailable (tunnel outage) and "
            "SIR_TPU_REQUIRE_ACCEL is set")
    logger.warning("accelerator backend unavailable (tunnel outage?); "
                   "falling back to CPU for this run")
    jax.config.update("jax_platforms", "cpu")
    return "cpu"
