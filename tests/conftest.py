"""Test harness configuration.

All tests run on CPU with a virtual 8-device mesh
(``xla_force_host_platform_device_count=8``) — the standard way to exercise
multi-chip sharding logic without TPU hardware.  Must run before any jax
import.
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

# The container's sitecustomize force-registers the TPU tunnel backend and
# sets jax_platforms="axon,cpu" programmatically, overriding the env var —
# pin tests back to CPU explicitly.
try:
    jax.config.update("jax_platforms", "cpu")
except Exception:
    pass

import numpy as np  # noqa: E402
import pytest  # noqa: E402

# Best-effort build of the native DSP library so its tests run (cheap; ~5 s).
_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if not os.path.exists(os.path.join(_REPO, "native", "build", "libsirdsp.so")):
    import subprocess

    try:
        subprocess.run([os.path.join(_REPO, "native", "build.sh")],
                       check=False, capture_output=True, timeout=120)
    except Exception:
        pass


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(42)


@pytest.fixture(scope="session")
def reference_mic_dir():
    """The 95-file gTTS corpus bundled with the reference (read-only)."""
    path = "/root/reference/mic_recordings"
    if not os.path.isdir(path):
        pytest.skip("reference corpus not available")
    return path
