"""Driver-contract tests: __graft_entry__.entry compiles and runs;
dryrun_multichip executes a full train step on the virtual 8-device mesh."""

import pytest
import os
import subprocess
import sys

import numpy as np
import jax


class TestEntry:
    def test_entry_compiles_and_runs(self):
        from __graft_entry__ import entry

        fn, args = entry()
        out = jax.jit(fn)(*args)
        assert out.shape == (8, 31)
        assert np.isfinite(np.asarray(out, dtype=np.float32)).all()

    def test_dryrun_multichip_8(self, capsys):
        from __graft_entry__ import dryrun_multichip

        dryrun_multichip(8)
        assert "OK" in capsys.readouterr().out

    @pytest.mark.slow
    def test_dryrun_multichip_driver_style(self):
        """Exactly as the driver invokes it: a FRESH process with no
        harness env (no XLA device-count flag, no platform pin).

        Regression test for the tunnel-outage hang: the axon sitecustomize
        imports jax in every process, and the parent's inline-path probe
        used to call ``jax.devices()`` — initializing the tunnel backend,
        which HANGS during outages.  The parent must reach the CPU-pinned
        child without ever initializing a backend, so this completes in
        bounded time whether or not the tunnel is up.
        """
        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        env = {k: v for k, v in os.environ.items()
               if k not in ("JAX_PLATFORMS",)}
        env["XLA_FLAGS"] = " ".join(
            f for f in env.get("XLA_FLAGS", "").split()
            if "xla_force_host_platform_device_count" not in f)
        proc = subprocess.run(
            [sys.executable, "-c",
             "import sys; sys.path.insert(0, %r)\n"
             "import __graft_entry__\n"
             "__graft_entry__.dryrun_multichip(8)\n" % repo],
            env=env, cwd=repo, capture_output=True, text=True, timeout=540)
        assert proc.returncode == 0, proc.stderr[-2000:]
        # 2 meshes x 2 model families + dp-serving
        assert proc.stdout.count("OK") == 5, proc.stdout
