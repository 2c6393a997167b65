"""Driver-contract tests: __graft_entry__.entry compiles and runs;
dryrun_multichip executes a full train step on the virtual 8-device mesh."""

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
