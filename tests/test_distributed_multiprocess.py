"""Two-process ``jax.distributed`` test of the multi-host path.

SCALING.md's multi-host design (``initialize_distributed`` + per-host
manifest sharding + one global-mesh train step) exercised for real: two
OS processes, each with 4 virtual CPU devices, form one 8-device ``data``
mesh over the gloo-backed distributed runtime. Each process feeds only its
``host_shard`` of the dataset; the jitted epoch function reduces gradients
globally. Asserts both processes agree AND that the result matches the
same step run single-process on 8 local devices (full DP equivalence
across the process boundary).
"""

import os
import re
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

N = 32
T_FRAMES = 64
NUM_CLASSES = 5

WORKER = r"""
import os, sys
proc_id = int(sys.argv[1]); port = sys.argv[2]
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
sys.path.insert(0, {repo!r})
import jax
jax.config.update("jax_platforms", "cpu")
from speech_intent_recognizer_tpu.parallel.distributed import (
    host_shard, initialize_distributed)
initialize_distributed("localhost:" + port, num_processes=2,
                       process_id=proc_id)
assert jax.process_count() == 2 and jax.device_count() == 8
import numpy as np
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from speech_intent_recognizer_tpu.config.schema import Config
from speech_intent_recognizer_tpu.models.cnn_gru import CNNAudioGRU
from speech_intent_recognizer_tpu.train.loop import Trainer
from speech_intent_recognizer_tpu.train.state import (create_optimizer,
                                                      create_train_state)

N, T, C = {n}, {t}, {c}
mesh = Mesh(np.array(jax.devices()).reshape(8), ("data",))
data_s = NamedSharding(mesh, P("data"))
rep = lambda x: jax.make_array_from_process_local_data(
    NamedSharding(mesh, P()), np.asarray(x))

rng = np.random.default_rng(11)
feats = rng.standard_normal((N, 64, T)).astype(np.float32)
labels = rng.integers(0, C, N).astype(np.int32)
shard = host_shard(N)  # this host's manifest rows
gfeats = jax.make_array_from_process_local_data(
    data_s, feats[list(shard)], (N, 64, T))
glabels = jax.make_array_from_process_local_data(
    data_s, labels[list(shard)], (N,))

cfg = Config.from_dict(dict(num_labels=C, epochs=1, batch_size=N, lr=1e-3,
                            bf16=False, use_augmentation=False,
                            use_mixup=False, mel_spec_length=T))
model = CNNAudioGRU(num_classes=C)
tx = create_optimizer(lr=1e-3, weight_decay=1e-4, grad_clip=1.0)
state = create_train_state(model, jax.random.key(0), tx,
                           input_shape=(1, 64, T))
state = state.replace(
    params=jax.tree.map(rep, state.params),
    batch_stats=jax.tree.map(rep, state.batch_stats),
    opt_state=jax.tree.map(
        lambda x: rep(x) if hasattr(x, "shape") else x, state.opt_state),
    step=rep(state.step))
trainer = Trainer(model, cfg, mesh=mesh, tx=tx, num_classes=C)
epoch_fn = trainer._build_epoch_fn()
perm = rep(np.arange(N, dtype=np.int32).reshape(1, N))
w = rep(np.ones((1, N), np.float32))
gkey = jax.random.wrap_key_data(rep(jax.random.key_data(jax.random.key(2))))
state, m = epoch_fn(state, gfeats, glabels, perm, w, gkey)
loss = float(m["loss"])
fc = np.asarray(jax.device_get(state.params["fc"]["kernel"]))
print(f"RESULT proc={{proc_id}} loss={{loss:.8f}} fc={{float(np.abs(fc).sum()):.8f}}",
      flush=True)
""".format(repo=REPO, n=N, t=T_FRAMES, c=NUM_CLASSES)


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


@pytest.fixture(scope="module")
def two_process_result():
    port = str(_free_port())
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    procs = [subprocess.Popen([sys.executable, "-c", WORKER, str(i), port],
                              stdout=subprocess.PIPE,
                              stderr=subprocess.STDOUT, text=True, env=env,
                              cwd=REPO)
             for i in range(2)]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=420)
        except subprocess.TimeoutExpired:
            p.kill()
            out, _ = p.communicate()
        outs.append(out)
    results = {}
    for out, p in zip(outs, procs):
        assert p.returncode == 0, f"worker failed:\n{out[-3000:]}"
        m = re.search(r"RESULT proc=(\d) loss=([\d.eE+-]+) fc=([\d.eE+-]+)",
                      out)
        assert m, f"no RESULT line in:\n{out[-3000:]}"
        results[int(m.group(1))] = (float(m.group(2)), float(m.group(3)))
    return results


class TestTwoProcessDistributed:
    def test_both_processes_agree(self, two_process_result):
        assert set(two_process_result) == {0, 1}
        (l0, f0), (l1, f1) = two_process_result[0], two_process_result[1]
        assert abs(l0 - l1) < 1e-6
        assert abs(f0 - f1) < 1e-5

    def test_matches_single_process_step(self, two_process_result):
        """The 2-process global step equals the identical step on one
        process with 8 local devices (reduction-order tolerance)."""
        import jax
        import jax.numpy as jnp
        from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

        from speech_intent_recognizer_tpu.config.schema import Config
        from speech_intent_recognizer_tpu.models.cnn_gru import CNNAudioGRU
        from speech_intent_recognizer_tpu.train.loop import Trainer
        from speech_intent_recognizer_tpu.train.state import (
            create_optimizer, create_train_state)

        rng = np.random.default_rng(11)
        feats = jnp.asarray(rng.standard_normal(
            (N, 64, T_FRAMES)).astype(np.float32))
        labels = jnp.asarray(rng.integers(0, NUM_CLASSES, N).astype(np.int32))
        mesh = Mesh(np.array(jax.devices()[:8]).reshape(8), ("data",))
        cfg = Config.from_dict(dict(
            num_labels=NUM_CLASSES, epochs=1, batch_size=N, lr=1e-3,
            bf16=False, use_augmentation=False, use_mixup=False,
            mel_spec_length=T_FRAMES))
        model = CNNAudioGRU(num_classes=NUM_CLASSES)
        tx = create_optimizer(lr=1e-3, weight_decay=1e-4, grad_clip=1.0)
        state = create_train_state(model, jax.random.key(0), tx,
                                   input_shape=(1, 64, T_FRAMES))
        trainer = Trainer(model, cfg, mesh=mesh, tx=tx,
                          num_classes=NUM_CLASSES)
        epoch_fn = trainer._build_epoch_fn()
        perm = jnp.arange(N, dtype=jnp.int32).reshape(1, N)
        w = jnp.ones((1, N), jnp.float32)
        state, m = epoch_fn(state, feats, labels, perm, w, jax.random.key(2))
        loss = float(m["loss"])
        fc = float(np.abs(np.asarray(state.params["fc"]["kernel"])).sum())

        l0, f0 = two_process_result[0]
        assert abs(loss - l0) < 5e-5, (loss, l0)
        np.testing.assert_allclose(fc, f0, rtol=1e-5)
