#!/usr/bin/env python
"""Export + verify a production-flavor serving artifact on TPU.

The production flavor serializes the predictor's real TPU path — the
fused frontend+conv1 Pallas kernel, bf16 conv1-external variant model and
Pallas GRU — one program per pinned batch size (see ``infer/export.py``).
This script exports an artifact, reloads it, and asserts probability
parity against the live fused Predictor.

    python examples/export_production.py --smoke          # random init, b8
    python examples/export_production.py \
        --model ckpt/best_model.msgpack --label_map label_map.json \
        --out artifact/ --batch_sizes 8 256 2048

Exits 3 when no TPU is reachable (suite-skip contract).
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--smoke", action="store_true",
                    help="random-init model, batch 8, temp dir")
    ap.add_argument("--model", default=None)
    ap.add_argument("--label_map", default=None)
    ap.add_argument("--out", default=None)
    ap.add_argument("--batch_sizes", nargs="*", type=int,
                    default=[8, 256, 2048])
    args = ap.parse_args(argv)

    from speech_intent_recognizer_tpu.utils.platform import (
        configure_jax, wait_for_backend)

    budget = float(os.environ.get("SIR_BACKEND_WAIT_S", "240"))
    if not wait_for_backend(max_wait_s=budget):
        print("accelerator backend unavailable", file=sys.stderr)
        return 3
    configure_jax()
    import jax

    if jax.default_backend() != "tpu":
        print("production flavor requires a TPU backend", file=sys.stderr)
        return 3

    from speech_intent_recognizer_tpu.config.schema import AudioConfig
    from speech_intent_recognizer_tpu.infer.export import (
        ServingModel, export_predictor)
    from speech_intent_recognizer_tpu.infer.predict import Predictor

    audio_cfg = AudioConfig()
    if args.smoke:
        import tempfile

        from speech_intent_recognizer_tpu.models.cnn_gru import (
            CNNAudioGRU, fold_batchnorm, init_model)

        raw = init_model(CNNAudioGRU(num_classes=19), jax.random.key(0))
        folded = fold_batchnorm(raw["params"], raw["batch_stats"])
        pred = Predictor(CNNAudioGRU(num_classes=19, fold_bn=True),
                         {"params": folded, "batch_stats": {}},
                         {f"c{i}": i for i in range(19)}, audio_cfg)
        pred._maybe_enable_conv1_fusion(folded)
        out = args.out or tempfile.mkdtemp(prefix="sir_prod_artifact_")
        batch_sizes = (8,)
    else:
        if not (args.model and args.label_map and args.out):
            ap.error("--model/--label_map/--out required without --smoke")
        pred = Predictor.from_checkpoint(args.model, args.label_map,
                                         audio_cfg)
        out = args.out
        batch_sizes = tuple(args.batch_sizes)

    if pred._conv1 is None:
        print("WARNING: conv1 fusion not enabled (Mosaic probe failed?); "
              "exporting the current fused body anyway", file=sys.stderr)

    t0 = time.time()
    export_predictor(pred, out, flavor="production",
                     batch_sizes=batch_sizes)
    print(f"production artifact ({sorted(batch_sizes)}) -> {out} "
          f"in {time.time() - t0:.1f}s")

    srv = ServingModel.load(out)
    rng = np.random.default_rng(0)
    b = min(batch_sizes) | 5  # off-size: exercises padding/routing
    wf = (rng.standard_normal((b, audio_cfg.max_samples)) * 0.1
          ).astype(np.float32)
    ln = rng.integers(16000, audio_cfg.max_samples, b).astype(np.int32)
    ref = pred.predict_waveform_batch(wf, ln)
    got = srv.predict_waveform_batch(wf, ln)
    err = float(np.abs(ref - got).max())
    argmax_ok = bool((np.argmax(ref, -1) == np.argmax(got, -1)).all())
    print(f"artifact-vs-live max prob err: {err:.5f} argmax_ok={argmax_ok}")
    if not (err < 2e-2 and argmax_ok):
        print("PARITY FAILED", file=sys.stderr)
        return 1
    print("OK")
    return 0


if __name__ == "__main__":
    sys.exit(main())
