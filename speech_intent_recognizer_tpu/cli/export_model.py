"""CLI: export a trained checkpoint as a deployable serving artifact.

No reference analog — the reference serves by re-importing the training
code around ``best_model.pt`` (``scripts/test_model.py:1-40``).  Here the
artifact is the compiled program itself (portable StableHLO with a
symbolic batch dimension) plus weights and the label map; a serving host
runs it with JAX alone (``infer.export.ServingModel``).

    python -m speech_intent_recognizer_tpu.cli.export_model \
        --model checkpoints/best_model.msgpack \
        --label_map data/label_map.json --out serving_artifact/
"""

from __future__ import annotations

import argparse


def main(argv=None):
    from speech_intent_recognizer_tpu.cli.common import (
        add_config_arg, load_config_or_default, make_predictor,
        setup_logging)
    from speech_intent_recognizer_tpu.infer.export import export_predictor

    logger = setup_logging()
    p = argparse.ArgumentParser(
        description="Export a serving artifact (StableHLO + weights)")
    add_config_arg(p)
    p.add_argument("--model", required=True)
    p.add_argument("--label_map", required=True)
    p.add_argument("--out", required=True, help="artifact directory")
    p.add_argument("--model_type", default="cnn_gru",
                   choices=["cnn_gru", "wav2vec"])
    p.add_argument("--platforms", nargs="*", default=None,
                   help="lowering platforms (default: current backend + cpu)")
    p.add_argument("--flavor", default="portable",
                   choices=["portable", "production"],
                   help="portable: XLA path, symbolic batch, any platform; "
                        "production: the TPU Pallas fast path, one program "
                        "per --batch_sizes entry (TPU-only)")
    p.add_argument("--batch_sizes", nargs="*", type=int,
                   default=[8, 256, 2048],
                   help="pinned batch sizes for --flavor production")
    args = p.parse_args(argv)
    cfg = load_config_or_default(args.config)
    predictor = make_predictor(args.model, args.label_map, cfg,
                               model_type=args.model_type)
    out = export_predictor(predictor, args.out, platforms=args.platforms,
                           flavor=args.flavor,
                           batch_sizes=tuple(args.batch_sizes))
    logger.info("serving artifact written to %s", out)
    return 0


if __name__ == "__main__":
    main()
