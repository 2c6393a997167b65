"""CLI: evaluate a trained model on the test split.

Mirrors ``python -m scripts.evaluate`` (reference
``scripts/evaluate.py:119-128``): ``--config --test_csv --label_map
--model_path``; accepts both native ``.msgpack`` checkpoints and reference
``.pt`` state dicts (converted on the fly)."""

from __future__ import annotations

import argparse
import os

import numpy as np

from speech_intent_recognizer_tpu.cli.common import (
    add_config_arg, load_config_or_default, setup_logging)
from speech_intent_recognizer_tpu.data.labelmap import load_label_map
from speech_intent_recognizer_tpu.data.pipeline import build_dataset
from speech_intent_recognizer_tpu.evaluation.evaluate import evaluate_dataset
from speech_intent_recognizer_tpu.models.cnn_gru import CNNAudioGRU
from speech_intent_recognizer_tpu.train.checkpoint import (
    load_model_checkpoint)


def evaluate_from_config(cfg, test_csv, label_map_path, model_path,
                         results_dir=None, logger=None,
                         model_type="cnn_gru", data_parallel=False):
    import logging

    logger = logger or logging.getLogger("sir_tpu")
    mesh = None
    if data_parallel:
        from speech_intent_recognizer_tpu.parallel.mesh import create_mesh

        mesh = create_mesh(cfg.parallel.data_axis, cfg.parallel.model_axis)
        logger.info("data-parallel evaluation over mesh %s",
                    dict(mesh.shape))
    if model_type == "wav2vec":
        from speech_intent_recognizer_tpu.data.manifest import read_manifest
        from speech_intent_recognizer_tpu.evaluation.evaluate import (
            evaluate_manifest_with_predictor)
        from speech_intent_recognizer_tpu.infer.predict import (
            Wav2VecPredictor)

        predictor = Wav2VecPredictor.from_checkpoint(
            model_path, label_map_path, audio_cfg=cfg.audio, mesh=mesh)
        manifest = read_manifest(test_csv)
        results_dir = results_dir or os.path.join(
            cfg.train.save_path, "evaluation_results_wav2vec")
        result = evaluate_manifest_with_predictor(predictor, manifest,
                                                  results_dir)
        logger.info("wav2vec test accuracy: %.4f", result["accuracy"])
        return result
    label_map = load_label_map(label_map_path)
    variables = load_model_checkpoint(model_path)
    fc_kernel = np.asarray(variables["params"]["fc"]["kernel"])
    num_classes = int(fc_kernel.shape[-1])  # from the checkpoint head, not
    # hardcoded (the reference pins 31 at evaluate.py:44-45)
    model = CNNAudioGRU(num_classes=num_classes)
    variables = {"params": variables["params"],
                 "batch_stats": variables.get("batch_stats", {})}

    test_ds = build_dataset(test_csv, label_map, cfg)
    results_dir = results_dir or os.path.join(cfg.train.save_path,
                                              "evaluation_results")
    result = evaluate_dataset(
        model, variables, test_ds.features, test_ds.labels, label_map,
        results_dir=results_dir,
        batch_size=cfg.train.batch_size * cfg.train.eval_batch_multiplier,
        mesh=mesh)
    logger.info("test accuracy: %.4f", result["accuracy"])
    return result


def main(argv=None):
    logger = setup_logging()
    p = argparse.ArgumentParser(
        description="Evaluate speech intent recognition model")
    add_config_arg(p)
    p.add_argument("--test_csv", required=True)
    p.add_argument("--label_map", required=True)
    p.add_argument("--model_path", required=True)
    p.add_argument("--results_dir", default=None)
    p.add_argument("--model_type", default="cnn_gru",
                   choices=["cnn_gru", "wav2vec"])
    p.add_argument("--data_parallel", action="store_true",
                   help="shard evaluation batches over the config's "
                        "(data, model) mesh")
    args = p.parse_args(argv)
    cfg = load_config_or_default(args.config)
    return evaluate_from_config(cfg, args.test_csv, args.label_map,
                                args.model_path, args.results_dir, logger,
                                model_type=args.model_type,
                                data_parallel=args.data_parallel)


if __name__ == "__main__":
    main()
