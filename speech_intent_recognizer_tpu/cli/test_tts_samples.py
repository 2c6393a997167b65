"""CLI: TTS-holdout evaluation with plots.

Mirrors ``python -m scripts.test_tts_samples`` of the reference: evaluates a
directory of synthetic utterances against ``details.csv`` and writes
detailed_results.csv / classification_report.csv / plot PNGs."""

from __future__ import annotations

import argparse

from speech_intent_recognizer_tpu.cli.common import (
    add_config_arg, load_config_or_default, make_predictor, setup_logging)
from speech_intent_recognizer_tpu.evaluation.tts_holdout import (
    evaluate_tts_directory)


def main(argv=None):
    logger = setup_logging()
    p = argparse.ArgumentParser(description="Evaluate on TTS holdout corpus")
    add_config_arg(p, default=None)
    p.add_argument("--model", default="checkpoints/best_model.msgpack")
    p.add_argument("--label_map", default="data/processed/label_map.json")
    p.add_argument("--audio_dir", required=True)
    p.add_argument("--details_csv", default=None)
    p.add_argument("--report_dir", default="checkpoints/tts_test_results")
    args = p.parse_args(argv)

    cfg = load_config_or_default(args.config)
    predictor = make_predictor(args.model, args.label_map, cfg)
    result = evaluate_tts_directory(predictor, args.audio_dir,
                                    args.details_csv, args.report_dir)
    logger.info("TTS holdout accuracy: %.4f", result["accuracy"])
    return result


if __name__ == "__main__":
    main()
