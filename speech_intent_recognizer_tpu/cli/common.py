"""Shared CLI plumbing: logging, config/flag merging, model loading."""

from __future__ import annotations

import argparse
import logging
import os
import sys
from typing import Optional

from speech_intent_recognizer_tpu.config import Config, load_config


def setup_logging(level=logging.INFO) -> logging.Logger:
    from speech_intent_recognizer_tpu.utils.platform import (
        configure_jax, ensure_live_platform)

    configure_jax()
    # During a tunnel outage backend init HANGS; pin CPU (with a warning)
    # rather than hanging every CLI at its first device computation.
    ensure_live_platform()
    logging.basicConfig(
        level=level,
        format="%(asctime)s - %(levelname)s - %(message)s",
        handlers=[logging.StreamHandler(sys.stdout)],
        force=True,
    )
    # third-party checkpoint/compile chatter stays at WARNING
    for noisy in ("orbax", "absl", "jax", "etils"):
        logging.getLogger(noisy).setLevel(logging.WARNING)
    return logging.getLogger("sir_tpu")


def load_config_or_default(path: Optional[str]) -> Config:
    if path and os.path.exists(path):
        return load_config(path)
    if path:
        raise FileNotFoundError(f"config not found: {path}")
    return Config.from_dict({})


def add_config_arg(parser: argparse.ArgumentParser,
                   default: str = "configs/config.yaml") -> None:
    parser.add_argument("--config", type=str, default=default,
                        help="path to YAML config")


def make_predictor(model_path: str, label_map_path: str, cfg: Config,
                   model_type: str = "cnn_gru"):
    from speech_intent_recognizer_tpu.infer.predict import (
        Predictor, Wav2VecPredictor)

    cls = Wav2VecPredictor if model_type == "wav2vec" else Predictor
    return cls.from_checkpoint(model_path, label_map_path,
                               audio_cfg=cfg.audio)
