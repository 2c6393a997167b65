"""CLI: train the intent classifier.

Mirrors ``python -m scripts.train`` (reference ``scripts/train.py:304-336``):
``--config --train_csv --val_csv --label_map`` with config fallbacks — plus
TPU-native extras: ``--resume`` (full-state Orbax resume, absent in the
reference) and mesh configuration from the config's ``parallel`` section.
"""

from __future__ import annotations

import argparse
import json
import os

import jax

from speech_intent_recognizer_tpu.cli.common import (
    add_config_arg, load_config_or_default, setup_logging)
from speech_intent_recognizer_tpu.data.labelmap import load_label_map
from speech_intent_recognizer_tpu.data.pipeline import (
    build_dataset, build_waveform_dataset)
from speech_intent_recognizer_tpu.models.cnn_gru import CNNAudioGRU
from speech_intent_recognizer_tpu.parallel.distributed import (
    initialize_distributed)
from speech_intent_recognizer_tpu.parallel.mesh import create_mesh
from speech_intent_recognizer_tpu.parallel.sharding import place_params
from speech_intent_recognizer_tpu.train.checkpoint import Checkpointer
from speech_intent_recognizer_tpu.train.loop import Trainer
from speech_intent_recognizer_tpu.train.state import (
    create_train_state, optimizer_from_config)


def train_from_config(cfg, train_csv=None, val_csv=None, label_map_path=None,
                      resume=False, logger=None):
    import jax.numpy as jnp
    import logging

    logger = logger or logging.getLogger("sir_tpu")
    initialize_distributed(cfg.parallel.coordinator_address,
                           cfg.parallel.num_processes,
                           cfg.parallel.process_id)
    mesh = create_mesh(cfg.parallel.data_axis, cfg.parallel.model_axis)
    logger.info("devices: %d, mesh: %s", len(jax.devices()),
                dict(mesh.shape))

    train_csv = train_csv or cfg.data.train_csv
    val_csv = val_csv or cfg.data.valid_csv
    label_map_path = label_map_path or cfg.data.label_map_path
    label_map = load_label_map(label_map_path)
    num_classes = max(cfg.model.num_labels, len(label_map))

    from_waveforms = cfg.data.train_on_waveforms
    build = build_waveform_dataset if from_waveforms else build_dataset
    train_ds = build(train_csv, label_map, cfg, mesh)
    val_ds = build(val_csv, label_map, cfg, mesh)
    logger.info("datasets loaded - train: %d, val: %d%s",
                train_ds.num_items, val_ds.num_items,
                " (waveform-resident)" if from_waveforms else "")

    compute_dtype = jnp.bfloat16 if cfg.train.bf16 else jnp.float32
    model = CNNAudioGRU(
        num_classes=num_classes,
        conv_channels=cfg.model.conv_channels,
        gru_hidden=cfg.model.gru_hidden,
        gru_layers=cfg.model.gru_layers,
        dropout=cfg.model.dropout,
        compute_dtype=compute_dtype,
    )
    tx = optimizer_from_config(cfg, train_ds.num_items)
    state = create_train_state(
        model, jax.random.key(cfg.train.seed), tx,
        input_shape=(1, cfg.audio.n_mels, cfg.audio.mel_spec_length))
    state = state.replace(
        params=place_params(mesh, state.params),
        batch_stats=place_params(mesh, state.batch_stats))

    meta = {"num_classes": num_classes, "model": cfg.model.name,
            "label_map": label_map_path,
            "audio": {"sample_rate": cfg.audio.sample_rate,
                      "n_mels": cfg.audio.n_mels,
                      "mel_spec_length": cfg.audio.mel_spec_length}}
    ckpt = Checkpointer(cfg.train.save_path, model_meta=meta,
                        keep=cfg.train.keep_checkpoints)

    start_epoch, best_val_acc, no_improve = 0, 0.0, 0
    if resume or cfg.train.resume:
        restored = ckpt.restore_state(state)
        if restored is not None:
            state, book = restored
            start_epoch = book["epoch"]
            best_val_acc = book["best_val_acc"]
            no_improve = book["no_improve"]

    trainer = Trainer(model, cfg, mesh=mesh, tx=tx, num_classes=num_classes,
                      from_waveforms=from_waveforms)
    state, result = trainer.fit(
        state, train_ds.features, train_ds.labels,
        val_ds.features, val_ds.labels,
        checkpointer=ckpt, start_epoch=start_epoch,
        best_val_acc=best_val_acc, no_improve=no_improve,
        log=logger.info,
        train_lengths=train_ds.lengths, val_lengths=val_ds.lengths)

    history_path = os.path.join(cfg.train.save_path, "training_history.json")
    os.makedirs(cfg.train.save_path, exist_ok=True)
    with open(history_path, "w") as f:
        json.dump({"best_val_acc": result.best_val_acc,
                   "epochs_run": result.epochs_run,
                   "stopped_early": result.stopped_early,
                   "history": result.history}, f, indent=2)
    return state, result


def main(argv=None):
    logger = setup_logging()
    p = argparse.ArgumentParser(description="Train intent recognition model")
    add_config_arg(p)
    p.add_argument("--train_csv", default=None)
    p.add_argument("--val_csv", default=None)
    p.add_argument("--label_map", default="data/processed/label_map.json")
    p.add_argument("--resume", action="store_true",
                   help="resume from the latest full-state checkpoint")
    args = p.parse_args(argv)
    cfg = load_config_or_default(args.config)
    _state, result = train_from_config(
        cfg, args.train_csv, args.val_csv, args.label_map,
        resume=args.resume, logger=logger)
    logger.info("training completed; best validation accuracy: %.4f",
                result.best_val_acc)
    return result


if __name__ == "__main__":
    main()
