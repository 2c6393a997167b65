"""CLI: fine-tune the wav2vec raw-waveform intent model.

Mirrors the reference's bytecode-only ``python -m scripts.train_wav2vec``
(defaults batch 8, epochs 20, ``facebook/wav2vec2-base``, optional
``--freeze_feature_extractor``)."""

from __future__ import annotations

import argparse
import os

import jax

from speech_intent_recognizer_tpu.cli.common import (
    add_config_arg, load_config_or_default, setup_logging)
from speech_intent_recognizer_tpu.data.labelmap import load_label_map
from speech_intent_recognizer_tpu.data.manifest import read_manifest
from speech_intent_recognizer_tpu.models.wav2vec import (
    create_wav2vec_intent, feature_extractor_mask, init_wav2vec)
from speech_intent_recognizer_tpu.train.checkpoint import save_model
from speech_intent_recognizer_tpu.train.wav2vec_trainer import (
    Wav2VecTrainer, create_wav2vec_optimizer)


def main(argv=None):
    logger = setup_logging()
    p = argparse.ArgumentParser(description="Fine-tune wav2vec intent model")
    add_config_arg(p)
    p.add_argument("--train_csv", required=True)
    p.add_argument("--val_csv", required=True)
    p.add_argument("--label_map", required=True)
    p.add_argument("--model_name", default="facebook/wav2vec2-base")
    p.add_argument("--small", action="store_true",
                   help="use the built-in small config (no download)")
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--epochs", type=int, default=20)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--freeze_feature_extractor", action="store_true",
                   default=True)
    p.add_argument("--no_freeze", dest="freeze_feature_extractor",
                   action="store_false")
    p.add_argument("--warmup_steps", type=int, default=0,
                   help=">0 switches to the TPU-native large-batch recipe: "
                   "linear warmup to --lr then cosine decay "
                   "(configs/wav2vec_large_batch.yaml)")
    args = p.parse_args(argv)

    cfg = load_config_or_default(args.config)
    label_map = load_label_map(args.label_map)
    num_classes = max(len(label_map), cfg.model.num_labels)

    from speech_intent_recognizer_tpu.models.wav2vec import (
        small_wav2vec_config)

    model, pretrained = create_wav2vec_intent(
        num_classes,
        model_name=None if args.small else args.model_name,
        config=small_wav2vec_config() if args.small else None)
    max_length = cfg.audio.max_samples
    variables = init_wav2vec(model, jax.random.key(cfg.train.seed),
                             input_length=max_length,
                             pretrained_params=pretrained)
    params = variables["params"]

    freeze = (feature_extractor_mask(params)
              if args.freeze_feature_extractor else None)

    train_m = read_manifest(args.train_csv)
    val_m = read_manifest(args.val_csv)
    steps_per_epoch = max(len(train_m) // args.batch_size, 1)
    tx = create_wav2vec_optimizer(lr=args.lr,
                                  grad_clip=cfg.train.grad_clip,
                                  freeze_mask=freeze,
                                  warmup_steps=args.warmup_steps,
                                  decay_steps=steps_per_epoch * args.epochs)
    to_ids = lambda m: [label_map.get(l, 0) for l in m.labels]  # noqa: E731

    trainer = Wav2VecTrainer(model, tx, num_classes,
                             max_length=max_length,
                             sample_rate=cfg.audio.sample_rate)
    from speech_intent_recognizer_tpu.train.checkpoint import Checkpointer
    ckpt = Checkpointer(
        os.path.join(cfg.train.save_path, "wav2vec_state"),
        model_meta={"num_classes": num_classes, "model": "wav2vec"})
    params, result = trainer.fit(
        params, train_m.paths, to_ids(train_m), val_m.paths, to_ids(val_m),
        epochs=args.epochs, batch_size=args.batch_size,
        seed=cfg.train.seed, early_stop_patience=cfg.train.early_stop_patience,
        checkpointer=ckpt, log=logger.info)

    out = os.path.join(cfg.train.save_path, "wav2vec_intent.msgpack")
    save_model(out, {"params": result["best_params"] or
                     jax.device_get(params)},
               meta={"num_classes": num_classes, "model": "wav2vec",
                     "val_acc": result["best_val_acc"],
                     "wav2vec_config": model.config.to_dict()})
    logger.info("saved %s (best val acc %.4f)", out, result["best_val_acc"])
    return result


if __name__ == "__main__":
    main()
