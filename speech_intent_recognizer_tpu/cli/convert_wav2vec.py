"""Convert a pretrained wav2vec2 checkpoint into a Wav2VecIntent model file.

The reference fine-tunes ``facebook/wav2vec2-base``
(``requirements.txt:1``; ``models/__pycache__/model_wav2vec...pyc``).  This
environment has no network egress, so the supported input is a LOCAL
HuggingFace checkpoint — either a directory produced by
``save_pretrained`` or a model name already present in the local HF cache:

    python -m speech_intent_recognizer_tpu.cli.convert_wav2vec \
        --checkpoint /path/to/wav2vec2-base-dir --num_classes 31 \
        --output checkpoints/wav2vec_intent.msgpack

The output is a Flax msgpack with the converted backbone under
``params/wav2vec2`` plus a fresh attention/classifier head, and a sidecar
``.json`` carrying the backbone config — exactly what
``infer.predict.Wav2VecPredictor.from_checkpoint`` and
``train.wav2vec_trainer`` consume.
"""

from __future__ import annotations

import argparse
import logging

import jax

logger = logging.getLogger(__name__)


def convert(checkpoint: str, num_classes: int, output: str,
            seed: int = 0, input_length: int = 16000) -> dict:
    from speech_intent_recognizer_tpu.models.wav2vec import (
        create_wav2vec_intent, init_wav2vec)
    from speech_intent_recognizer_tpu.train.checkpoint import save_model

    model, pretrained = create_wav2vec_intent(num_classes,
                                              model_name=checkpoint)
    if pretrained is None:
        raise SystemExit(
            f"no loadable pretrained weights at {checkpoint!r} "
            "(expected a save_pretrained directory or a locally-cached "
            "model name)")
    variables = init_wav2vec(model, jax.random.key(seed),
                             input_length=input_length,
                             pretrained_params=pretrained)
    meta = {
        "num_classes": num_classes,
        "source_checkpoint": checkpoint,
        "wav2vec_config": model.config.to_dict(),
    }
    save_model(output, {"params": variables["params"]}, meta=meta)
    logger.info("wrote %s (backbone from %s, fresh %d-class head)",
                output, checkpoint, num_classes)
    return variables


def main(argv=None) -> int:
    logging.basicConfig(level=logging.INFO)
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--checkpoint", required=True,
                    help="save_pretrained dir or locally-cached model name")
    ap.add_argument("--num_classes", type=int, default=31)
    ap.add_argument("--output", required=True, help="output .msgpack path")
    ap.add_argument("--seed", type=int, default=0,
                    help="head-init RNG seed")
    args = ap.parse_args(argv)
    convert(args.checkpoint, args.num_classes, args.output, seed=args.seed)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
