"""CLI: synthetic sample generation.

Mirrors ``python -m scripts.generate_tts_samples`` (reference
``scripts/generate_tts_samples.py:72-89``) with a hermetic offline fallback
engine (see :mod:`speech_intent_recognizer_tpu.tts.generate`)."""

from __future__ import annotations

import argparse

from speech_intent_recognizer_tpu.cli.common import setup_logging
from speech_intent_recognizer_tpu.tts.generate import generate_audio_files


def main(argv=None):
    logger = setup_logging()
    p = argparse.ArgumentParser(description="Generate synthetic TTS samples")
    p.add_argument("--csv", required=True,
                   help="sentence sheet (transcription/action/object/label)")
    p.add_argument("--output_dir", default="tts_samples")
    p.add_argument("--accent", default="en",
                   choices=["en", "en-us", "en-uk", "en-au"])
    p.add_argument("--slow", action="store_true")
    p.add_argument("--engine", default="auto",
                   choices=["auto", "gtts", "pyttsx3", "synthetic"])
    args = p.parse_args(argv)
    details = generate_audio_files(args.csv, args.output_dir,
                                   engine=args.engine, accent=args.accent,
                                   slow=args.slow)
    logger.info("details written to %s", details)
    return details


if __name__ == "__main__":
    main()
