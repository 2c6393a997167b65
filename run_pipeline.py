#!/usr/bin/env python
"""Top-level pipeline entry point.

Same CLI surface as the reference's ``run_pipeline.py``
(``--config_path``, ``--force_precompute``); delegates to
``speech_intent_recognizer_tpu.cli.run_pipeline``.
"""

from speech_intent_recognizer_tpu.cli.run_pipeline import main

if __name__ == "__main__":
    main()
