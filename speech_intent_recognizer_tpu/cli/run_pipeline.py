"""CLI: full pipeline orchestrator — preprocess -> precompute -> train ->
evaluate.

Counterpart of the reference's ``run_pipeline.py`` (same 4 stages, same
``--config_path`` / ``--force_precompute`` flags, same data-path fallback
search — ``run_pipeline.py:39-238``) with one architectural change: stages
run **in-process** as library calls instead of subprocesses.  The reference's
process boundaries were CUDA memory-hygiene workarounds; on TPU a single
process keeps the compiled programs and the device-resident feature cache
alive across stages, so train starts microseconds after precompute ends.
"""

from __future__ import annotations

import argparse
import os
import time

from speech_intent_recognizer_tpu.cli.common import setup_logging
from speech_intent_recognizer_tpu.config import load_config
from speech_intent_recognizer_tpu.data import cache as cache_mod
from speech_intent_recognizer_tpu.data.preprocess import preprocess_dataset

_FALLBACK_ROOTS = ("data/processed/{name}_data.csv",
                   "data/FSC/fluent_speech_commands_dataset/data/"
                   "{name}_data.csv",
                   "data/{name}_data.csv")


def _resolve_split(configured: str, name: str, logger) -> str:
    if os.path.exists(configured):
        return configured
    for pattern in _FALLBACK_ROOTS:
        candidate = pattern.format(name=name)
        if os.path.exists(candidate):
            logger.info("using alternative %s data path: %s", name, candidate)
            return candidate
    return configured


def run_pipeline(config_path: str, force_precompute: bool = False,
                 validate_audio: bool = True,
                 stage_times: dict | None = None) -> bool:
    """Run preprocess -> precompute -> train -> evaluate.

    ``stage_times`` (optional) is filled with per-stage wall-clock seconds
    — the observability hook used by ``bench_pipeline_scale.py`` to time
    the reference's hot loops (``run_pipeline.py:39-211``) at FSC scale.
    """
    if stage_times is None:
        stage_times = {}
    logger = setup_logging()
    logger.info("=== Starting Speech Intent Recognition Pipeline (TPU) ===")
    try:  # device + memory report (reference run_pipeline.py:45-50 analog)
        import jax

        from speech_intent_recognizer_tpu.utils.profiling import (
            device_memory_stats)

        logger.info("backend %s, %d device(s)", jax.default_backend(),
                    len(jax.devices()))
        for name, s in device_memory_stats().items():
            logger.info("%s: %.0fMB used / %.0fMB", name,
                        s["bytes_in_use"] / 2**20, s["bytes_limit"] / 2**20)
    except Exception:
        pass
    cfg = load_config(config_path)
    if force_precompute:
        cfg.data.force_precompute = True

    train_csv = _resolve_split(cfg.data.train_csv, "train", logger)
    valid_csv = _resolve_split(cfg.data.valid_csv, "valid", logger)
    test_csv = _resolve_split(cfg.data.test_csv, "test", logger)
    missing = [p for p in (train_csv, valid_csv, test_csv)
               if not os.path.exists(p)]
    if missing:
        logger.error("could not find required data files: %s", missing)
        return False

    # STEP 1: preprocess (validate + label map)
    logger.info("=== STEP 1: DATA PREPROCESSING ===")
    t_stage = time.perf_counter()
    processed = preprocess_dataset(
        train_csv, valid_csv, test_csv, cfg.data.output_dir,
        label_map_path=cfg.data.label_map_path, validate=validate_audio)
    train_csv = processed["train_csv"]
    valid_csv = processed["valid_csv"]
    test_csv = processed["test_csv"]
    label_map_path = processed["label_map"]
    stage_times["preprocess"] = time.perf_counter() - t_stage

    # STEP 2: precompute features (device batched); build_dataset inside
    # train/evaluate handles cache hits, so this stage only forces misses.
    t_stage = time.perf_counter()
    if cfg.data.use_feature_cache and cfg.data.train_on_waveforms:
        # Waveform-resident mode: train/valid need only the int16 waveform
        # cache (host decode + one disk copy — no device round trip at
        # all; featurization happens INSIDE the jitted train step).  The
        # test split still gets a feature cache for the evaluate stage.
        logger.info("=== STEP 2: PRECOMPUTING WAVEFORM CACHE "
                    "(train/valid) + TEST FEATURES ===")
        from speech_intent_recognizer_tpu.data.labelmap import (
            load_label_map)
        from speech_intent_recognizer_tpu.data.manifest import read_manifest

        label_map = load_label_map(label_map_path)
        for csvp in (train_csv, valid_csv):
            wf_cache = cache_mod.waveform_cache_path_for(
                csvp, cfg.data.cache_dir)
            if cfg.data.force_precompute or not os.path.exists(wf_cache):
                manifest = read_manifest(csvp)
                waves, lengths, labels, _ok, paths = (
                    cache_mod.precompute_waveforms(
                        manifest, label_map, cfg.audio, progress=False))
                cache_mod.save_waveform_cache(
                    wf_cache, waves, lengths, labels, paths, label_map,
                    cfg.audio)
        test_cache = cache_mod.cache_path_for(test_csv, cfg.data.cache_dir)
        if cfg.data.force_precompute or not os.path.exists(test_cache):
            manifest = read_manifest(test_csv)
            feats, labels, _ok, paths = cache_mod.precompute_features(
                manifest, label_map, cfg.audio,
                batch_size=cfg.data.precompute_batch_size, progress=False,
                wire_dtype=cfg.data.precompute_wire_dtype,
                fetch_dtype=cfg.data.precompute_fetch_dtype)
            cache_mod.save_cache(test_cache, feats, labels, paths,
                                 label_map, cfg.audio)
        cfg.data.force_precompute = False
    elif cfg.data.use_feature_cache:
        logger.info("=== STEP 2: PRECOMPUTING FEATURES ===")
        train_cache = cache_mod.cache_path_for(train_csv, cfg.data.cache_dir)
        if cfg.data.force_precompute or not os.path.exists(train_cache):
            try:
                from speech_intent_recognizer_tpu.cli.precompute_features \
                    import main as precompute_main

                precompute_main([
                    "--train_csv", train_csv, "--valid_csv", valid_csv,
                    "--test_csv", test_csv,
                    "--output_dir", cfg.data.cache_dir,
                    "--label_map", label_map_path,
                    "--config", config_path])
            except Exception as e:
                logger.warning("feature precomputation failed (%s); "
                               "continuing with on-the-fly extraction", e)
                cfg.data.use_feature_cache = False
            else:
                # the flag means "rebuild the cache once", not "never use
                # it": clear it so the train/evaluate stages hit the
                # caches this stage just built instead of re-featurizing
                # the corpus two more times
                cfg.data.force_precompute = False
        else:
            logger.info("using existing cached features in %s",
                        cfg.data.cache_dir)

    stage_times["precompute"] = time.perf_counter() - t_stage

    # STEP 3: train
    logger.info("=== STEP 3: TRAINING MODEL ===")
    t_stage = time.perf_counter()
    from speech_intent_recognizer_tpu.cli.train import train_from_config

    try:
        _state, result = train_from_config(cfg, train_csv, valid_csv,
                                           label_map_path, logger=logger)
    except Exception:
        logger.exception("training failed; stopping pipeline")
        return False

    stage_times["train"] = time.perf_counter() - t_stage

    # STEP 4: evaluate
    logger.info("=== STEP 4: EVALUATING MODEL ===")
    t_stage = time.perf_counter()
    model_path = os.path.join(cfg.train.save_path, "best_model.msgpack")
    if not os.path.exists(model_path):
        logger.error("model file not found: %s", model_path)
        return False
    from speech_intent_recognizer_tpu.cli.evaluate import evaluate_from_config

    try:
        evaluate_from_config(cfg, test_csv, label_map_path, model_path,
                             logger=logger)
    except Exception:
        logger.exception("evaluation failed; stopping pipeline")
        return False
    stage_times["evaluate"] = time.perf_counter() - t_stage

    logger.info("stage wall-clock: %s",
                "  ".join(f"{k}={v:.1f}s" for k, v in stage_times.items()))
    logger.info("=== Pipeline Completed Successfully ===")
    return True


def main(argv=None):
    p = argparse.ArgumentParser(
        description="Run the full speech intent recognition pipeline")
    p.add_argument("--config_path", default="configs/config.yaml")
    p.add_argument("--force_precompute", action="store_true")
    p.add_argument("--no_validate", action="store_true",
                   help="skip per-file audio validation in preprocessing")
    args = p.parse_args(argv)
    ok = run_pipeline(args.config_path, args.force_precompute,
                      validate_audio=not args.no_validate)
    raise SystemExit(0 if ok else 1)


if __name__ == "__main__":
    main()
