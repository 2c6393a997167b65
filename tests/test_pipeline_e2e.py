"""End-to-end pipeline smoke test on the bundled 95-utterance gTTS corpus
(the reference's only in-repo E2E fixture, mic_recordings/ + details.csv):
preprocess -> device feature precompute -> train -> evaluate -> TTS-holdout
artifacts — the debug_config-style CPU run (SURVEY.md §4)."""

import csv
import json
import os

import numpy as np
import pytest

from speech_intent_recognizer_tpu.config import Config

pytestmark = pytest.mark.slow  # >2 min on the 1-core host


def _write_split_manifests(reference_mic_dir, tmp_path):
    """Split details.csv into train/valid/test CSVs with absolute paths."""
    rows = []
    with open(os.path.join(reference_mic_dir, "details.csv"), newline="") as f:
        for row in csv.DictReader(f):
            rows.append({
                "path": os.path.join(reference_mic_dir, row["filename"]),
                "label": row["class"],
            })
    rng = np.random.default_rng(0)
    order = rng.permutation(len(rows))
    n_test = max(len(rows) // 5, 1)
    n_valid = max(len(rows) // 5, 1)
    splits = {
        "test": [rows[i] for i in order[:n_test]],
        "valid": [rows[i] for i in order[n_test : n_test + n_valid]],
        "train": [rows[i] for i in order[n_test + n_valid :]],
    }
    paths = {}
    for name, split_rows in splits.items():
        p = tmp_path / f"{name}.csv"
        with open(p, "w", newline="") as f:
            w = csv.DictWriter(f, fieldnames=["path", "label"])
            w.writeheader()
            w.writerows(split_rows)
        paths[name] = str(p)
    return paths


@pytest.fixture(scope="module")
def workdir(tmp_path_factory):
    return tmp_path_factory.mktemp("e2e")


@pytest.fixture(scope="module")
def e2e_result(reference_mic_dir, workdir):
    """Run the full pipeline once; downstream tests inspect the artifacts."""
    from speech_intent_recognizer_tpu.cli.run_pipeline import run_pipeline
    from speech_intent_recognizer_tpu.config.loader import save_config

    manifests = _write_split_manifests(reference_mic_dir, workdir)
    cfg = Config.from_dict({
        "train_csv": manifests["train"],
        "valid_csv": manifests["valid"],
        "test_csv": manifests["test"],
        "label_map_path": str(workdir / "label_map.json"),
        "output_dir": str(workdir / "processed"),
        "cache_dir": str(workdir / "cache"),
        "save_path": str(workdir / "ckpt"),
        "num_labels": 19,
        "epochs": 5,
        "batch_size": 8,
        "lr": 0.003,
        "bf16": False,
        "augment_prob": 0.2,
        "precompute_batch_size": 32,
        "seed": 0,
    })
    cfg_path = str(workdir / "config.json")
    save_config(cfg, cfg_path)
    ok = run_pipeline(cfg_path, validate_audio=True)
    assert ok, "pipeline failed"
    return workdir


class TestPipeline:
    def test_preprocess_artifacts(self, e2e_result):
        w = e2e_result
        assert os.path.exists(w / "processed" / "train_data.csv")
        with open(w / "label_map.json") as f:
            lm = json.load(f)
        assert len(lm) == 19  # the corpus has 19 action_object classes
        assert "decrease_volume" in lm

    def test_feature_cache_written(self, e2e_result):
        w = e2e_result
        caches = [f for f in os.listdir(w / "cache") if f.endswith(".npz")]
        assert len(caches) == 3  # train/valid/test
        feats = np.load(w / "cache" / caches[0])["features"]
        assert feats.shape[1:] == (64, 200)
        assert np.isfinite(feats).all()

    def test_best_model_and_history(self, e2e_result):
        w = e2e_result
        assert os.path.exists(w / "ckpt" / "best_model.msgpack")
        with open(w / "ckpt" / "best_model.json") as f:
            meta = json.load(f)
        assert meta["num_classes"] == 19
        with open(w / "ckpt" / "training_history.json") as f:
            hist = json.load(f)
        assert len(hist["history"]) >= 1
        assert np.isfinite(hist["history"][0]["train_loss"])

    def test_evaluation_artifacts(self, e2e_result):
        w = e2e_result
        results = w / "ckpt" / "evaluation_results"
        report = (results / "classification_report.txt").read_text()
        assert report.startswith("Test Accuracy:")
        cm = np.load(results / "confusion_matrix.npy")
        assert cm.shape == (19, 19)
        assert cm.sum() == 19  # test split size (95 // 5)

    def test_tts_holdout_on_trained_model(self, e2e_result,
                                          reference_mic_dir):
        from speech_intent_recognizer_tpu.cli.test_tts_samples import main

        w = e2e_result
        report_dir = str(w / "tts_results")
        result = main([
            "--model", str(w / "ckpt" / "best_model.msgpack"),
            "--label_map", str(w / "label_map.json"),
            "--audio_dir", reference_mic_dir,
            "--report_dir", report_dir,
        ])
        assert os.path.exists(os.path.join(report_dir,
                                           "detailed_results.csv"))
        assert os.path.exists(os.path.join(report_dir,
                                           "classification_report.csv"))
        assert 0.0 <= result["accuracy"] <= 1.0
        assert len(result["rows"]) == 95

    def test_training_made_progress(self, e2e_result):
        """Catches silent training breakage via loss progress, not accuracy.

        The original bar here ("best checkpoint beats chance on its own
        train split") is unattainable under this debug recipe in EITHER
        framework: a torch control with the identical recipe (reference
        model + defaults, 5 epochs, batch 8, lr 3e-3, wd 1e-4, clip 1.0,
        dropout 0.5, these exact 57 cached features) scored best-ckpt
        train accuracies of 0.070/0.070/0.105/0.053 over 4 seeds — seed 3
        exactly chance (BENCH_NOTES.md "e2e beats-chance control").  The
        pre-d816716 pass was a lucky draw from the 3x-variance lecun init.
        What IS deterministic across both frameworks is loss progress:
        measured train-loss decrease over the 5 epochs was 0.79 (jax) and
        0.55-0.98 (torch, 4 seeds); a silently-broken step (dead grads,
        optimizer not applied) holds loss flat at ln(19)+dropout noise.
        """
        import json as _json

        from speech_intent_recognizer_tpu.cli.evaluate import (
            evaluate_from_config)
        from speech_intent_recognizer_tpu.config.loader import load_config

        w = e2e_result
        with open(w / "ckpt" / "training_history.json") as f:
            hist = _json.load(f)["history"]
        assert len(hist) == 5
        first, last = hist[0]["train_loss"], hist[-1]["train_loss"]
        assert last < first - 0.3, (
            f"train loss did not improve: {first:.3f} -> {last:.3f}")
        # exercise the eval CLI on the train split end-to-end
        cfg = load_config(str(w / "config.json"))
        r = evaluate_from_config(
            cfg, str(w / "processed" / "train_data.csv"),
            str(w / "label_map.json"),
            str(w / "ckpt" / "best_model.msgpack"),
            results_dir=str(w / "train_eval"))
        assert 0.0 <= r["accuracy"] <= 1.0
        assert len(r["predictions"]) == 57
