"""CLI surface tests: argument wiring, reference-flag compatibility, and the
wav2vec CLI smoke run on a tiny config."""

import csv
import json
import os

import numpy as np
import pytest


def _mini_corpus(tmp_path, reference_mic_dir, n=8):
    """Small manifest over real corpus files."""
    rows = []
    with open(os.path.join(reference_mic_dir, "details.csv"), newline="") as f:
        for row in csv.DictReader(f):
            rows.append((os.path.join(reference_mic_dir, row["filename"]),
                         row["class"]))
    rows = rows[:n]
    p = tmp_path / "mini.csv"
    with open(p, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["path", "label"])
        w.writerows(rows)
    labels = sorted({r[1] for r in rows})
    lm = {l: i for i, l in enumerate(labels)}
    lm_path = tmp_path / "lm.json"
    lm_path.write_text(json.dumps(lm))
    return str(p), str(lm_path), lm


class TestPreprocessCLI:
    def test_runs(self, tmp_path, reference_mic_dir):
        from speech_intent_recognizer_tpu.cli.preprocess import main

        csv_path, _, _ = _mini_corpus(tmp_path, reference_mic_dir)
        out = main(["--train_csv", csv_path, "--valid_csv", csv_path,
                    "--test_csv", csv_path,
                    "--output_dir", str(tmp_path / "out")])
        assert os.path.exists(out["train_csv"])
        assert os.path.exists(out["label_map"])


class TestGenerateTTSCLI:
    def test_synthetic_engine(self, tmp_path):
        from speech_intent_recognizer_tpu.cli.generate_tts_samples import main

        sheet = tmp_path / "sentences.csv"
        sheet.write_text(
            "transcription,action,object,location,label\n"
            "turn on the lights,activate,lights,none,activate_lights\n"
            "play some music,activate,music,none,activate_music\n")
        details = main(["--csv", str(sheet),
                        "--output_dir", str(tmp_path / "tts"),
                        "--engine", "synthetic"])
        assert os.path.exists(details)
        wavs = [f for f in os.listdir(tmp_path / "tts") if f.endswith(".wav")]
        assert len(wavs) == 2
        # generated corpus is decodable by the normal pipeline
        from speech_intent_recognizer_tpu.data.audio_io import load_audio

        x, rate = load_audio(os.path.join(tmp_path / "tts", wavs[0]))
        assert rate == 16000 and len(x) > 1000


class TestStreamCLI:
    def test_file_replay(self, tmp_path, reference_mic_dir):
        """Full streaming stack through the CLI on a replayed file."""
        import jax

        from speech_intent_recognizer_tpu.cli.stream import main
        from speech_intent_recognizer_tpu.models.cnn_gru import (
            CNNAudioGRU, init_model)
        from speech_intent_recognizer_tpu.train.checkpoint import save_model

        _, lm_path, lm = _mini_corpus(tmp_path, reference_mic_dir)
        model = CNNAudioGRU(num_classes=len(lm))
        variables = init_model(model, jax.random.key(0))
        ckpt = str(tmp_path / "m.msgpack")
        save_model(ckpt, {"params": variables["params"],
                          "batch_stats": variables["batch_stats"]})
        audio = os.path.join(reference_mic_dir,
                             "005_i need the newspaper.wav")
        results = main(["--model", ckpt, "--label_map", lm_path,
                        "--audio", audio, "--threshold", "0.005"])
        assert len(results) >= 1
        assert results[0]["predicted_label"] in lm


class TestTrainResumeCLI:
    @pytest.mark.slow
    def test_resume_continues_from_checkpoint(self, tmp_path,
                                              reference_mic_dir):
        """Train 2 epochs, then resume: the second run must start at epoch 3
        (full-state restore — optimizer moments, early-stop bookkeeping)."""
        from speech_intent_recognizer_tpu.cli.train import train_from_config
        from speech_intent_recognizer_tpu.config.schema import Config

        csv_path, lm_path, lm = _mini_corpus(tmp_path, reference_mic_dir,
                                             n=8)
        def cfg(epochs):
            return Config.from_dict({
                "num_labels": len(lm), "epochs": epochs, "batch_size": 4,
                "lr": 1e-3, "bf16": False, "augment_prob": 0.0,
                "cache_dir": str(tmp_path / "cache"),
                "save_path": str(tmp_path / "ckpt"), "seed": 0,
            })

        _, r1 = train_from_config(cfg(2), csv_path, csv_path, lm_path)
        assert r1.epochs_run == 2
        _, r2 = train_from_config(cfg(4), csv_path, csv_path, lm_path,
                                  resume=True)
        assert r2.epochs_run == 4
        assert r2.history[0]["epoch"] == 3  # continued, not restarted


class TestWav2VecCLI:
    def test_small_smoke(self, tmp_path, reference_mic_dir):
        pytest.importorskip("transformers")
        from speech_intent_recognizer_tpu.cli.train_wav2vec import main
        from speech_intent_recognizer_tpu.config.loader import save_config
        from speech_intent_recognizer_tpu.config.schema import Config

        csv_path, lm_path, lm = _mini_corpus(tmp_path, reference_mic_dir, n=6)
        cfg = Config.from_dict({
            "num_labels": len(lm), "epochs": 1, "batch_size": 2,
            "max_duration": 1.0,  # 16k samples keeps the CPU compile small
            "save_path": str(tmp_path / "ckpt"),
        })
        cfg_path = str(tmp_path / "cfg.json")
        save_config(cfg, cfg_path)
        result = main(["--config", cfg_path, "--train_csv", csv_path,
                       "--val_csv", csv_path, "--label_map", lm_path,
                       "--small", "--epochs", "1", "--batch_size", "2"])
        assert len(result["history"]) == 1
        ckpt = tmp_path / "ckpt" / "wav2vec_intent.msgpack"
        assert os.path.exists(ckpt)
        assert np.isfinite(result["history"][0]["train_loss"])

        # the saved checkpoint round-trips through the wav2vec predictor
        from speech_intent_recognizer_tpu.config.schema import AudioConfig
        from speech_intent_recognizer_tpu.infer.predict import (
            Wav2VecPredictor)

        pred = Wav2VecPredictor.from_checkpoint(
            str(ckpt), lm_path, audio_cfg=AudioConfig(max_duration=1.0))
        with open(csv_path) as f:
            first_audio = f.read().splitlines()[1].split(",")[0]
        r = pred.predict_file(first_audio)
        assert r is not None and r["predicted_label"] in lm

        # manifest evaluation through the wav2vec path
        from speech_intent_recognizer_tpu.cli.evaluate import (
            evaluate_from_config)
        from speech_intent_recognizer_tpu.config.loader import load_config

        result = evaluate_from_config(
            load_config(cfg_path), csv_path, lm_path, str(ckpt),
            results_dir=str(tmp_path / "w2v_eval"), model_type="wav2vec")
        assert 0.0 <= result["accuracy"] <= 1.0
        assert os.path.exists(tmp_path / "w2v_eval"
                              / "classification_report.txt")
