"""Config schema/loader tests, including loading the reference's own YAML."""

import pytest

from speech_intent_recognizer_tpu.config import Config, load_config
from speech_intent_recognizer_tpu.config.loader import _mini_yaml_load
from speech_intent_recognizer_tpu.config.schema import ConfigError


class TestSchema:
    def test_defaults_valid(self):
        cfg = Config.from_dict({})
        assert cfg.train.epochs == 15
        assert cfg.audio.n_fft == 1024
        assert cfg.audio.f_max == 8000.0

    def test_flat_reference_keys(self):
        cfg = Config.from_dict({
            "epochs": 3, "batch_size": 4, "lr": "0.001",
            "num_labels": 19, "sample_rate": 16000,
            "use_amp": True, "num_workers": 8, "gpu_id": 0,
        })
        assert cfg.train.epochs == 3
        assert cfg.train.lr == 0.001  # string coerced like the reference
        assert cfg.model.num_labels == 19
        assert "use_amp" in cfg.ignored_keys  # GPU key accepted, recorded

    def test_unknown_key_rejected(self):
        with pytest.raises(ConfigError):
            Config.from_dict({"eppochs": 3})

    def test_invalid_values_rejected(self):
        with pytest.raises(ConfigError):
            Config.from_dict({"epochs": 0})
        with pytest.raises(ConfigError):
            Config.from_dict({"augment_prob": 1.5})

    def test_loads_reference_config_unchanged(self):
        """The reference's own config.yaml must parse without edits."""
        import os

        path = "/root/reference/configs/config.yaml"
        if not os.path.exists(path):
            pytest.skip("reference not mounted")
        cfg = load_config(path)
        assert cfg.train.epochs == 15
        assert cfg.train.batch_size == 16
        assert cfg.train.lr == 5e-5
        assert cfg.audio.mel_spec_length == 200
        assert cfg.data.augment_prob == 0.7

    def test_loads_own_configs(self):
        cfg = load_config("configs/config.yaml")
        assert cfg.train.bf16 is True
        dbg = load_config("configs/debug_config.yaml")
        assert dbg.train.epochs == 2
        assert dbg.model.num_labels == 19


class TestMiniYaml:
    def test_flat_parse(self):
        raw = _mini_yaml_load(
            "a: 1\nb: hello  # comment\nc: 0.5\nd: true\ne: 'q'\n")
        assert raw == {"a": 1, "b": "hello", "c": 0.5, "d": True, "e": "q"}

    def test_nested_parse(self):
        raw = _mini_yaml_load("train:\n  epochs: 3\n  lr: 0.001\naudio:\n"
                              "  n_mels: 64\n")
        assert raw["train"]["epochs"] == 3
        assert raw["audio"]["n_mels"] == 64
