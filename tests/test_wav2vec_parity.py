"""First-party wav2vec2 backbone: numerical parity vs torch transformers.

The reference's wav2vec path is built on ``facebook/wav2vec2-base``
(``models/__pycache__/model_wav2vec.cpython-313.pyc``) — the non-stable-LN,
group-feat-norm variant that transformers' own Flax port does NOT implement.
These tests pin our ``models/wav2vec_flax.py`` to the torch reference
implementation for BOTH variants, through the checkpoint converter
(``convert/wav2vec_import.py``), on random-init small configs (no downloads;
the full-size config differs only in widths/depths).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

transformers = pytest.importorskip("transformers")
torch = pytest.importorskip("torch")

from speech_intent_recognizer_tpu.convert.wav2vec_import import (  # noqa: E402
    convert_wav2vec_intent_state_dict, convert_wav2vec_state_dict)
from speech_intent_recognizer_tpu.models.wav2vec import (  # noqa: E402
    Wav2VecIntent, small_wav2vec_base_config, small_wav2vec_config)
from speech_intent_recognizer_tpu.models.wav2vec_flax import (  # noqa: E402
    Wav2Vec2Backbone, feat_extract_output_lengths)


def _torch_backbone(config):
    torch.manual_seed(0)
    model = transformers.Wav2Vec2Model(config)
    model.eval()
    return model


def _waveform(rng, shape):
    return (0.1 * rng.standard_normal(shape)).astype(np.float32)


@pytest.mark.parametrize("variant", ["base", "stable"])
def test_backbone_hidden_parity(variant, rng):
    config = (small_wav2vec_base_config(hidden_size=64, num_layers=2)
              if variant == "base"
              else small_wav2vec_config(hidden_size=64, num_layers=2))
    t_model = _torch_backbone(config)
    x = _waveform(rng, (2, 4000))
    with torch.no_grad():
        want = t_model(torch.from_numpy(x)).last_hidden_state.numpy()

    state = {k: v.detach().numpy() for k, v in t_model.state_dict().items()}
    params = convert_wav2vec_state_dict(state, config)
    model = Wav2Vec2Backbone(config)
    got = np.asarray(model.apply({"params": params}, jnp.asarray(x),
                                 deterministic=True))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_base_attention_mask_matches_torch(rng):
    """Padded batch through the base variant: masked positions must affect
    nothing — exactly as the torch implementation handles them."""
    config = small_wav2vec_base_config(hidden_size=64, num_layers=2)
    t_model = _torch_backbone(config)
    x = _waveform(rng, (2, 4000))
    x[1, 2500:] = 0.0
    mask = np.ones((2, 4000), np.int64)
    mask[1, 2500:] = 0
    with torch.no_grad():
        want = t_model(torch.from_numpy(x),
                       attention_mask=torch.from_numpy(mask)
                       ).last_hidden_state.numpy()

    state = {k: v.detach().numpy() for k, v in t_model.state_dict().items()}
    params = convert_wav2vec_state_dict(state, config)
    model = Wav2Vec2Backbone(config)
    got = np.asarray(model.apply(
        {"params": params}, jnp.asarray(x),
        attention_mask=jnp.asarray(mask.astype(np.int32)),
        deterministic=True))
    # compare valid positions of both samples (torch leaves padded-position
    # outputs implementation-defined)
    np.testing.assert_allclose(got[0], want[0], rtol=1e-4, atol=1e-4)
    # valid length of sample 1 in feature space
    n_valid = int(feat_extract_output_lengths(config, np.array([2500]))[0])
    np.testing.assert_allclose(got[1, :n_valid], want[1, :n_valid],
                               rtol=1e-4, atol=1e-4)


def test_full_intent_model_parity(rng):
    """Reference fine-tuned layout (wav2vec.* + attention + fc) -> our
    Wav2VecIntent: logit parity incl. head."""
    config = small_wav2vec_base_config(hidden_size=64, num_layers=2)
    t_backbone = _torch_backbone(config)

    class TorchIntent(torch.nn.Module):
        # mirrors the decompiled reference Wav2VecIntent head
        def __init__(self):
            super().__init__()
            self.wav2vec = t_backbone
            self.attention = torch.nn.Linear(config.hidden_size, 1)
            self.fc = torch.nn.Linear(config.hidden_size, 5)

        def forward(self, input_values, attention_mask=None):
            hidden = self.wav2vec(input_values,
                                  attention_mask=attention_mask
                                  ).last_hidden_state
            w = torch.softmax(self.attention(hidden), dim=1)
            pooled = torch.sum(hidden * w, dim=1)
            return self.fc(pooled)

    torch.manual_seed(1)
    t_model = TorchIntent()
    t_model.eval()
    x = _waveform(rng, (3, 3200))
    with torch.no_grad():
        want = t_model(torch.from_numpy(x)).numpy()

    state = {k: v.detach().numpy() for k, v in t_model.state_dict().items()}
    params, num_classes = convert_wav2vec_intent_state_dict(state)
    assert num_classes == 5
    model = Wav2VecIntent(config=config, num_classes=5)
    got = np.asarray(model.apply({"params": params}, jnp.asarray(x),
                                 train=False))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)
    assert (np.argmax(got, 1) == np.argmax(want, 1)).all()


def test_masked_spec_embed_applied(rng):
    """mask_time_indices plugs the learned embedding in at masked frames —
    matching torch's _mask_hidden_states with precomputed indices."""
    config = small_wav2vec_base_config(hidden_size=64, num_layers=2)
    t_model = _torch_backbone(config)
    x = _waveform(rng, (1, 3200))
    state = {k: v.detach().numpy() for k, v in t_model.state_dict().items()}
    params = convert_wav2vec_state_dict(state, config)
    model = Wav2Vec2Backbone(config)

    out_plain = np.asarray(model.apply({"params": params}, jnp.asarray(x),
                                       deterministic=True))
    t_len = out_plain.shape[1]
    mask_idx = np.zeros((1, t_len), bool)
    mask_idx[0, 3:7] = True
    out_masked = np.asarray(model.apply(
        {"params": params}, jnp.asarray(x),
        mask_time_indices=jnp.asarray(mask_idx), deterministic=True))
    # masking changes the output; removing the mask reproduces the original
    assert not np.allclose(out_masked, out_plain, atol=1e-5)

    with torch.no_grad():
        proj, _ = t_model.feature_projection(
            t_model.feature_extractor(torch.from_numpy(x)).transpose(1, 2))
        proj[torch.from_numpy(mask_idx)] = torch.from_numpy(
            np.asarray(params["masked_spec_embed"]))
        want = t_model.encoder(proj).last_hidden_state.numpy()
    np.testing.assert_allclose(out_masked, want, rtol=1e-4, atol=1e-4)


def test_local_pretrained_dir_load_seam(rng, tmp_path):
    """The documented pretrained-load path end-to-end with a LOCAL
    checkpoint: ``save_pretrained`` a torch base-variant ``Wav2Vec2Model``
    to a directory, load it through
    ``create_wav2vec_intent(model_name=<dir>)`` +
    ``init_wav2vec`` (the exact seam a ``facebook/wav2vec2-base`` download
    would use), and assert backbone hidden-state parity — leaving the
    network download itself as the only untested step."""
    from speech_intent_recognizer_tpu.models.wav2vec import (
        create_wav2vec_intent, init_wav2vec)

    config = small_wav2vec_base_config(hidden_size=64, num_layers=2)
    t_model = _torch_backbone(config)
    ckpt_dir = tmp_path / "wav2vec2-small-base"
    t_model.save_pretrained(str(ckpt_dir))

    model, pretrained = create_wav2vec_intent(5, model_name=str(ckpt_dir))
    assert pretrained is not None, "local checkpoint dir was not loaded"
    assert model.config.do_stable_layer_norm is False
    variables = init_wav2vec(model, jax.random.key(0), input_length=4000,
                             pretrained_params=pretrained)

    x = _waveform(rng, (2, 4000))
    with torch.no_grad():
        want = t_model(torch.from_numpy(x)).last_hidden_state.numpy()
    backbone = Wav2Vec2Backbone(model.config)
    got = np.asarray(backbone.apply(
        {"params": variables["params"]["wav2vec2"]}, jnp.asarray(x),
        deterministic=True))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_convert_wav2vec_cli_roundtrip(rng, tmp_path):
    """The user-facing converter CLI: HF checkpoint dir -> msgpack + config
    sidecar -> ``Wav2VecPredictor.from_checkpoint`` serves it."""
    from speech_intent_recognizer_tpu.cli.convert_wav2vec import main
    from speech_intent_recognizer_tpu.infer.predict import Wav2VecPredictor

    config = small_wav2vec_base_config(hidden_size=64, num_layers=2)
    t_model = _torch_backbone(config)
    ckpt_dir = tmp_path / "hf_ckpt"
    t_model.save_pretrained(str(ckpt_dir))
    out = tmp_path / "wav2vec_intent.msgpack"
    rc = main(["--checkpoint", str(ckpt_dir), "--num_classes", "5",
               "--output", str(out)])
    assert rc == 0 and out.exists()
    assert (tmp_path / "wav2vec_intent.json").exists()

    import json

    label_map_path = tmp_path / "label_map.json"
    label_map_path.write_text(json.dumps(
        {f"intent_{i}": i for i in range(5)}))
    pred = Wav2VecPredictor.from_checkpoint(str(out), str(label_map_path))
    x = _waveform(rng, (1, 4000))
    buf = np.zeros((1, pred.audio_cfg.max_samples), np.float32)
    buf[0, :4000] = x[0]
    probs = pred.predict_waveform_batch(buf, np.asarray([4000], np.int32))
    assert probs.shape == (1, 5)
    np.testing.assert_allclose(probs.sum(axis=-1), 1.0, rtol=1e-4)
