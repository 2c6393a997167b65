"""CNNAudioGRU model tests: shapes, parameter count, and logit-level parity
with a PyTorch model of the reference architecture through the checkpoint
converter (reference architecture: /root/reference/models/models.py:5-68)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from speech_intent_recognizer_tpu.models.cnn_gru import (
    CNNAudioGRU, count_params, init_model)


def _make_torch_reference(num_classes):
    """Construct the reference architecture in torch as a conversion fixture.

    This intentionally re-declares the same layer configuration the reference
    uses (conv 1->32->64->128, BiGRU 1024->256x2, attention, fc) so we can
    test state-dict conversion + logit parity without the missing
    best_model.pt blob.
    """
    torch = pytest.importorskip("torch")
    nn = torch.nn

    class Ref(nn.Module):
        def __init__(self):
            super().__init__()
            self.conv1 = nn.Conv2d(1, 32, 3, 1, 1, bias=False)
            self.bn1 = nn.BatchNorm2d(32)
            self.conv2 = nn.Conv2d(32, 64, 3, 1, 1, bias=False)
            self.bn2 = nn.BatchNorm2d(64)
            self.conv3 = nn.Conv2d(64, 128, 3, 1, 1, bias=False)
            self.bn3 = nn.BatchNorm2d(128)
            self.pool = nn.MaxPool2d(2)
            self.gru = nn.GRU(1024, 256, num_layers=2, batch_first=True,
                              bidirectional=True, dropout=0.5)
            self.attention = nn.Linear(512, 1)
            self.fc = nn.Linear(512, num_classes)

        def forward(self, x):
            if x.dim() == 3:
                x = x.unsqueeze(1)
            x = self.pool(torch.relu(self.bn1(self.conv1(x))))
            x = self.pool(torch.relu(self.bn2(self.conv2(x))))
            x = self.pool(torch.relu(self.bn3(self.conv3(x))))
            b, c, h, w = x.size()
            x = x.permute(0, 3, 1, 2).contiguous().view(b, w, c * h)
            x, _ = self.gru(x)
            w_att = torch.softmax(self.attention(x), dim=1)
            x = torch.sum(x * w_att, dim=1)
            return self.fc(x)

    return Ref()


class TestShapes:
    def test_forward_shapes(self):
        model = CNNAudioGRU(num_classes=31)
        variables = init_model(model, jax.random.key(0), (2, 64, 200))
        x = jnp.zeros((4, 64, 200))
        logits = model.apply(variables, x, train=False)
        assert logits.shape == (4, 31)

    def test_channel_dim_input(self):
        model = CNNAudioGRU(num_classes=19)
        variables = init_model(model, jax.random.key(0), (1, 64, 200))
        x = jnp.zeros((2, 1, 64, 200))
        logits = model.apply(variables, x, train=False)
        assert logits.shape == (2, 19)

    def test_param_count_matches_reference(self):
        # 3,261,184 params for 31 classes — the reference's 3.26 M
        # (SURVEY.md §6, computed from models/models.py:10-39).
        model = CNNAudioGRU(num_classes=31)
        variables = init_model(model, jax.random.key(0))
        assert count_params(variables["params"]) == 3_261_184

    def test_train_mode_returns_finite(self):
        model = CNNAudioGRU(num_classes=31)
        variables = init_model(model, jax.random.key(0))
        x = jnp.asarray(np.random.default_rng(0).standard_normal(
            (2, 64, 200)), jnp.float32)
        logits, mutated = model.apply(
            variables, x, train=True,
            rngs={"dropout": jax.random.key(1)},
            mutable=["batch_stats"])
        assert logits.shape == (2, 31)
        assert np.isfinite(np.asarray(logits)).all()
        assert "batch_stats" in mutated

    def test_bf16_compute(self):
        model = CNNAudioGRU(num_classes=31, compute_dtype=jnp.bfloat16)
        variables = init_model(model, jax.random.key(0))
        x = jnp.asarray(np.random.default_rng(0).standard_normal(
            (2, 64, 200)), jnp.float32)
        logits = model.apply(variables, x, train=False)
        assert logits.dtype == jnp.float32  # head stays fp32
        assert np.isfinite(np.asarray(logits)).all()


class TestInitParity:
    """Default init distributions match torch module defaults.

    The reference never re-initializes (models.py:10-39), so its training
    behavior includes torch's defaults: kaiming_uniform(a=sqrt(5)) kernels
    == U(+-1/sqrt(fan_in)) for Conv2d/Linear (plus the same bound on Linear
    biases), U(+-1/sqrt(H)) for every GRU tensor.  Pin bound and spread
    (uniform std = bound/sqrt(3)) per tensor against the live torch model."""

    def test_init_matches_torch_defaults(self):
        torch = pytest.importorskip("torch")
        torch.manual_seed(0)
        ref = _make_torch_reference(19)
        model = CNNAudioGRU(num_classes=19)
        params = init_model(model, jax.random.key(0))["params"]

        pairs = [
            ("conv1.weight", params["conv1"]["kernel"]),
            ("conv2.weight", params["conv2"]["kernel"]),
            ("conv3.weight", params["conv3"]["kernel"]),
            ("attention.weight", params["attention"]["kernel"]),
            ("attention.bias", params["attention"]["bias"]),
            ("fc.weight", params["fc"]["kernel"]),
            ("fc.bias", params["fc"]["bias"]),
            ("gru.weight_ih_l0", params["gru"]["l0_fwd_w_ih"]),
            ("gru.weight_hh_l1_reverse", params["gru"]["l1_bwd_w_hh"]),
            ("gru.bias_ih_l0", params["gru"]["l0_fwd_b_ih"]),
        ]
        sd = ref.state_dict()
        for tname, ours in pairs:
            theirs = sd[tname].detach().numpy()
            bound = float(np.abs(theirs).max())
            arr = np.asarray(ours)
            # same support ...
            assert np.abs(arr).max() <= bound * 1.10, tname
            if arr.size < 50:  # too few draws for spread statistics
                continue
            # ... actually filling it (rules out a narrower distribution)
            assert np.abs(arr).max() >= bound * 0.80, tname
            # same spread: uniform std = bound / sqrt(3)
            assert np.isclose(arr.std(), theirs.std(), rtol=0.25), (
                tname, arr.std(), theirs.std())


class TestBatchNormFolding:
    def test_folded_logits_match(self, rng):
        from speech_intent_recognizer_tpu.models.cnn_gru import fold_batchnorm

        model = CNNAudioGRU(num_classes=7)
        variables = init_model(model, jax.random.key(5))
        # give the running stats non-trivial values
        bs = jax.tree.map(
            lambda x: x + 0.3 * jnp.asarray(
                np.random.default_rng(0).standard_normal(x.shape),
                x.dtype) ** 2,
            variables["batch_stats"])
        x = jnp.asarray(rng.standard_normal((3, 64, 200)), jnp.float32)
        want = model.apply({"params": variables["params"],
                            "batch_stats": bs}, x, train=False)

        folded = fold_batchnorm(variables["params"], bs)
        fmodel = CNNAudioGRU(num_classes=7, fold_bn=True)
        got = fmodel.apply({"params": folded}, x, train=False)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-4, atol=1e-4)


class TestTorchParity:
    @pytest.fixture(scope="class")
    def torch_and_flax(self):
        torch = pytest.importorskip("torch")
        from speech_intent_recognizer_tpu.convert.torch_import import (
            convert_torch_state_dict)

        torch.manual_seed(0)
        ref = _make_torch_reference(num_classes=31).eval()
        state = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
        params, batch_stats = convert_torch_state_dict(state)
        model = CNNAudioGRU(num_classes=31)
        return ref, model, {"params": params, "batch_stats": batch_stats}

    def test_eval_logits_match(self, torch_and_flax, rng):
        torch = pytest.importorskip("torch")
        ref, model, variables = torch_and_flax
        x = rng.standard_normal((3, 64, 200)).astype(np.float32)
        with torch.no_grad():
            want = ref(torch.from_numpy(x)).numpy()
        got = np.asarray(model.apply(variables, jnp.asarray(x), train=False))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)

    def test_probability_parity(self, torch_and_flax, rng):
        torch = pytest.importorskip("torch")
        ref, model, variables = torch_and_flax
        x = rng.standard_normal((2, 64, 200)).astype(np.float32)
        with torch.no_grad():
            want = torch.softmax(ref(torch.from_numpy(x)), dim=1).numpy()
        got = jax.nn.softmax(
            model.apply(variables, jnp.asarray(x), train=False), axis=1)
        np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)
        # identical argmax — the quantity that defines intent accuracy
        assert (np.argmax(got, 1) == np.argmax(want, 1)).all()
