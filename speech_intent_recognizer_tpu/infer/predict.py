"""Offline inference: single file, batch directory, interactive REPL.

Counterpart of the reference's ``scripts/test_model.py`` (predict + top-3
report, batch mode, interactive mode), with one deliberate fix: inference
uses the *same* front-end as training (the reference's mic path used a
different librosa pipeline with global normalization —
``scripts/testing.py:189-217`` — a train/serve skew this framework
eliminates by construction).

The whole feature+forward path is one jitted function: waveform in, probs
out — this is the fused path the benchmark measures.
"""

from __future__ import annotations

import logging
import os
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from speech_intent_recognizer_tpu.config.schema import AudioConfig
from speech_intent_recognizer_tpu.data.audio_io import load_audio
from speech_intent_recognizer_tpu.evaluation.metrics import top_k_predictions
from speech_intent_recognizer_tpu.models.cnn_gru import CNNAudioGRU
from speech_intent_recognizer_tpu.ops.frontend_jax import (
    log_mel_frontend, make_frontend_params)

logger = logging.getLogger(__name__)

_AUDIO_EXTS = (".wav", ".mp3", ".flac")


def _default_gru_impl() -> str:
    """Recurrence implementation for the batch inference variants.

    The Pallas time-blocked GRU kernel (``ops/gru_pallas.py``) beats the
    unrolled ``lax.scan`` on real TPU hardware (6.22 vs 6.36 ms variant
    forward at b1024 — BENCH_NOTES.md round 3) and is parity-tested; off
    TPU it would run in the slow interpreter, so CPU keeps the scan."""
    return "pallas" if jax.default_backend() == "tpu" else "scan"


def _default_pool_impl() -> str:
    """Conv-epilogue implementation for the conv1_external variant.

    Stays "xla": the Pallas epilogue kernel (``ops/pool_epilogue_pallas``,
    parity-tested, opt-in) measured NEGATIVE on v5e — 5.3 vs 2.8 ms for
    XLA's fused bias/relu/pool pass at conv2's b2048 geometry.  A pure
    copy kernel over the same blocks also takes 2.7 ms, i.e. XLA's
    epilogue already runs at the Pallas streaming floor (the pipeline is
    element-throughput-bound, not HBM-byte-bound) — see BENCH_NOTES.md
    round 3 "epilogue kernel" entry."""
    return "xla"


class Predictor:
    """End-to-end (waveform -> intent) predictor with a fused jitted path."""

    def __init__(self, model, variables: dict, label_map: Dict[str, int],
                 audio_cfg: Optional[AudioConfig] = None, mesh=None):
        self.model = model
        self.variables = variables
        self.label_map = label_map
        self.inv_label_map = {v: k for k, v in label_map.items()}
        self.audio_cfg = audio_cfg or AudioConfig()
        self.frontend_params = make_frontend_params(self.audio_cfg)
        # Optional data-parallel serving mesh: the fused path is wrapped in
        # shard_map over the 'data' axis (params replicated), so the Pallas
        # kernels run per-shard on each chip's local batch — GSPMD treats a
        # pallas_call as opaque and would otherwise replicate the whole
        # batch onto every chip.
        self.mesh = mesh
        self._fn = None
        self._fn_vars = None
        # (variant_model, variant_variables, weo) when the fused
        # frontend+conv1 Pallas fast path is enabled (see
        # _maybe_enable_conv1_fusion); batch waveform inference only — the
        # streaming/feature paths keep the standard model.
        self._conv1 = None
        # (head_model, head_variables, weo, (w2, b2t, w3, b3t)) when the
        # conv2/conv3 stages also run in the Pallas conv23 kernel — the
        # whole conv stack then lives in kernels and the model is GRU+head.
        self._conv23 = None

    @classmethod
    def from_checkpoint(cls, model_path: str, label_map_path: str,
                        audio_cfg: Optional[AudioConfig] = None,
                        num_classes: Optional[int] = None,
                        fold_bn: bool = True, mesh=None) -> "Predictor":
        from speech_intent_recognizer_tpu.data.labelmap import load_label_map
        from speech_intent_recognizer_tpu.models.cnn_gru import fold_batchnorm
        from speech_intent_recognizer_tpu.train.checkpoint import (
            load_model_checkpoint)

        label_map = load_label_map(label_map_path)
        variables = load_model_checkpoint(model_path)
        if num_classes is None:
            # infer from the classifier head (reference
            # test_tts_samples.py:46-48 trick)
            fc_kernel = variables["params"]["fc"]["kernel"]
            num_classes = int(np.asarray(fc_kernel).shape[-1])
        batch_stats = variables.get("batch_stats", {})
        if fold_bn and batch_stats:
            # inference-only: fold BN into the convs (identical eval math,
            # fewer fp32 round-trips between the bf16 convs)
            params = fold_batchnorm(variables["params"], batch_stats)
            model = CNNAudioGRU(num_classes=num_classes, fold_bn=True)
            pred = cls(model, {"params": params, "batch_stats": {}},
                       label_map, audio_cfg, mesh=mesh)
            pred._maybe_enable_conv1_fusion(params)
            return pred
        model = CNNAudioGRU(num_classes=num_classes)
        variables = {"params": variables["params"],
                     "batch_stats": batch_stats}
        return cls(model, variables, label_map, audio_cfg, mesh=mesh)

    # ----------------------------------------------------------- fused path

    def _maybe_enable_conv1_fusion(self, folded_params: dict) -> None:
        """Enable the fused frontend+conv1 Pallas fast path when the audio
        geometry matches the kernel contract (torchaudio mode, n_fft=1024,
        hop=512, n_mels=64): the first conv stage runs inside the frontend
        kernel while the mel image is in VMEM, and the batch waveform path
        serves the ``conv1_external`` model variant (logit-equivalent at
        bf16 — the production compute dtype)."""
        cfg = self.audio_cfg
        conv1 = folded_params.get("conv1")
        if not (cfg.frontend == "torchaudio" and cfg.n_fft == 1024
                and cfg.hop_length == 512 and cfg.n_mels == 64
                and cfg.mel_spec_length % 2 == 0
                and isinstance(conv1, dict) and "bias" in conv1):
            return
        from speech_intent_recognizer_tpu.ops.frontend_jax import (
            pallas_usable)

        if not pallas_usable():  # Mosaic regression: serve unfused instead
            return
        from speech_intent_recognizer_tpu.models.cnn_gru import (
            conv1_external_params)
        from speech_intent_recognizer_tpu.ops.frontend_pallas import (
            conv1_band_operands)

        var_params, c1k, c1b = conv1_external_params(folded_params)
        variant = CNNAudioGRU(num_classes=self.model.num_classes,
                              compute_dtype=jnp.bfloat16, fold_bn=True,
                              conv1_external=True,
                              gru_impl=_default_gru_impl(),
                              pool_impl=_default_pool_impl())
        weo = conv1_band_operands(c1k, c1b, cfg.n_mels)
        self._conv1 = (variant, {"params": var_params}, weo)
        # Optionally conv2/conv3 move into the Pallas conv23 kernel too
        # (opt-in via enable_conv23_kernel(); measured net-neutral vs the
        # XLA conv2/conv3 of the conv1_external variant at b1024 — see
        # BENCH_NOTES.md round 3 — so the variant path stays the default)
        self._conv23_available = (
            np.asarray(folded_params["conv2"]["kernel"]).shape
            == (3, 3, 32, 64)
            and np.asarray(folded_params["conv3"]["kernel"]).shape
            == (3, 3, 64, 128)
            and cfg.mel_spec_length % 4 == 0)
        self._folded_for_conv23 = folded_params if self._conv23_available \
            else None

    def enable_conv23_kernel(self) -> None:
        """Switch the batch waveform path to the full conv-stack-in-kernels
        configuration (frontend+conv1 kernel -> conv23 kernel -> GRU head).
        Parity-tested; throughput-neutral vs the default at b1024."""
        if not getattr(self, "_conv23_available", False) \
                or self._conv1 is None:
            raise ValueError("conv23 kernel requires the reference "
                             "geometry and channels (32, 64, 128)")
        from speech_intent_recognizer_tpu.models.cnn_gru import (
            conv_external_params)
        from speech_intent_recognizer_tpu.ops.conv23_pallas import (
            conv23_operands)

        weo = self._conv1[2]
        head_params, _, (k2, b2), (k3, b3) = conv_external_params(
            self._folded_for_conv23)
        head = CNNAudioGRU(num_classes=self.model.num_classes,
                           compute_dtype=jnp.bfloat16, fold_bn=True,
                           conv_external=True,
                           gru_impl=_default_gru_impl())
        self._conv23 = (head, {"params": head_params}, weo,
                        conv23_operands(k2, b2, k3, b3))
        self._fn = None  # rebuild the fused path on next use

    def _finalize(self, fn):
        """jit the fused path; with a serving mesh, shard_map it over the
        'data' axis first (params replicated, batch dims sharded)."""
        if self.mesh is None:
            return jax.jit(fn)
        from jax.sharding import PartitionSpec as P

        from speech_intent_recognizer_tpu.parallel.mesh import DATA_AXIS

        # check_vma=False: pallas_call does not declare varying-mesh-axes
        # metadata, and the fused path is per-shard pure (no collectives),
        # so the check has nothing to verify anyway.
        return jax.jit(jax.shard_map(
            fn, mesh=self.mesh,
            in_specs=(P(), P(DATA_AXIS), P(DATA_AXIS)),
            out_specs=P(DATA_AXIS), check_vma=False))

    def _build(self):
        fn, variables = self._fused_body()
        return self._finalize(fn), variables

    def _fused_body(self):
        """The un-jitted production path: (variables, waveforms, lengths)
        -> probabilities, plus the variables pytree it serves.  Shared by
        the live jitted path (`_build`) and the AOT production export
        (`infer/export.py`), so the deployed artifact is the same program
        the benchmark measures."""
        fe = self.frontend_params
        if self._conv23 is not None:
            from speech_intent_recognizer_tpu.ops.conv23_pallas import (
                conv23_pallas)
            from speech_intent_recognizer_tpu.ops.frontend_jax import (
                log_mel_conv1_frontend)

            head, head_vars, weo, (w2, b2t, w3, b3t) = self._conv23

            def fused_conv23(variables, waveforms, lengths):
                pooled = log_mel_conv1_frontend(waveforms, lengths, fe, weo)
                feats = conv23_pallas(pooled, w2, b2t, w3, b3t)
                logits = head.apply(variables, feats, train=False)
                return jax.nn.softmax(logits, axis=-1)

            return fused_conv23, head_vars
        if self._conv1 is not None:
            from speech_intent_recognizer_tpu.ops.frontend_jax import (
                log_mel_conv1_frontend)

            variant, variant_vars, weo = self._conv1

            def fused_conv1(variables, waveforms, lengths):
                pooled = log_mel_conv1_frontend(waveforms, lengths, fe, weo)
                logits = variant.apply(variables, pooled, train=False)
                return jax.nn.softmax(logits, axis=-1)

            return fused_conv1, variant_vars

        model = self.model

        def fused(variables, waveforms, lengths):
            feats = log_mel_frontend(waveforms, lengths, fe, backend="auto")
            logits = model.apply(variables, feats, train=False)
            return jax.nn.softmax(logits, axis=-1)

        return fused, self.variables

    def predict_waveform_batch(self, waveforms: np.ndarray,
                               lengths: np.ndarray) -> np.ndarray:
        """(B, L) float32 + (B,) lengths -> (B, C) probabilities.

        With a serving mesh the batch is padded up to a multiple of the
        'data' axis size (pad rows are stripped from the result) and each
        chip runs the fused path on its local shard.

        Row-aligned host buffers feeding the fused conv1/conv23 path are
        handed to the program as their (B, t_k, hop) row view — a
        zero-copy NumPy reshape here that saves the 2.0 ms/b2048 in-jit
        prep copy on device (bench_kernel_attrib.py "entry_prep")."""
        if self._fn is None:
            self._fn, self._fn_vars = self._build()
        if (isinstance(waveforms, np.ndarray) and waveforms.ndim == 2
                and (self._conv1 is not None or self._conv23 is not None)):
            from speech_intent_recognizer_tpu.ops.frontend_jax import (
                rows_view)

            rows = rows_view(waveforms, self.audio_cfg.hop_length)
            if rows is not None:
                waveforms = rows
        wf = jnp.asarray(waveforms)
        ln = jnp.asarray(lengths, jnp.int32)
        b = wf.shape[0]
        if self.mesh is not None:
            from speech_intent_recognizer_tpu.parallel.mesh import DATA_AXIS

            pad = (-b) % self.mesh.shape[DATA_AXIS]
            if pad:
                wf = jnp.pad(wf, ((0, pad),) + ((0, 0),) * (wf.ndim - 1))
                ln = jnp.pad(ln, (0, pad), constant_values=1)
        return np.asarray(self._fn(self._fn_vars, wf, ln))[:b]

    # ------------------------------------------------------------- file API

    def _buffer_width(self) -> int:
        """Row-aligned batch-buffer width: makes the fused kernels' row
        view a zero-copy reshape (see ``frontend_jax.padded_samples``)."""
        from speech_intent_recognizer_tpu.ops.frontend_jax import (
            padded_samples)

        return padded_samples(self.audio_cfg.max_samples,
                              self.audio_cfg.hop_length)

    def _load_buffer(self, audio_path: str):
        x, _ = load_audio(audio_path,
                          target_sample_rate=self.audio_cfg.sample_rate)
        n = min(len(x), self.audio_cfg.max_samples)
        buf = np.zeros((1, self._buffer_width()), np.float32)
        buf[0, :n] = x[:n]
        return buf, np.asarray([max(n, 1)], np.int32)

    def predict_file(self, audio_path: str, top_k: int = 3) -> Optional[dict]:
        """Reference ``predict`` result shape (``test_model.py:136-140``)."""
        try:
            buf, lengths = self._load_buffer(audio_path)
        except Exception as e:
            logger.error("error processing %s: %s", audio_path, e)
            return None
        probs = self.predict_waveform_batch(buf, lengths)[0]
        pred = int(np.argmax(probs))
        return {
            "predicted_label": self.inv_label_map.get(pred, "Unknown"),
            "confidence": float(probs[pred]),
            "top_predictions": top_k_predictions(probs, self.inv_label_map,
                                                 top_k),
        }

    def predict_array(self, samples: np.ndarray, sample_rate: int,
                      top_k: int = 3) -> dict:
        """Predict from an in-memory waveform (the mic-callback path)."""
        from speech_intent_recognizer_tpu.ops.resample import resample_np

        x = np.asarray(samples, np.float32).reshape(-1)
        if sample_rate != self.audio_cfg.sample_rate:
            x = resample_np(x, sample_rate,
                            self.audio_cfg.sample_rate).astype(np.float32)
        n = min(len(x), self.audio_cfg.max_samples)
        buf = np.zeros((1, self._buffer_width()), np.float32)
        buf[0, :n] = x[:n]
        probs = self.predict_waveform_batch(buf,
                                            np.asarray([max(n, 1)], np.int32))[0]
        pred = int(np.argmax(probs))
        return {
            "predicted_label": self.inv_label_map.get(pred, "Unknown"),
            "confidence": float(probs[pred]),
            "top_predictions": top_k_predictions(probs, self.inv_label_map,
                                                 top_k),
        }

    def predict_directory(self, audio_dir: str, top_k: int = 3) -> List[dict]:
        """Batch mode over a directory (``test_model.py:190-223``)."""
        files = sorted(
            os.path.join(audio_dir, f) for f in os.listdir(audio_dir)
            if f.lower().endswith(_AUDIO_EXTS))
        results = []
        for path in files:
            r = self.predict_file(path, top_k)
            if r is None:
                continue
            r["file"] = os.path.basename(path)
            results.append(r)
        return results


class Wav2VecPredictor(Predictor):
    """Predictor over the raw-waveform Wav2VecIntent model.

    Same file/array/directory API as :class:`Predictor`, but the fused path
    feeds raw waveforms + attention masks to the wav2vec backbone instead of
    log-mel features.
    """

    def __init__(self, model, variables: dict, label_map: Dict[str, int],
                 audio_cfg: Optional[AudioConfig] = None, mesh=None):
        super().__init__(model, variables, label_map, audio_cfg, mesh=mesh)

    @classmethod
    def from_checkpoint(cls, model_path: str, label_map_path: str,
                        audio_cfg: Optional[AudioConfig] = None,
                        num_classes: Optional[int] = None,
                        wav2vec_config=None, mesh=None) -> "Wav2VecPredictor":
        from speech_intent_recognizer_tpu.data.labelmap import load_label_map
        from speech_intent_recognizer_tpu.models.wav2vec import (
            create_wav2vec_intent)
        from speech_intent_recognizer_tpu.train.checkpoint import (
            load_model_checkpoint)

        label_map = load_label_map(label_map_path)
        variables = load_model_checkpoint(model_path)
        params = variables.get("params", variables)
        if num_classes is None:
            num_classes = int(np.asarray(params["fc"]["kernel"]).shape[-1])
        if wav2vec_config is None:
            # the trainer writes the backbone config next to the checkpoint
            import json

            meta_path = os.path.splitext(model_path)[0] + ".json"
            if os.path.exists(meta_path):
                with open(meta_path) as f:
                    meta = json.load(f)
                if "wav2vec_config" in meta:
                    from transformers import Wav2Vec2Config

                    wav2vec_config = Wav2Vec2Config(**meta["wav2vec_config"])
        if wav2vec_config is None and (model_path.endswith(".pt")
                                       or model_path.endswith(".pth")):
            # bare reference checkpoint: reconstruct the backbone config
            # from the torch state dict's weight shapes
            from speech_intent_recognizer_tpu.convert.torch_import import (
                load_torch_checkpoint)
            from speech_intent_recognizer_tpu.convert.wav2vec_import import (
                infer_wav2vec_config)

            state = load_torch_checkpoint(model_path)
            backbone = {k.split(".", 1)[1]: v for k, v in state.items()
                        if k.startswith(("wav2vec.", "wav2vec2."))}
            if backbone:
                wav2vec_config = infer_wav2vec_config(backbone)
        model, _ = create_wav2vec_intent(num_classes, config=wav2vec_config)
        return cls(model, {"params": params}, label_map, audio_cfg,
                   mesh=mesh)

    def _fused_body(self):
        model = self.model

        def fused(variables, waveforms, lengths):
            mask = (jnp.arange(waveforms.shape[1])[None, :]
                    < lengths[:, None]).astype(jnp.int32)
            logits = model.apply(variables, waveforms, mask, train=False)
            return jax.nn.softmax(logits, axis=-1)

        return fused, self.variables

    def _buffer_width(self) -> int:
        return self.audio_cfg.max_samples  # raw-waveform model: no framing
