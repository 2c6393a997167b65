"""AOT serving export: package the fused waveform->probs program.

The reference deploys by shipping ``best_model.pt`` plus the full Python
model zoo (``scripts/test_model.py:1-40`` re-imports the training code to
serve).  Here the deployable artifact is the *compiled program itself*:
``jax.export`` serializes the jitted fused path (front-end + classifier +
softmax) to portable StableHLO with a **symbolic batch dimension**, so a
serving host needs only JAX — no model code, no config reconstruction —
and one artifact serves every batch size.

Artifact layout (a directory):

    program.jaxexp     serialized jax.export.Exported (symbolic batch "b")
    variables.msgpack  model weights (flax serialization)
    label_map.json     intent label mapping
    manifest.json      audio geometry + export metadata

Weights stay OUTSIDE the program (they are call arguments), so a
fine-tuned checkpoint can be dropped into an existing artifact without
re-exporting.

The exported program uses the XLA front-end backend: Pallas kernel custom
calls are TPU-hardware-specific, while the XLA path lowers to portable
StableHLO that runs on any platform jax.export supports (and XLA re-fuses
it on load).  Serving parity vs the live Predictor is tested in
``tests/test_export_serving.py``.
"""

from __future__ import annotations

import json
import os
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from speech_intent_recognizer_tpu.config.schema import AudioConfig

_PROGRAM = "program.jaxexp"
_VARIABLES = "variables.msgpack"
_LABELS = "label_map.json"
_MANIFEST = "manifest.json"


def _fused_fn(predictor):
    """The export body: (variables, waveforms, lengths) -> probabilities.

    Mirrors Predictor._build's generic path but pins ``backend="xla"`` —
    the portable lowering (see module docstring).
    """
    from speech_intent_recognizer_tpu.infer.predict import Wav2VecPredictor
    from speech_intent_recognizer_tpu.ops.frontend_jax import (
        log_mel_frontend)

    model = predictor.model
    if isinstance(predictor, Wav2VecPredictor):

        def fused(variables, waveforms, lengths):
            mask = (jnp.arange(waveforms.shape[1])[None, :]
                    < lengths[:, None]).astype(jnp.int32)
            logits = model.apply(variables, waveforms, mask, train=False)
            return jax.nn.softmax(logits, axis=-1)

        return fused

    fe = predictor.frontend_params

    def fused(variables, waveforms, lengths):
        feats = log_mel_frontend(waveforms, lengths, fe, backend="xla")
        logits = model.apply(variables, feats, train=False)
        return jax.nn.softmax(logits, axis=-1)

    return fused


def export_predictor(predictor, out_dir: str,
                     platforms: Optional[list] = None) -> str:
    """Export a (Wav2Vec)Predictor's fused serving path to ``out_dir``.

    ``platforms`` defaults to the current backend plus "cpu" (dev hosts
    can smoke-test a TPU artifact).  Returns ``out_dir``.
    """
    from flax import serialization

    from jax import export as jexp

    os.makedirs(out_dir, exist_ok=True)
    fused = _fused_fn(predictor)
    cfg = predictor.audio_cfg
    width = predictor._buffer_width()

    plats = platforms or sorted({jax.default_backend(), "cpu"})
    b = jexp.symbolic_shape("b")[0]
    wf_spec = jax.ShapeDtypeStruct((b, width), jnp.float32)
    ln_spec = jax.ShapeDtypeStruct((b,), jnp.int32)
    var_specs = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(jnp.shape(x), jnp.asarray(x).dtype),
        predictor.variables)
    exported = jexp.export(jax.jit(fused), platforms=plats)(
        var_specs, wf_spec, ln_spec)
    with open(os.path.join(out_dir, _PROGRAM), "wb") as f:
        f.write(exported.serialize())

    with open(os.path.join(out_dir, _VARIABLES), "wb") as f:
        f.write(serialization.to_bytes(predictor.variables))
    with open(os.path.join(out_dir, _LABELS), "w") as f:
        json.dump(predictor.label_map, f, indent=2)
    with open(os.path.join(out_dir, _MANIFEST), "w") as f:
        json.dump({
            "format": "sir_tpu.serving_export.v1",
            "model": type(predictor.model).__name__,
            "platforms": plats,
            "buffer_width": width,
            "num_classes": int(len(predictor.inv_label_map)),
            "audio": {
                "sample_rate": cfg.sample_rate,
                "n_fft": cfg.n_fft,
                "hop_length": cfg.hop_length,
                "n_mels": cfg.n_mels,
                "mel_spec_length": cfg.mel_spec_length,
                "max_samples": cfg.max_samples,
                "frontend": cfg.frontend,
            },
        }, f, indent=2)
    return out_dir


class ServingModel:
    """Run an exported artifact: waveforms in, probabilities out.

    Needs only JAX + the artifact directory — none of the model/front-end
    code is imported.  The symbolic batch dimension means any batch size
    runs through the one serialized program.
    """

    def __init__(self, exported, variables, label_map: Dict[str, int],
                 manifest: Dict):
        self._exported = exported
        self._call = jax.jit(exported.call)
        self.variables = variables
        self.label_map = label_map
        self.inv_label_map = {v: k for k, v in label_map.items()}
        self.manifest = manifest
        self.buffer_width = int(manifest["buffer_width"])

    @classmethod
    def load(cls, artifact_dir: str) -> "ServingModel":
        from flax import serialization

        from jax import export as jexp

        with open(os.path.join(artifact_dir, _PROGRAM), "rb") as f:
            exported = jexp.deserialize(f.read())
        with open(os.path.join(artifact_dir, _MANIFEST)) as f:
            manifest = json.load(f)
        if manifest.get("format") != "sir_tpu.serving_export.v1":
            raise ValueError(
                f"unrecognized artifact format in {artifact_dir}: "
                f"{manifest.get('format')!r}")
        with open(os.path.join(artifact_dir, _LABELS)) as f:
            label_map = json.load(f)
        with open(os.path.join(artifact_dir, _VARIABLES), "rb") as f:
            blob = f.read()
        # from_bytes needs the pytree structure: rebuild it from the
        # exported call signature's first argument tree.
        treedef = exported.in_tree.children()[0].children()[0]
        leaves = [
            np.zeros(s.shape, s.dtype)
            for s in exported.in_avals[: treedef.num_leaves]]
        target = jax.tree.unflatten(treedef, leaves)
        variables = serialization.from_bytes(target, blob)
        return cls(exported, variables, label_map, manifest)

    def predict_waveform_batch(self, waveforms: np.ndarray,
                               lengths: np.ndarray) -> np.ndarray:
        """(B, buffer_width) float32 + (B,) lengths -> (B, C) probs."""
        wf = jnp.asarray(waveforms, jnp.float32)
        ln = jnp.asarray(lengths, jnp.int32)
        if wf.shape[1] != self.buffer_width:
            pad = self.buffer_width - wf.shape[1]
            if pad < 0:
                raise ValueError(
                    f"waveform buffer {wf.shape[1]} exceeds the exported "
                    f"width {self.buffer_width}")
            wf = jnp.pad(wf, ((0, 0), (0, pad)))
        return np.asarray(self._call(self.variables, wf, ln))
