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

Two flavors:

* ``portable`` (default) — the XLA front-end path, symbolic batch, runs
  on any platform jax.export supports (XLA re-fuses it on load).
* ``production`` — the predictor's real TPU path (fused frontend+conv1
  Pallas kernel, bf16 variant model, Pallas GRU), one program per pinned
  batch size (Pallas custom calls cannot take a symbolic batch through
  the kernel grid); TPU-only, requires the same TPU generation at load.

Serving parity vs the live Predictor is tested in
``tests/test_export_serving.py``; the production flavor's measured
throughput vs the live Predictor is recorded in BENCH_NOTES.md round 4.
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
                     platforms: Optional[list] = None,
                     flavor: str = "portable",
                     batch_sizes: tuple = (8, 256, 2048)) -> str:
    """Export a (Wav2Vec)Predictor's fused serving path to ``out_dir``.

    ``flavor="portable"`` (default): XLA front-end, symbolic batch,
    portable StableHLO for ``platforms`` (defaults to the current backend
    plus "cpu").

    ``flavor="production"``: the predictor's ACTUAL production path
    (``Predictor._fused_body`` — fused frontend+conv1 Pallas kernel,
    bf16 conv1-external variant model, Pallas GRU), TPU-only.  Pallas
    lowers to ``tpu_custom_call``, which is not on jax.export's custom-call
    stability allowlist and cannot take a symbolic batch through the kernel
    grid, so this flavor serializes one program per ``batch_sizes`` entry
    (``program_b{N}.jaxexp``); ``ServingModel`` routes each request to the
    smallest adequate batch.  The stored weights are the variant pytree —
    drop-in weight swaps need the same BN-fold + conv1-externalization
    transform (``Predictor.from_checkpoint`` + re-export is simplest).

    Returns ``out_dir``.
    """
    from flax import serialization

    from jax import export as jexp

    os.makedirs(out_dir, exist_ok=True)
    cfg = predictor.audio_cfg
    width = predictor._buffer_width()

    if flavor == "production":
        fused, variables = predictor._fused_body()
        plats = ["tpu"]
        checks = [jexp.DisabledSafetyCheck.custom_call("tpu_custom_call"),
                  jexp.DisabledSafetyCheck.custom_call(
                      "mosaic_tpu")]  # Mosaic call-target names by version
        var_specs = jax.tree.map(
            lambda x: jax.ShapeDtypeStruct(jnp.shape(x),
                                           jnp.asarray(x).dtype),
            variables)
        # rows-shaped input spec: the serialized program takes the
        # (B, t_k, hop) row view of the flat buffer (ServingModel reshapes
        # host-side, zero-copy) so the deployed artifact also skips the
        # in-jit prep copy (bench_kernel_attrib.py "entry_prep").
        hop = cfg.hop_length
        rows_shape = (width // hop, hop)
        programs = {}
        for bs in sorted(set(int(b) for b in batch_sizes)):
            wf_spec = jax.ShapeDtypeStruct((bs,) + rows_shape, jnp.float32)
            ln_spec = jax.ShapeDtypeStruct((bs,), jnp.int32)
            exported = jexp.export(
                jax.jit(fused), platforms=plats,
                disabled_checks=checks)(var_specs, wf_spec, ln_spec)
            name = f"program_b{bs}.jaxexp"
            with open(os.path.join(out_dir, name), "wb") as f:
                f.write(exported.serialize())
            programs[str(bs)] = name
        extra = {"flavor": "production", "programs": programs,
                 "rows_input": list(rows_shape)}
    else:
        fused = _fused_fn(predictor)
        variables = predictor.variables
        plats = platforms or sorted({jax.default_backend(), "cpu"})
        b = jexp.symbolic_shape("b")[0]
        wf_spec = jax.ShapeDtypeStruct((b, width), jnp.float32)
        ln_spec = jax.ShapeDtypeStruct((b,), jnp.int32)
        var_specs = jax.tree.map(
            lambda x: jax.ShapeDtypeStruct(jnp.shape(x),
                                           jnp.asarray(x).dtype),
            variables)
        exported = jexp.export(jax.jit(fused), platforms=plats)(
            var_specs, wf_spec, ln_spec)
        with open(os.path.join(out_dir, _PROGRAM), "wb") as f:
            f.write(exported.serialize())
        extra = {"flavor": "portable"}

    with open(os.path.join(out_dir, _VARIABLES), "wb") as f:
        f.write(serialization.to_bytes(variables))
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
            **extra,
        }, f, indent=2)
    return out_dir


_STREAM_PROGRAM = "stream_finalize.jaxexp"
_STREAM_CLASSIFY = "stream_classify.jaxexp"


def export_streaming(predictor, out_dir: str,
                     platforms: Optional[list] = None) -> str:
    """Export the streaming end-of-utterance path as a portable artifact.

    Serializes the ONE-call fused finalize (tail-frame DFT+mel+dB, masked
    normalization, classify — ``StreamingRecognizer._build_fused_finalize``)
    and the partial-hypothesis classifier to StableHLO, alongside weights,
    labels and the audio geometry.  A serving host loads this with
    :class:`StreamingArtifactPredictor` and runs the FULL streaming stack
    (VAD -> incremental log-mel -> finalize) with no model code and no
    remote accelerator: the per-chunk feed is host-side (native C++ or
    NumPy featurizer) and end-of-utterance is the deserialized program on
    the local backend.

    The reference's streaming analogue recomputes the entire utterance's
    features at end of speech on the Python host
    (``scripts/testing.py:222-266``); this artifact keeps the incremental
    path AND makes it deployable without the framework.

    Returns ``out_dir``.
    """
    from flax import serialization

    from jax import export as jexp

    from speech_intent_recognizer_tpu.infer.streaming import (
        StreamingRecognizer)

    os.makedirs(out_dir, exist_ok=True)
    rec = StreamingRecognizer(predictor)
    cfg = predictor.audio_cfg
    p = rec._featurizer.params
    tail_max = StreamingRecognizer._TAIL_MAX
    plats = platforms or sorted({jax.default_backend(), "cpu"})
    var_specs = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(jnp.shape(x), jnp.asarray(x).dtype),
        predictor.variables)
    scalar_i32 = jax.ShapeDtypeStruct((), jnp.int32)

    finalize = jexp.export(
        jax.jit(rec._build_fused_finalize()), platforms=plats)(
            var_specs,
            jax.ShapeDtypeStruct((p.target_length, p.n_mels), jnp.float32),
            scalar_i32,
            jax.ShapeDtypeStruct((tail_max, rec._featurizer.n_fft),
                                 jnp.float32),
            scalar_i32)
    with open(os.path.join(out_dir, _STREAM_PROGRAM), "wb") as f:
        f.write(finalize.serialize())

    classify = jexp.export(
        jax.jit(rec._build_classifier()), platforms=plats)(
            var_specs,
            jax.ShapeDtypeStruct((p.n_mels, p.target_length), jnp.float32))
    with open(os.path.join(out_dir, _STREAM_CLASSIFY), "wb") as f:
        f.write(classify.serialize())

    with open(os.path.join(out_dir, _VARIABLES), "wb") as f:
        f.write(serialization.to_bytes(predictor.variables))
    with open(os.path.join(out_dir, _LABELS), "w") as f:
        json.dump(predictor.label_map, f, indent=2)
    with open(os.path.join(out_dir, _MANIFEST), "w") as f:
        json.dump({
            "format": "sir_tpu.streaming_export.v1",
            "model": type(predictor.model).__name__,
            "platforms": plats,
            "tail_max": tail_max,
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


class StreamingArtifactPredictor:
    """Predictor stand-in backed by an exported streaming artifact.

    Duck-types the attributes :class:`StreamingRecognizer` reads from a
    live ``Predictor`` (``audio_cfg``, ``variables``, ``label_map``,
    ``inv_label_map``) and pre-fills the shared compiled-function cache
    with the deserialized finalize/classify programs, so

        rec = StreamingRecognizer(StreamingArtifactPredictor.load(d))

    serves streams end-to-end from the artifact alone — no model or
    front-end construction code, any jax.export-supported backend.
    """

    def __init__(self, finalize_call, classify_call, variables,
                 label_map: Dict[str, int], manifest: Dict):
        self.variables = jax.device_put(variables)
        self.label_map = label_map
        self.inv_label_map = {v: k for k, v in label_map.items()}
        a = manifest["audio"]
        self.audio_cfg = AudioConfig(
            sample_rate=a["sample_rate"], n_fft=a["n_fft"],
            hop_length=a["hop_length"], n_mels=a["n_mels"],
            mel_spec_length=a["mel_spec_length"],
            max_duration=a["max_samples"] / a["sample_rate"],
            frontend=a["frontend"])
        self.manifest = manifest
        # StreamingRecognizer._shared_jit finds these and never touches
        # the (absent) model attribute.
        self._stream_jit_cache = {"fused_finalize": finalize_call,
                                  "classify": classify_call}

    @classmethod
    def load(cls, artifact_dir: str) -> "StreamingArtifactPredictor":
        from flax import serialization

        from jax import export as jexp

        with open(os.path.join(artifact_dir, _MANIFEST)) as f:
            manifest = json.load(f)
        if manifest.get("format") != "sir_tpu.streaming_export.v1":
            raise ValueError(
                f"unrecognized streaming artifact in {artifact_dir}: "
                f"{manifest.get('format')!r}")
        with open(os.path.join(artifact_dir, _STREAM_PROGRAM), "rb") as f:
            finalize = jexp.deserialize(f.read())
        with open(os.path.join(artifact_dir, _STREAM_CLASSIFY), "rb") as f:
            classify = jexp.deserialize(f.read())
        with open(os.path.join(artifact_dir, _LABELS)) as f:
            label_map = json.load(f)
        with open(os.path.join(artifact_dir, _VARIABLES), "rb") as f:
            blob = f.read()
        treedef = finalize.in_tree.children()[0].children()[0]
        leaves = [
            np.zeros(s.shape, s.dtype)
            for s in finalize.in_avals[: treedef.num_leaves]]
        variables = serialization.from_bytes(
            jax.tree.unflatten(treedef, leaves), blob)
        return cls(jax.jit(finalize.call), jax.jit(classify.call),
                   variables, label_map, manifest)


class ServingModel:
    """Run an exported artifact: waveforms in, probabilities out.

    Needs only JAX + the artifact directory — none of the model/front-end
    code is imported.  The symbolic batch dimension means any batch size
    runs through the one serialized program.
    """

    def __init__(self, exported, variables, label_map: Dict[str, int],
                 manifest: Dict):
        if isinstance(exported, dict):  # production flavor: batch -> program
            self._programs = dict(sorted(exported.items()))
            self._calls = {b: jax.jit(e.call)
                           for b, e in self._programs.items()}
            first = next(iter(self._programs.values()))
            self._exported = first
        else:
            self._programs = None
            self._exported = exported
            self._call = jax.jit(exported.call)
        # Keep the weights device-resident: ``load`` deserializes them as
        # host numpy arrays, and passing those to a jitted call re-uploads
        # ~13 MB per request (on a tunneled accelerator that transfer alone
        # dwarfs the compute — measured 15x throughput loss in
        # bench_artifact.py before this device_put).
        self.variables = jax.device_put(variables)
        self.label_map = label_map
        self.inv_label_map = {v: k for k, v in label_map.items()}
        self.manifest = manifest
        self.buffer_width = int(manifest["buffer_width"])

    @classmethod
    def load(cls, artifact_dir: str) -> "ServingModel":
        from flax import serialization

        from jax import export as jexp

        with open(os.path.join(artifact_dir, _MANIFEST)) as f:
            manifest = json.load(f)
        if manifest.get("format") != "sir_tpu.serving_export.v1":
            raise ValueError(
                f"unrecognized artifact format in {artifact_dir}: "
                f"{manifest.get('format')!r}")
        if manifest.get("flavor") == "production":
            exported = {}
            for bs, name in manifest["programs"].items():
                with open(os.path.join(artifact_dir, name), "rb") as f:
                    exported[int(bs)] = jexp.deserialize(f.read())
            sig_src = next(iter(exported.values()))
        else:
            with open(os.path.join(artifact_dir, _PROGRAM), "rb") as f:
                exported = jexp.deserialize(f.read())
            sig_src = exported
        with open(os.path.join(artifact_dir, _LABELS)) as f:
            label_map = json.load(f)
        with open(os.path.join(artifact_dir, _VARIABLES), "rb") as f:
            blob = f.read()
        # from_bytes needs the pytree structure: rebuild it from the
        # exported call signature's first argument tree.
        treedef = sig_src.in_tree.children()[0].children()[0]
        leaves = [
            np.zeros(s.shape, s.dtype)
            for s in sig_src.in_avals[: treedef.num_leaves]]
        target = jax.tree.unflatten(treedef, leaves)
        variables = serialization.from_bytes(target, blob)
        return cls(exported, variables, label_map, manifest)

    def predict_waveform_batch(self, waveforms: np.ndarray,
                               lengths: np.ndarray) -> np.ndarray:
        """(B, buffer_width) float32 + (B,) lengths -> (B, C) probs.

        Production-flavor artifacts route to the smallest exported batch
        size that fits (padding rows, stripped from the result); requests
        larger than the biggest program are processed in chunks.  Programs
        exported with ``rows_input`` take the flat buffer's (B, t_k, hop)
        row view — a zero-copy host reshape here."""
        wf = np.asarray(waveforms, np.float32)
        ln = np.asarray(lengths, np.int32)
        if wf.shape[1] != self.buffer_width:
            pad = self.buffer_width - wf.shape[1]
            if pad < 0:
                raise ValueError(
                    f"waveform buffer {wf.shape[1]} exceeds the exported "
                    f"width {self.buffer_width}")
            wf = np.pad(wf, ((0, 0), (0, pad)))
        rows = self.manifest.get("rows_input")
        if rows and self._programs is not None:
            wf = wf.reshape(wf.shape[0], *rows)
        if self._programs is None:
            return np.asarray(self._call(self.variables, wf, ln))
        b = wf.shape[0]
        sizes = list(self._calls)
        bmax = sizes[-1]
        outs = []
        s = 0
        while s < b:
            n = min(b - s, bmax)
            bs = next(sz for sz in sizes if sz >= n)
            cw, cl = wf[s:s + n], ln[s:s + n]
            if n < bs:
                cw = np.pad(cw, ((0, bs - n),) + ((0, 0),) * (cw.ndim - 1))
                cl = np.pad(cl, (0, bs - n), constant_values=1)
            outs.append(np.asarray(
                self._calls[bs](self.variables, cw, cl))[:n])
            s += n
        return np.concatenate(outs, axis=0)
