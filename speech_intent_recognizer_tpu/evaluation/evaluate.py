"""Test-set evaluation with report artifacts.

Produces the same artifact set as the reference evaluator
(``scripts/evaluate.py:88-116``): accuracy, an sklearn-style
``classification_report.txt``, and a confusion matrix saved as both ``.npy``
and (when matplotlib is present) ``.png`` — under
``<save_path>/evaluation_results/``.

The prediction loop itself is one jitted batched scan (no per-batch host
sync); the class count is read from the loaded checkpoint like the
reference's ``fc.weight``-shape trick rather than hardcoded
(fixing the quirk at ``evaluate.py:44-45``).
"""

from __future__ import annotations

import json
import logging
import os
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from speech_intent_recognizer_tpu.evaluation import metrics as M

logger = logging.getLogger(__name__)


def predict_dataset(model, variables, features, batch_size: int = 64,
                    mesh=None):
    """Batched argmax predictions + probabilities for a device dataset.

    With ``mesh`` the per-batch forward is ``shard_map``-ped over the
    ``'data'`` axis (params replicated, batch sharded) so evaluation scales
    across chips like training does; the batch size is rounded up to a
    multiple of the axis size. Gathering ``features[ix]`` stays global —
    only the model apply runs per-shard."""
    n = int(features.shape[0])
    bs = min(batch_size, n)
    apply_fn = lambda v, x: model.apply(v, x, train=False)  # noqa: E731
    if mesh is not None:
        from jax.sharding import PartitionSpec as P

        from speech_intent_recognizer_tpu.parallel.mesh import DATA_AXIS

        dp = mesh.shape[DATA_AXIS]
        bs = -(-bs // dp) * dp
        # check_vma=False: the per-shard forward is pure (no collectives).
        apply_fn = jax.shard_map(apply_fn, mesh=mesh,
                                 in_specs=(P(), P(DATA_AXIS)),
                                 out_specs=P(DATA_AXIS), check_vma=False)
    steps = -(-n // bs)
    total = steps * bs
    idx = jnp.asarray(np.minimum(np.arange(total), n - 1).reshape(steps, bs))

    @jax.jit
    def run(variables, features):
        def body(_, ix):
            logits = apply_fn(variables, features[ix])
            return None, logits

        _, logits = jax.lax.scan(body, None, idx)
        return logits.reshape(total, -1)

    logits = np.asarray(run(variables, features))[:n]
    probs = np.asarray(jax.nn.softmax(jnp.asarray(logits), axis=-1))
    return np.argmax(logits, axis=-1), probs, logits


def evaluate_dataset(
    model,
    variables,
    features,
    labels,
    label_map: Dict[str, int],
    results_dir: Optional[str] = None,
    batch_size: int = 64,
    mesh=None,
) -> Dict:
    """Evaluate and (optionally) write the report artifact set."""
    inv = {v: k for k, v in label_map.items()}
    y_true = np.asarray(labels)
    y_pred, probs, _ = predict_dataset(model, variables, features, batch_size,
                                       mesh=mesh)

    num_classes = probs.shape[1]
    names = [inv.get(i, str(i)) for i in range(num_classes)]
    report = M.classification_report_dict(y_true, y_pred, names, num_classes)
    cm = M.confusion_matrix(y_true, y_pred, num_classes)
    acc = report["accuracy"]
    logger.info("test accuracy: %.4f", acc)

    if results_dir is not None:
        os.makedirs(results_dir, exist_ok=True)
        text = M.format_classification_report(report)
        with open(os.path.join(results_dir, "classification_report.txt"),
                  "w") as f:
            f.write(f"Test Accuracy: {acc:.4f}\n\n")
            f.write(text)
        np.save(os.path.join(results_dir, "confusion_matrix.npy"), cm)
        with open(os.path.join(results_dir, "metrics.json"), "w") as f:
            json.dump(report, f, indent=2)
        _plot_confusion(cm, names,
                        os.path.join(results_dir, "confusion_matrix.png"))
        logger.info("evaluation artifacts written to %s", results_dir)

    return {"accuracy": acc, "report": report, "confusion_matrix": cm,
            "predictions": y_pred, "probabilities": probs}


def evaluate_manifest_with_predictor(
    predictor,
    manifest,
    results_dir: Optional[str] = None,
) -> Dict:
    """Evaluate any waveform predictor (e.g. Wav2VecPredictor) over a
    manifest — the raw-audio analog of :func:`evaluate_dataset` for models
    without a feature cache."""
    label_map = predictor.label_map
    inv = predictor.inv_label_map
    num_classes = max(label_map.values()) + 1 if label_map else 0
    # Labels outside the map (either side) get a dedicated trailing
    # `<unknown>` class instead of being silently folded into class 0 /
    # wrapping to the last column — the confusion matrix must sum to the
    # evaluated sample count with unknowns visible.
    unknown_idx = num_classes
    n_unknown_true = n_unknown_pred = 0
    y_true, y_pred, probs_all = [], [], []
    for path, label in zip(manifest.paths, manifest.labels):
        r = predictor.predict_file(path)
        if r is None:
            continue
        t = label_map.get(label)
        if t is None:
            n_unknown_true += 1
            t = unknown_idx
        p = label_map.get(r["predicted_label"])
        if p is None:
            n_unknown_pred += 1
            p = unknown_idx
        y_true.append(t)
        y_pred.append(p)
        probs_all.append(r["confidence"])
    has_unknown = bool(n_unknown_true or n_unknown_pred)
    if has_unknown:
        logger.warning(
            "labels outside the label map: %d true, %d predicted — "
            "reported as '<unknown>'", n_unknown_true, n_unknown_pred)
    n_eff = num_classes + 1 if has_unknown else num_classes
    names = [inv.get(i, str(i)) for i in range(num_classes)]
    if has_unknown:
        names.append("<unknown>")
    report = M.classification_report_dict(y_true, y_pred, names, n_eff)
    cm = M.confusion_matrix(y_true, y_pred, n_eff)
    if results_dir is not None:
        os.makedirs(results_dir, exist_ok=True)
        with open(os.path.join(results_dir, "classification_report.txt"),
                  "w") as f:
            f.write(f"Test Accuracy: {report['accuracy']:.4f}\n\n")
            f.write(M.format_classification_report(report))
        np.save(os.path.join(results_dir, "confusion_matrix.npy"), cm)
        _plot_confusion(cm, names,
                        os.path.join(results_dir, "confusion_matrix.png"))
    return {"accuracy": report["accuracy"], "report": report,
            "confusion_matrix": cm}


def _plot_confusion(cm: np.ndarray, names, path: str) -> None:
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except ImportError:  # pragma: no cover
        logger.warning("matplotlib unavailable; skipping %s", path)
        return
    fig, ax = plt.subplots(figsize=(10, 8))
    im = ax.imshow(cm, cmap="Blues")
    fig.colorbar(im, ax=ax)
    ax.set_xticks(range(len(names)))
    ax.set_yticks(range(len(names)))
    ax.set_xticklabels(names, rotation=45, ha="right", fontsize=6)
    ax.set_yticklabels(names, fontsize=6)
    ax.set_xlabel("Predicted")
    ax.set_ylabel("True")
    ax.set_title("Confusion matrix")
    fig.tight_layout()
    fig.savefig(path, dpi=120)
    plt.close(fig)
