"""Metrics cross-checked against sklearn (which the reference used,
scripts/evaluate.py:88-98)."""

import numpy as np
import pytest

from speech_intent_recognizer_tpu.evaluation import metrics as M


@pytest.fixture
def preds(rng):
    y_true = rng.integers(0, 5, 200)
    y_pred = np.where(rng.random(200) < 0.7, y_true, rng.integers(0, 5, 200))
    return y_true, y_pred


class TestAgainstSklearn:
    def test_accuracy(self, preds):
        sk = pytest.importorskip("sklearn.metrics")
        y_true, y_pred = preds
        assert abs(M.accuracy_score(y_true, y_pred)
                   - sk.accuracy_score(y_true, y_pred)) < 1e-12

    def test_confusion_matrix(self, preds):
        sk = pytest.importorskip("sklearn.metrics")
        y_true, y_pred = preds
        np.testing.assert_array_equal(
            M.confusion_matrix(y_true, y_pred, 5),
            sk.confusion_matrix(y_true, y_pred, labels=range(5)))

    def test_classification_report_values(self, preds):
        sk = pytest.importorskip("sklearn.metrics")
        y_true, y_pred = preds
        names = [f"c{i}" for i in range(5)]
        ours = M.classification_report_dict(y_true, y_pred, names, 5)
        theirs = sk.classification_report(y_true, y_pred,
                                          target_names=names,
                                          output_dict=True,
                                          zero_division=0)
        for name in names:
            for key in ("precision", "recall", "f1-score", "support"):
                assert abs(ours["classes"][name][key]
                           - theirs[name][key]) < 1e-9, (name, key)
        for avg in ("macro avg", "weighted avg"):
            for key in ("precision", "recall", "f1-score"):
                assert abs(ours[avg][key] - theirs[avg][key]) < 1e-9

    def test_report_formatting(self, preds):
        y_true, y_pred = preds
        rep = M.classification_report_dict(y_true, y_pred,
                                           [f"c{i}" for i in range(5)], 5)
        text = M.format_classification_report(rep)
        assert "precision" in text and "macro avg" in text
        assert "c0" in text


class TestTopK:
    def test_top_k(self):
        probs = np.array([0.1, 0.5, 0.05, 0.35])
        inv = {0: "a", 1: "b", 2: "c", 3: "d"}
        top = M.top_k_predictions(probs, inv, k=3)
        assert [t["label"] for t in top] == ["b", "d", "a"]
        assert abs(top[0]["probability"] - 0.5) < 1e-9


class TestManifestEvaluatorUnknowns:
    """Regression: out-of-map labels must get a dedicated '<unknown>' class,
    not be folded into class 0 (old ``max(p, 0)``) or wrap to the last
    column via negative indexing; the CM must sum to the sample count."""

    def test_unknown_labels_get_dedicated_row(self, tmp_path):
        from speech_intent_recognizer_tpu.evaluation.evaluate import (
            evaluate_manifest_with_predictor)

        label_map = {"a": 0, "b": 1, "c": 2}

        class StubPredictor:
            def __init__(self):
                self.label_map = label_map
                self.inv_label_map = {v: k for k, v in label_map.items()}

            def predict_file(self, path):
                # path encodes the predicted label for the test
                return {"predicted_label": path.split(":")[1],
                        "confidence": 0.9}

        class StubManifest:
            # one unknown prediction ("zz") and one unknown true label ("q")
            paths = ["p:a", "p:b", "p:zz", "p:c", "p:a"]
            labels = ["a", "b", "b", "q", "a"]

        res = evaluate_manifest_with_predictor(StubPredictor(), StubManifest())
        cm = res["confusion_matrix"]
        assert cm.shape == (4, 4)  # 3 classes + <unknown>
        assert cm.sum() == 5
        # unknown prediction lands in the <unknown> column of true row b
        assert cm[1, 3] == 1
        # unknown true label lands in the <unknown> row
        assert cm[3, :].sum() == 1
        # class 0 is NOT polluted: exactly the two correct 'a' samples
        assert cm[0, 0] == 2 and cm[:, 0].sum() == 2
        assert "<unknown>" in res["report"]["classes"]
        # accuracy: 3 correct (a,b,a) of 5
        assert abs(res["accuracy"] - 0.6) < 1e-9

    def test_no_unknowns_keeps_shape(self):
        from speech_intent_recognizer_tpu.evaluation.evaluate import (
            evaluate_manifest_with_predictor)

        label_map = {"a": 0, "b": 1}

        class StubPredictor:
            def __init__(self):
                self.label_map = label_map
                self.inv_label_map = {v: k for k, v in label_map.items()}

            def predict_file(self, path):
                return {"predicted_label": path.split(":")[1],
                        "confidence": 1.0}

        class StubManifest:
            paths = ["p:a", "p:b"]
            labels = ["a", "b"]

        res = evaluate_manifest_with_predictor(StubPredictor(), StubManifest())
        assert res["confusion_matrix"].shape == (2, 2)
        assert res["accuracy"] == 1.0
