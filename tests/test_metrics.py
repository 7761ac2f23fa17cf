"""Metric implementations vs sklearn / hand-computed oracles."""

import numpy as np
import pytest

from radad_tpu.train import metrics as M


def test_eer_perfect_separation():
    scores = np.array([-5, -4, -3, 3, 4, 5], float)
    labels = np.array([0, 0, 0, 1, 1, 1])
    eer, thr = M.compute_eer(scores, labels)
    assert eer == 0.0
    assert -3 <= thr <= 3


def test_eer_random_is_near_50(rng):
    scores = rng.standard_normal(4000)
    labels = (rng.random(4000) > 0.5).astype(int)
    eer, _ = M.compute_eer(scores, labels)
    assert 45 < eer < 55


def test_eer_symmetry(rng):
    """EER invariant under class flip + score negation (this is why our
    spoof-positive convention matches the reference's numbers)."""
    scores = rng.standard_normal(500) + (rng.random(500) > 0.6) * 1.5
    labels = (rng.random(500) > 0.6).astype(int)
    e1, _ = M.compute_eer(scores, labels)
    e2, _ = M.compute_eer(-scores, 1 - labels)
    assert abs(e1 - e2) < 1.0


def test_roc_auc_matches_sklearn(rng):
    from sklearn.metrics import roc_auc_score

    scores = rng.standard_normal(300)
    labels = (scores + rng.standard_normal(300) > 0).astype(int)
    fpr, tpr, _ = M.roc_curve(scores, labels)
    ours = M.auc(fpr, tpr)
    theirs = roc_auc_score(labels, scores)
    assert abs(ours - theirs) < 1e-9


def test_eer_matches_sklearn_intersection(rng):
    from sklearn.metrics import roc_curve as sk_roc

    scores = rng.standard_normal(500) + (rng.random(500) > 0.5) * 1.0
    labels = (rng.random(500) > 0.5).astype(int)
    eer, _ = M.compute_eer(scores, labels)
    fpr, tpr, _ = sk_roc(labels, scores)
    fnr = 1 - tpr
    idx = np.nanargmin(np.abs(fnr - fpr))
    sk_eer = (fpr[idx] + fnr[idx]) / 2 * 100
    assert abs(eer - sk_eer) < 1.0


def test_macro_eer(rng):
    # Two groups: one separable (EER 0), one random (~50) → macro ≈ 25
    n = 400
    s1 = np.r_[np.full(n, -2.0), np.full(n, 2.0)]
    y1 = np.r_[np.zeros(n), np.ones(n)]
    s2 = rng.standard_normal(2 * n)
    y2 = (rng.random(2 * n) > 0.5).astype(float)
    scores = np.r_[s1, s2]
    labels = np.r_[y1, y2].astype(int)
    groups = ["sep"] * (2 * n) + ["rand"] * (2 * n)
    macro = M.compute_macro_eer(scores, labels, groups)
    assert 15 < macro < 35
    # group with one class only is skipped
    macro2 = M.compute_macro_eer(
        np.r_[scores, [1.0]], np.r_[labels, [1]], groups + ["solo"])
    assert abs(macro - macro2) < 1e-9


def test_min_tdcf():
    asv = {"P_miss_asv": 0.05, "P_fa_asv": 0.01, "P_fa_spoof_asv": 0.99,
           "C_miss_asv": 1.0, "C_fa_asv": 10.0, "C_miss_cm": 1.0,
           "C_fa_cm": 10.0, "pi_tar": 0.01, "pi_non": 0.99, "pi_spoof": 0.05}
    rng = np.random.default_rng(0)
    labels = (rng.random(1000) > 0.5).astype(int)
    # good CM: spoof scores higher
    scores = labels * 2.0 + rng.standard_normal(1000) * 0.2
    tdcf_good, _ = M.compute_min_tdcf(scores, labels, asv)
    # useless CM
    tdcf_bad, _ = M.compute_min_tdcf(rng.standard_normal(1000), labels, asv)
    assert np.isfinite(tdcf_good) and np.isfinite(tdcf_bad)
    assert tdcf_good < tdcf_bad
    # unconfigured → NaN (reference behavior, BASELINE.md)
    nan_val, _ = M.compute_min_tdcf(scores, labels, None)
    assert np.isnan(nan_val)


def test_det_curve_monotone(rng):
    scores = rng.standard_normal(200) + (rng.random(200) > 0.5)
    labels = (rng.random(200) > 0.5).astype(int)
    x, y = M.det_curve(scores, labels)
    assert np.all(np.isfinite(x)) and np.all(np.isfinite(y))


def test_recall_at_k():
    exact = np.array([[1, 2, 3, 4, 5], [6, 7, 8, 9, 10]])
    got = np.array([[1, 2, 3, 99, 98], [6, 7, 8, 9, 10]])
    assert M.recall_at_k(got, exact) == pytest.approx(0.8)


def test_notebook_plot_helpers(tmp_path):
    """Inline notebook figures (reference pipeline.py:1160-1259 parity)."""
    import matplotlib
    matplotlib.use("Agg")
    import numpy as np

    from radad_tpu.train.notebook import plot_roc_det, plot_training_history

    csv_path = str(tmp_path / "metrics.csv")
    with open(csv_path, "w") as f:
        f.write("epoch,train_loss,train_acc,val_loss,val_acc,"
                "eer_percent,macro_eer_percent\n")
        f.write("1,0.7,0.5,0.69,0.5,40.0,42.0\n")
        f.write("2,0.5,0.8,0.55,0.75,,\n")  # missing EER column tolerated
    fig = plot_training_history(csv_path)
    assert len(fig.axes) == 3
    rng = np.random.default_rng(0)
    labels = (rng.random(200) > 0.5).astype(np.float32)
    scores = labels + rng.standard_normal(200) * 0.7
    fig2 = plot_roc_det(scores, labels, title="t")
    assert len(fig2.axes) == 2


def test_plot_history_from_metrics_csv(tmp_path):
    """plot_history renders the reference's four inline notebook curves
    (pipeline.py:1160-1259) from a run's metrics.csv."""
    import csv
    from radad_tpu.train.artifacts import plot_history

    rows = [
        {"epoch": 1, "train_loss": 0.6, "val_loss": 0.5, "train_acc": 0.6,
         "val_acc": 0.7, "eer_percent": 20.0, "macro_eer_percent": 18.0,
         "auc": 0.85},
        {"epoch": 2, "train_loss": 0.4, "val_loss": 0.45, "train_acc": 0.8,
         "val_acc": 0.82, "eer_percent": 12.0, "macro_eer_percent": 10.0,
         "auc": 0.93},
    ]
    with open(tmp_path / "metrics.csv", "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=list(rows[0]))
        w.writeheader()
        w.writerows(rows)
    fig = plot_history(str(tmp_path))
    assert len(fig.axes) == 4
    assert all(ax.lines for ax in fig.axes)  # every panel drew something


def test_wandb_mode_resolution(monkeypatch):
    """WandbShim resolves online/offline like the reference resolves its
    API key (pipeline.py:29-52): explicit WANDB_MODE wins, an API key
    selects online, fallback is offline (VERDICT r2 #8)."""
    from radad_tpu.train.artifacts import WandbShim

    monkeypatch.delenv("WANDB_MODE", raising=False)
    monkeypatch.delenv("WANDB_API_KEY", raising=False)
    monkeypatch.setenv("HOME", "/nonexistent")  # hide any ~/.netrc
    assert WandbShim._resolve_mode() == "offline"
    monkeypatch.setenv("WANDB_API_KEY", "k-test")
    assert WandbShim._resolve_mode() == "online"
    monkeypatch.setenv("WANDB_MODE", "disabled")
    assert WandbShim._resolve_mode() == "disabled"
