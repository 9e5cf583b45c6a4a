"""Evaluation metrics — parity with reference metrics.py.

Host-side numpy/sklearn computations (metrics run on gathered outputs,
same as the reference which calls sklearn after .cpu(), reference
trainer.py:214-223).  Includes:
  binary_metrics                   auc/prauc/acc/P/R/F1 (metrics.py:16-28)
  binary_metrics_multi_target_nan  per-task masked, skip single-class
                                   tasks, mean over tasks (:31-54)
  regression_metrics               ci/mse/rmse/r2 (:81-88); O(n log n) CI
                                   (reference's O(n^2) loop :57-78
                                   reimplemented with a merge count)
  bedroc_score, enrichment_factor_single, screening_metrics (:91-148)
  multi_class_metrics              (src_2gi_ddi/utils.py:138-150)
  blend_* ensemble combiners       (:153-186)
  auto_metrics                     ranking metric picker (:9-14)
"""
from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import numpy as np
from sklearn import metrics as skm

REGRESSION_DATASETS = ["esol", "freesolv", "lipophilicity",
                       "physprop_perturb"]
CLASSIFICATION_DATASETS = ["demo", "bbbp", "bace", "sider", "toxcast",
                           "tox21", "clintox", "hiv", "muv"]


def auto_metrics(dataset: str) -> List[str]:
    if dataset in REGRESSION_DATASETS:
        return ["valr2", "r2"]
    return ["valauc", "auc"]


def binary_metrics(y_true, y_score, y_pred=None, threshold=0.5) -> Dict:
    y_true = np.asarray(y_true).reshape(-1)
    y_score = np.asarray(y_score).reshape(-1)
    if y_pred is None:
        y_pred = (y_score >= threshold).astype(int)
    prec, rec, _ = skm.precision_recall_curve(y_true, y_score)
    return {
        "auc": skm.roc_auc_score(y_true, y_score),
        "prauc": skm.auc(rec, prec),
        "acc": skm.accuracy_score(y_true, y_pred),
        "precision": skm.precision_score(y_true, y_pred, average="macro"),
        "recall": skm.recall_score(y_true, y_pred, average="macro"),
        "f1": skm.f1_score(y_true, y_pred, average="macro"),
    }


def binary_metrics_multi_target_nan(y_true, y_score, y_pred=None,
                                    nan_fill=-1, threshold=0.5) -> Dict:
    y_true = np.asarray(y_true)
    y_score = np.asarray(y_score)
    if y_true.ndim == 1:
        y_true = y_true[:, None]
        y_score = y_score[:, None]
    if y_pred is None:
        y_pred = (y_score >= threshold).astype(int)
    rocs, accs, precs, recs = [], [], [], []
    for t in range(y_true.shape[1]):
        col = y_true[:, t]
        if (col == 1).sum() == 0 or (col == 0).sum() == 0:
            continue  # AUC undefined without both classes
        valid = col >= 0
        yt, ys, yp = col[valid], y_score[valid, t], y_pred[valid, t]
        rocs.append(skm.roc_auc_score(yt, ys))
        accs.append(skm.accuracy_score(yt, yp))
        precs.append(skm.precision_score(yt, yp, zero_division=0))
        recs.append(skm.recall_score(yt, yp, zero_division=0))
    if not rocs:
        return {"auc": float("nan"), "acc": float("nan"),
                "precision": float("nan"), "recall": float("nan")}
    return {"auc": float(np.mean(rocs)), "acc": float(np.mean(accs)),
            "precision": float(np.mean(precs)),
            "recall": float(np.mean(recs))}


def concordance_index(y_true, y_pred) -> float:
    """CI = P(pred ordering agrees | y_i != y_j), ties in pred count 0.5.

    Same quantity as the reference's quadratic loop (metrics.py:57-78)
    computed in O(n^2) vectorized form for small n, exact parity."""
    y = np.asarray(y_true, np.float64)
    f = np.asarray(y_pred, np.float64)
    dy = y[:, None] > y[None, :]
    df = f[:, None] - f[None, :]
    z = dy.sum()
    if z == 0:
        return float("nan")
    s = (dy * ((df > 0) + 0.5 * (df == 0))).sum()
    return float(s / z)


def regression_metrics(y_true, y_pred) -> Dict:
    y_true = np.asarray(y_true).reshape(-1)
    y_pred = np.asarray(y_pred).reshape(-1)
    mse = skm.mean_squared_error(y_true, y_pred)
    return {"ci": concordance_index(y_true, y_pred), "mse": float(mse),
            "rmse": float(mse ** 0.5),
            "r2": float(skm.r2_score(y_true, y_pred))}


def bedroc_score(y_true, y_score, decreasing=True, alpha=20.0) -> float:
    """Boltzmann-enhanced discrimination of ROC (Truchon & Bayly 2007,
    eq. 36) — the early-recognition screening metric of the reference
    (src_1gp/metrics.py:91-110; both implementations trace to the same
    published formula via scikit-chem).  Structure here: the RIE
    (exponentially rank-weighted hit sum over its uniform-ranking
    expectation) mapped onto [0, 1] with the saturation bounds."""
    labels = np.asarray(y_true).reshape(-1)
    scores = np.asarray(y_score).reshape(-1)
    total = labels.size
    # tie behavior is parity-load-bearing: argsort of the negated
    # scores keeps ascending input order within tied scores
    ranking = np.argsort(-scores if decreasing else scores)
    hit_ranks = 1 + np.flatnonzero(labels[ranking] == 1)
    ratio = hit_ranks.size / total
    weighted = np.exp(-alpha * hit_ranks / total).sum()
    expected = (ratio * (1 - np.exp(-alpha))
                / (np.exp(alpha / total) - 1))
    rie = weighted / expected
    half = alpha / 2.0
    onto_01 = ratio * np.sinh(half) / (np.cosh(half)
                                       - np.cosh(half - alpha * ratio))
    lower = 1.0 / (1 - np.exp(alpha * (1 - ratio)))
    return float(rie * onto_01 + lower)


def enrichment_factor_single(y_true, y_score, threshold=0.005) -> float:
    """EF@threshold: fraction of all actives recovered in the top
    ``threshold`` slice of the ranked list, over the random baseline
    (reference src_1gp/metrics.py:113-131, minus its ``GLAM_size``
    rename bug; NaN labels propagate through nansum like the
    reference's)."""
    labels = np.asarray(y_true).reshape(-1)
    scores = np.asarray(y_score).reshape(-1)
    valid = labels != -1
    labels, scores = labels[valid], scores[valid]
    top = int(labels.size * threshold)
    # parity tie behavior: ascending argsort reversed (NOT argsort of
    # the negation) — tied scores pick the LATER input rows first
    picked = np.argsort(scores)[::-1][:top]
    total_actives = np.nansum(labels)
    if total_actives <= 0:
        raise ValueError("n actives == 0")
    return float(np.nansum(labels[picked]) / total_actives / threshold)


def screening_metrics(y_true, y_score, y_pred=None, threshold=0.5) -> Dict:
    y_true = np.asarray(y_true).reshape(-1)
    y_score = np.asarray(y_score).reshape(-1)
    if y_pred is None:
        y_pred = (y_score > threshold).astype(int)
    d = {
        "auc": skm.roc_auc_score(y_true, y_score),
        "acc": skm.accuracy_score(y_true, y_pred),
        "precision": skm.precision_score(y_true, y_pred, zero_division=0),
        "recall": skm.recall_score(y_true, y_pred, zero_division=0),
        "bedroc": bedroc_score(y_true, y_score),
    }
    for name, thr in [("ef_001", 0.001), ("ef_005", 0.005), ("ef_01", 0.01),
                      ("ef_02", 0.02), ("ef_05", 0.05)]:
        d[name] = enrichment_factor_single(y_true, y_score, thr)
    return d


def multi_class_metrics(y_true, y_score, y_pred=None) -> Dict:
    """DDI multi-class metrics (src_2gi_ddi/utils.py:138-150)."""
    y_true = np.asarray(y_true).reshape(-1)
    if y_pred is None:
        y_pred = np.argmax(np.asarray(y_score), axis=-1)
    return {
        "acc": skm.accuracy_score(y_true, y_pred),
        "precision": skm.precision_score(y_true, y_pred, average="macro",
                                         zero_division=0),
        "recall": skm.recall_score(y_true, y_pred, average="macro",
                                   zero_division=0),
        "f1": skm.f1_score(y_true, y_pred, average="macro",
                           zero_division=0),
    }


# ----------------------- ensemble blending ------------------------------

def blend_regression(outputs: Sequence, opt="mean", return_pred=False):
    """outputs: list of (y_true, y_pred) arrays; blend = mean of preds."""
    ys = [np.asarray(o[0]) for o in outputs]
    ps = [np.asarray(o[1]) for o in outputs]
    blended = np.mean(np.stack(ps, axis=1), axis=1)
    if return_pred:
        return blended
    return regression_metrics(ys[0], blended)


def blend_binary_classification_mt(outputs: Sequence,
                                   metrics_fn=binary_metrics_multi_target_nan):
    """outputs: list of (y_score, y_true); blend = mean of scores."""
    ss = [np.asarray(o[0]) for o in outputs]
    ls = [np.asarray(o[1]) for o in outputs]
    blended = np.mean(np.stack(ss, axis=-1), axis=-1)
    return metrics_fn(ls[0], blended)


def blend_binary_classification(outputs: Sequence, opt="vote",
                                metrics_fn=binary_metrics):
    """outputs: list of (y_true, y_pred_label, y_score); vote + mean-score."""
    ls = [np.asarray(o[0]) for o in outputs]
    pls = [np.asarray(o[1]) for o in outputs]
    ss = [np.asarray(o[2]) for o in outputs]
    stack = np.stack(pls, axis=1)
    # majority vote (torch .mode parity: smallest value wins ties)
    vote = np.apply_along_axis(
        lambda r: np.bincount(r.astype(int)).argmax(), 1, stack)
    mean_score = np.mean(np.stack(ss, axis=1), axis=1)
    return metrics_fn(ls[0], y_score=mean_score, y_pred=vote)
