"""Multiclass softmax classifier over an embedding column, and the
trained language-ID stage composed from it — the supervised fastText
model (Joulin et al. 2016, arXiv:1607.01759: a linear softmax over
mean-pooled hashed n-gram features; fastText's published lid.176
language identifier is exactly this shape).  The multiclass sibling of
``ops/classifier.py``'s binary quality filter; features here are ANY
embedding column, with ``ops/embed.py::hashed_ngram_embed`` as the
canonical text featurizer (``langid_fit`` / ``langid_predict`` compose
exactly that).

Scale shape (the ``logreg_fit`` / ``kmeans_fit`` pattern):

- ``softmax_fit`` runs full-batch gradient descent: per iteration the
  (dim+1, k) weight matrix broadcasts once via ``ray.put`` and every
  batch emits ONE fixed-size gradient partial ``X_b^T (P - Y)`` from a
  single matmul — no exchange, vectors never move.  Bit-reproducible
  re-runs for a fixed input and block structure: zero init, fixed
  iteration count, and a CONTENT-SORTED partial reduce (Ray may deliver
  blocks in any order; float addition isn't associative).  Re-blocking
  the input regroups the float sums (the ``logreg_fit`` contract) —
  predictions, not weights bits, are the cross-structure invariant.
- class discovery is one dim-sized distinct (per-batch uniques union on
  the driver, sorted — deterministic class order).
- ``softmax_predict`` is map-only against the broadcast weights;
  argmax ties break to the lowest class index.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray
import ray.data as rd

from ..state.broadcast import cached_get
from .embed import hashed_ngram_embed


def _stack(vecs, dim: int) -> np.ndarray:
    x = np.zeros((len(vecs), dim), dtype=np.float64)
    for i, v in enumerate(vecs):
        a = np.asarray(v, dtype=np.float64)
        if a.shape != (dim,):
            raise ValueError(
                f"softmax: vector of shape {a.shape} where ({dim},) expected"
            )
        x[i] = a
    return x


def _softmax_rows(z: np.ndarray) -> np.ndarray:
    z = z - z.max(axis=1, keepdims=True)  # stable
    e = np.exp(z)
    return e / e.sum(axis=1, keepdims=True)


def softmax_fit(
    ds: rd.Dataset,
    vec_col: str,
    label_col: str,
    *,
    n_iters: int = 60,
    lr: float = 4.0,
    l2: float = 1e-6,
    method: str = "auto",
    driver_threshold: int = 200_000,
) -> tuple[list, np.ndarray]:
    """Train on (embedding, label) rows.  Returns ``(classes, W)`` with
    ``classes`` sorted and ``W`` of shape (dim + 1, k) — last row =
    per-class bias.

    ``method``: "distributed" emits one fixed-size gradient partial per
    block per iteration; "driver" pulls the featurized projection once
    (canonically row-sorted) and runs the identical loop locally —
    full-batch GD pays one Ray execution PER ITERATION on the
    distributed route, so below ``driver_threshold`` rows the driver
    loop saves n_iters round-trip floors (the ``auto_group_agg``
    size-aware-finish pattern); "auto" probes the row count.  Routes
    agree to optimizer-path float grouping (same classes/predictions;
    weights may differ in ULPs)."""
    if method not in ("auto", "driver", "distributed"):
        raise ValueError(f"softmax_fit: unknown method {method!r}")
    proj = ds.select_columns([vec_col, label_col]).materialize()
    first = proj.take(1)
    if not first:
        raise ValueError("softmax_fit: empty training set")
    dim = len(np.asarray(first[0][vec_col], dtype=np.float64))

    def label_partial(b: pd.DataFrame) -> pd.DataFrame:
        u = sorted(set(b[label_col].dropna().astype(str)))
        return pd.DataFrame({"labels": [u]})

    seen: set = set()
    for part in proj.map_batches(label_partial, batch_format="pandas").iter_batches(
        batch_format="pandas"
    ):
        for u in part["labels"]:
            seen.update(u)
    classes = sorted(seen)
    if len(classes) < 2:
        raise ValueError(f"softmax_fit: need >= 2 classes, got {classes}")
    k = len(classes)
    cls_idx = {c: i for i, c in enumerate(classes)}
    n_total = proj.count()
    w = np.zeros((dim + 1, k), dtype=np.float64)

    if method == "driver" or (method == "auto" and n_total <= driver_threshold):
        df = proj.to_pandas()
        x = _stack(list(df[vec_col]), dim)
        cols = df[label_col].astype(str).map(cls_idx).to_numpy()
        if pd.isna(cols).any():
            raise ValueError("softmax_fit: NULL/unseen label in training rows")
        cols = cols.astype(np.int64)
        # canonical row order (Ray may deliver blocks in any order and
        # float sums aren't associative): sort by (label, vector bytes)
        order = np.lexsort((np.array([v.tobytes() for v in x]), cols))
        x, cols = x[order], cols[order]
        xb = np.concatenate([x, np.ones((len(x), 1))], axis=1)
        y = np.zeros((len(x), k), dtype=np.float64)
        y[np.arange(len(x)), cols] = 1.0
        for _ in range(n_iters):
            p = _softmax_rows(xb @ w)
            grad = (xb.T @ (p - y)) / max(n_total, 1)
            grad[:-1] += l2 * w[:-1]
            w = w - lr * grad
        return classes, w

    for _ in range(n_iters):
        ref = ray.put(w)

        def partial(b: pd.DataFrame) -> pd.DataFrame:
            wv = cached_get(ref)
            x = _stack(list(b[vec_col]), dim)
            xb = np.concatenate([x, np.ones((len(x), 1))], axis=1)
            p = _softmax_rows(xb @ wv)
            y = np.zeros_like(p)
            rows = np.arange(len(b))
            cols = b[label_col].astype(str).map(cls_idx).to_numpy()
            if pd.isna(cols).any():
                raise ValueError("softmax_fit: NULL/unseen label in training rows")
            y[rows, cols.astype(np.int64)] = 1.0
            g = xb.T @ (p - y)  # (dim+1, k) fixed-size partial
            return pd.DataFrame({"g": [g.ravel().tolist()]})

        parts = proj.map_batches(partial, batch_format="pandas").to_pandas()
        grad = np.zeros((dim + 1) * k, dtype=np.float64)
        for v in sorted(parts["g"], key=tuple):  # canonical reduce order
            grad += np.asarray(v, dtype=np.float64)
        grad = grad.reshape(dim + 1, k) / max(n_total, 1)
        grad[:-1] += l2 * w[:-1]  # biases unregularized
        w = w - lr * grad
    return classes, w


def softmax_predict(
    ds: rd.Dataset,
    vec_col: str,
    classes: list,
    weights: np.ndarray,
    *,
    out_col: str = "predicted",
    conf_col: str | None = None,
) -> rd.Dataset:
    """Append the argmax class (and optionally its probability).
    Map-only; weights broadcast once."""
    w = np.ascontiguousarray(weights, dtype=np.float64)
    if w.ndim != 2 or w.shape[1] != len(classes):
        raise ValueError(
            f"softmax_predict: weights {w.shape} inconsistent with "
            f"{len(classes)} classes"
        )
    dim = w.shape[0] - 1
    ref = ray.put(w)
    cls = list(classes)

    def predict(b: pd.DataFrame) -> pd.DataFrame:
        out = b.copy()
        if len(b) == 0:
            out[out_col] = pd.Series([], dtype=object)
            if conf_col:
                out[conf_col] = pd.Series([], dtype=np.float64)
            return out
        wv = cached_get(ref)
        x = _stack(list(b[vec_col]), dim)
        xb = np.concatenate([x, np.ones((len(x), 1))], axis=1)
        p = _softmax_rows(xb @ wv)
        am = p.argmax(axis=1)  # ties -> lowest class index
        out[out_col] = [cls[i] for i in am]
        if conf_col:
            out[conf_col] = p[np.arange(len(b)), am]
        return out

    return ds.map_batches(predict, batch_format="pandas")


# --------------------------------------------------------------------------
# trained language ID = hashed char-n-gram embed -> softmax
# --------------------------------------------------------------------------
_EMBED_COL = "__langid_vec"


def langid_fit(
    docs: rd.Dataset,
    text_col: str = "text",
    label_col: str = "lang",
    *,
    dim: int = 256,
    n: int = 3,
    seed: int = 1,
    n_iters: int = 60,
    lr: float = 4.0,
    method: str = "auto",
) -> dict:
    """Train a fastText-style language identifier on labeled documents.
    Returns a model dict (classes, weights, featurizer params) for
    ``langid_predict``.  The embed pass and every GD pass are map-only;
    only fixed-size gradient partials reach the driver."""
    emb = hashed_ngram_embed(
        docs.select_columns([text_col, label_col]),
        text_col,
        dim=dim,
        n=n,
        seed=seed,
        out_col=_EMBED_COL,
    )
    classes, w = softmax_fit(
        emb, _EMBED_COL, label_col, n_iters=n_iters, lr=lr, method=method
    )
    return {"classes": classes, "weights": w, "dim": dim, "n": n, "seed": seed}


def langid_predict(
    ds: rd.Dataset,
    text_col: str,
    model: dict,
    *,
    out_col: str = "lang_pred",
    conf_col: str | None = None,
) -> rd.Dataset:
    """Append the predicted language (same featurizer params as the
    fit).  Map-only end to end; the temp embedding column is dropped."""
    emb = hashed_ngram_embed(
        ds,
        text_col,
        dim=model["dim"],
        n=model["n"],
        seed=model["seed"],
        out_col=_EMBED_COL,
    )
    pred = softmax_predict(
        emb,
        _EMBED_COL,
        model["classes"],
        model["weights"],
        out_col=out_col,
        conf_col=conf_col,
    )
    return pred.drop_columns([_EMBED_COL])
