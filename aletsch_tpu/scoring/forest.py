"""Random-forest transcript scoring as batched JAX inference.

Replaces the reference's sklearn side-car (score.py:59-94) with a TPU-ready
decision-forest evaluator: each tree is flattened into dense node arrays
(feature, threshold, children, leaf probability) and all (tree, sample)
lookups run as vectorized gathers inside one jit; probabilities average over
trees exactly like RandomForestClassifier.predict_proba.

Models can be converted from a fitted sklearn forest (the published Aletsch
model is a joblib RandomForestClassifier) or trained here via train_forest.
"""

from __future__ import annotations

import numpy as np


class ForestArrays:
    """Dense padded representation of a classification forest."""

    def __init__(self, feature, threshold, left, right, prob, max_depth):
        self.feature = feature      # (T, N) int32; -1 for leaves
        self.threshold = threshold  # (T, N) float32
        self.left = left            # (T, N) int32
        self.right = right          # (T, N) int32
        self.prob = prob            # (T, N) float32: P(class 1) at node
        self.max_depth = int(max_depth)

    @classmethod
    def from_sklearn(cls, model):
        """Flatten a fitted sklearn RandomForestClassifier."""
        trees = [est.tree_ for est in model.estimators_]
        T = len(trees)
        N = max(t.node_count for t in trees)
        feature = np.full((T, N), -1, dtype=np.int32)
        threshold = np.zeros((T, N), dtype=np.float32)
        left = np.zeros((T, N), dtype=np.int32)
        right = np.zeros((T, N), dtype=np.int32)
        prob = np.zeros((T, N), dtype=np.float32)
        max_depth = 0
        for t, tr in enumerate(trees):
            n = tr.node_count
            feature[t, :n] = tr.feature
            threshold[t, :n] = tr.threshold
            left[t, :n] = tr.children_left
            right[t, :n] = tr.children_right
            counts = tr.value[:, 0, :]           # (n, n_classes)
            tot = counts.sum(axis=1)
            with np.errstate(divide="ignore", invalid="ignore"):
                p1 = np.where(tot > 0,
                              counts[:, -1] / np.maximum(tot, 1), 0.0)
            prob[t, :n] = p1
            max_depth = max(max_depth, tr.max_depth)
        return cls(feature, threshold, left, right, prob, max_depth)

    def save(self, path):
        np.savez_compressed(path, feature=self.feature,
                            threshold=self.threshold, left=self.left,
                            right=self.right, prob=self.prob,
                            max_depth=self.max_depth)

    @classmethod
    def load(cls, path):
        z = np.load(path)
        return cls(z["feature"], z["threshold"], z["left"], z["right"],
                   z["prob"], int(z["max_depth"]))


def _predict_numpy(fa: ForestArrays, X):
    T, N = fa.feature.shape
    S = X.shape[0]
    node = np.zeros((T, S), dtype=np.int32)
    tidx = np.arange(T)[:, None]
    for _ in range(fa.max_depth):
        feat = fa.feature[tidx, node]
        leaf = feat < 0
        f = np.maximum(feat, 0)
        xv = X[np.arange(S)[None, :], f]
        go_left = xv <= fa.threshold[tidx, node]
        nxt = np.where(go_left, fa.left[tidx, node], fa.right[tidx, node])
        node = np.where(leaf, node, nxt)
    return fa.prob[tidx, node].mean(axis=0)


_JIT = {}


def _get_jax_predict(max_depth):
    key = max_depth
    if key in _JIT:
        return _JIT[key]
    import jax
    import jax.numpy as jnp

    @jax.jit
    def predict(feature, threshold, left, right, prob, X):
        T = feature.shape[0]
        S = X.shape[0]
        node = jnp.zeros((T, S), dtype=jnp.int32)
        tidx = jnp.arange(T)[:, None]

        def body(_, node):
            feat = feature[tidx, node]
            leaf = feat < 0
            f = jnp.maximum(feat, 0)
            xv = X[jnp.arange(S)[None, :], f]
            go_left = xv <= threshold[tidx, node]
            nxt = jnp.where(go_left, left[tidx, node], right[tidx, node])
            return jnp.where(leaf, node, nxt)

        node = jax.lax.fori_loop(0, max_depth, body, node)
        return prob[tidx, node].mean(axis=0)

    _JIT[key] = predict
    return predict


def predict_proba(fa: ForestArrays, X, use_jax=True):
    """P(class 1) per row of X."""
    X = np.asarray(X, dtype=np.float32)
    if not use_jax or X.shape[0] < 256:
        return _predict_numpy(fa, X)
    try:
        fn = _get_jax_predict(fa.max_depth)
        return np.asarray(fn(fa.feature, fa.threshold, fa.left, fa.right,
                             fa.prob, X))
    except Exception:
        return _predict_numpy(fa, X)


def train_forest(X, y, n_estimators=100, max_depth=20, seed=0):
    """Train via sklearn and convert to the dense form."""
    from sklearn.ensemble import RandomForestClassifier
    model = RandomForestClassifier(n_estimators=n_estimators,
                                   max_depth=max_depth, random_state=seed,
                                   n_jobs=1)
    model.fit(X, y)
    return ForestArrays.from_sklearn(model), model
