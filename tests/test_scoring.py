import numpy as np
import pytest

from aletsch_tpu.scoring.forest import (ForestArrays, predict_proba,
                                        train_forest)


@pytest.fixture(scope="module")
def fitted():
    rng = np.random.default_rng(0)
    X = rng.normal(size=(800, 10)).astype(np.float32)
    y = (X[:, 0] + 0.5 * X[:, 3] - 0.2 * X[:, 7] > 0).astype(int)
    fa, model = train_forest(X, y, n_estimators=25, max_depth=8)
    return X, y, fa, model


def test_matches_sklearn(fitted):
    X, y, fa, model = fitted
    ref = model.predict_proba(X)[:, 1]
    ours_np = predict_proba(fa, X, use_jax=False)
    assert np.allclose(ref, ours_np, atol=1e-5)


def test_jax_path_matches(fitted):
    X, y, fa, model = fitted
    ref = model.predict_proba(X)[:, 1]
    ours = predict_proba(fa, X, use_jax=True)
    assert np.allclose(ref, ours, atol=1e-5)


def test_save_load_roundtrip(tmp_path, fitted):
    X, y, fa, model = fitted
    p = str(tmp_path / "forest.npz")
    fa.save(p)
    fa2 = ForestArrays.load(p)
    a = predict_proba(fa, X, use_jax=False)
    b = predict_proba(fa2, X, use_jax=False)
    assert np.allclose(a, b)


def test_score_cli(tmp_path, fitted):
    X, y, fa, model = fitted
    from aletsch_tpu.scoring.score import MODEL_FEATURES, score
    import joblib
    # build fake feature CSVs for 1 sample + combined
    nfeat = len(MODEL_FEATURES)
    rng = np.random.default_rng(1)
    rows = rng.normal(size=(20, 51))
    for i in range(2):
        with open(tmp_path / ("%d.trstFeature.csv" % i), "w") as fh:
            for r in range(20):
                cols = ["t%d.%d" % (i, r), "m%d" % (r % 5), "chr1"]
                vals = rows[r, 3:].tolist()
                # count2 column (index 8) must be 1 for combined rows
                cols += ["%.3f" % abs(v) for v in vals[:5]]
                cols += ["1"]
                cols += ["%.3f" % abs(v) for v in vals[6:]]
                fh.write("\t".join(cols[:51]) + "\n")
    # retrain a model with the right feature width
    Xw = rng.normal(size=(300, nfeat)).astype(np.float32)
    yw = (Xw[:, 0] > 0).astype(int)
    faw, modelw = train_forest(Xw, yw, n_estimators=10, max_depth=6)
    mp = str(tmp_path / "model.joblib")
    joblib.dump(modelw, mp)
    out = str(tmp_path / "scores.csv")
    score(str(tmp_path), mp, 1, out, prob_score=0.0)
    lines = open(out).read().strip().split("\n")
    assert lines[0] == "meta_tid,y_prob_mean"
    assert len(lines) == 6   # header + 5 meta tids
