"""MLP surrogate coverage (VERDICT r2 weakness 3): the flax/optax MLP
must train, predict, and rank a smooth target sanely at fast epoch
counts, and the `--predictor mlp` search axis must run end to end."""

import pytest

pytestmark = pytest.mark.slow

import json

import numpy as np

from amq_tpu.predictor.factory import get_predictor


def _toy(n=60, d=8, seed=0):
    rng = np.random.default_rng(seed)
    X = rng.integers(0, 3, size=(n, d)).astype(float)
    w = np.linspace(1.0, 2.0, d)
    y = X @ w + 0.1 * (X[:, 0] * X[:, 1])
    return X, y


def test_mlp_factory_trains_and_ranks():
    X, y = _toy()
    mlp = get_predictor("mlp", X, y, epochs=80)
    pred = mlp.predict(X).ravel()
    assert pred.shape == (X.shape[0],)
    assert np.all(np.isfinite(pred))
    # rank correlation on the (smooth, monotone) training surface
    from amq_tpu.evaluation.metrics import get_correlation
    rmse, rho, tau = get_correlation(pred, y)
    assert rho > 0.8, (rmse, rho, tau)


def test_mlp_predict_single_row():
    X, y = _toy(n=30, d=4)
    mlp = get_predictor("mlp", X, y, epochs=30)
    out = mlp.predict(X[0])
    assert out.shape == (1, 1)


def test_search_with_mlp_predictor(tmp_path):
    """End-to-end tiny search on the MLP surrogate (reference
    `--predictor mlp`, amq/utils/args.py + predictor/mlp.py:55-96)."""
    from amq_tpu.models import get_config
    from amq_tpu.search import Search
    from amq_tpu.search.space import SearchSpace
    from test_search import FakeEvaluator

    cfg = get_config("tiny-llama")
    top = cfg.topology()
    space = SearchSpace(top, rng=np.random.default_rng(0))
    ev = FakeEvaluator(top)
    search = Search(ev, space, dataset="synthetic", iterations=2, n_doe=12,
                    n_iter=4, save_iter=1, ga_pop_size=12, subset_pop_size=8,
                    predictor="mlp", predictor_kwargs={"epochs": 25},
                    save_path=str(tmp_path), verbose=False)
    archive = search.search()
    assert len(archive) == 12 + 2 * 4
    blob = json.load(open(tmp_path / "iter_2.stats"))
    assert blob["surrogate"]["model"] == "mlp"
    assert 0 < blob["hv"] <= 1.0
