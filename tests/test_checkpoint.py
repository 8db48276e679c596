"""Checkpoint round-trip, predictors, and decision-making utilities."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from amq_tpu.models import forward, get_config, init_params, quantize_model
from amq_tpu.search.decision import high_tradeoff_points
from amq_tpu.utils.checkpoint import load_quantized, save_quantized


@pytest.mark.slow
def test_quantized_roundtrip(tmp_path):
    cfg = get_config("tiny-llama")
    params = init_params(cfg, jax.random.PRNGKey(0))
    q = quantize_model(params, cfg, 3)
    save_quantized(q, cfg, str(tmp_path / "m"), extra_meta={"nbits": 3})
    loaded, cfg2 = load_quantized(str(tmp_path / "m"))
    assert cfg2.name == cfg.name

    toks = jnp.arange(6, dtype=jnp.int32)[None]
    a, _ = forward(q, cfg, toks)
    b, _ = forward(loaded, cfg, toks)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=1e-6, atol=1e-6)


@pytest.mark.slow
def test_quantized_roundtrip_bf16_meta(tmp_path):
    """bf16 scale/zero (the serving meta_dtype default) must survive the
    npz round trip — numpy silently stores ml_dtypes arrays as void
    ``|V2`` blobs unless viewed through a native dtype."""
    cfg = get_config("tiny-llama")
    params = init_params(cfg, jax.random.PRNGKey(0))
    q = quantize_model(params, cfg, 3, meta_dtype=jnp.bfloat16)
    save_quantized(q, cfg, str(tmp_path / "m"), extra_meta={"nbits": 3})
    loaded, _ = load_quantized(str(tmp_path / "m"))

    ql = loaded["layers"][0]["self_attn.q_proj"]
    assert ql.qt.scale.dtype == jnp.bfloat16
    toks = jnp.arange(6, dtype=jnp.int32)[None]
    a, _ = forward(q, cfg, toks)
    b, _ = forward(loaded, cfg, toks)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=1e-6, atol=1e-6)


def test_rbf_interpolates_training_points():
    from amq_tpu.predictor import RBF
    rng = np.random.default_rng(0)
    X = rng.random((40, 6))
    y = np.sin(X.sum(1)) + X[:, 0] ** 2
    m = RBF(lb=np.zeros(6), ub=np.ones(6))
    m.fit(X, y)
    pred = m.predict(X).ravel()
    np.testing.assert_allclose(pred, y, atol=1e-5)
    # generalization sanity on held-out points
    Xt = rng.random((20, 6))
    yt = np.sin(Xt.sum(1)) + Xt[:, 0] ** 2
    err = np.abs(m.predict(Xt).ravel() - yt).mean()
    assert err < 0.1, err


def test_mlp_fits_linear_function():
    from amq_tpu.predictor import MLP
    rng = np.random.default_rng(1)
    X = rng.random((64, 5)).astype(np.float32)
    w = rng.random(5)
    y = X @ w
    m = MLP(epochs=300)
    m.fit(X, y)
    pred = m.predict(X).ravel()
    assert np.corrcoef(pred, y)[0, 1] > 0.95


def test_high_tradeoff_points_picks_knee():
    # L-shaped front: knee at the corner
    F = np.array([[0.0, 1.0], [0.05, 0.5], [0.1, 0.1], [0.5, 0.05],
                  [1.0, 0.0]])
    idx = high_tradeoff_points(F, n_survive=1)
    assert idx[0] == 2
