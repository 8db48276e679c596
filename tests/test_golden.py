"""Committed golden-value fixtures pinning cross-implementation numerics
(VERDICT r2 item 4): HQQ quantize (incl. the proximal zero solver), GPTQ,
OWQ (incl. outlier selection), the OWQ MSE-grid quantizer, and the AWQ
asymmetric clip grid — tiny seeded matrices with expected outputs checked
in, so a transcription error in any algorithm fails here rather than
silently shifting PPL the day real data is available.

Reference semantics being pinned: hqq/core/quantize.py:120-180 +
optimize.py:208-255 (HQQ), quantization/gptq.py:206-311 (GPTQ),
owq.py:287-391 + 435-553 (OWQ), awq_utils/auto_clip.py:27-87 (AWQ clip).
Values were generated on the CPU backend (the test platform) at f32;
each fixture uses its own seed so tests replay independent rng streams.
"""

import hashlib

import numpy as np
import jax.numpy as jnp

from amq_tpu.core import bitpack
from amq_tpu.core.quantize import optimize_zero_proximal, quantize
from amq_tpu.quantization.awq import _clip_search_single
from amq_tpu.quantization.gptq import gptq_quantize_weight
from amq_tpu.quantization.owq import find_params_mse_grid, owq_quantize_weight


def _sha(a):
    return hashlib.sha256(np.ascontiguousarray(a).tobytes()).hexdigest()[:16]


HQQ_GOLDEN = {
    # bits: (codes_sha16, codes[:8, 0], scale.ravel()[:8], zero.ravel()[:8])
    2: ("667d8ff4c7771c34", [2, 1, 2, 2, 0, 1, 2, 1],
        [1.36423, 1.63144, 1.65404, 1.95056,
         1.68705, 1.85407, 1.64912, 1.96378],
        [1.47678, 1.75323, 1.57202, 1.18347,
         1.17778, 1.7184, 1.58039, 1.82557]),
    3: ("5f521021c37901a3", [4, 2, 5, 5, 0, 1, 4, 3],
        [0.584669, 0.699187, 0.708873, 0.835956,
         0.723022, 0.7946, 0.706764, 0.841619],
        [3.60546, 3.59975, 3.3987, 3.10643,
         2.77231, 3.60118, 3.33473, 4.34021]),
    4: ("d9c73a3c072362b4", [8, 4, 10, 11, 0, 3, 8, 6],
        [0.272846, 0.326287, 0.330807, 0.390113,
         0.33741, 0.370813, 0.329823, 0.392756],
        [7.33982, 8.07276, 7.17637, 7.12173,
         6.30917, 8.05386, 7.7936, 8.96562]),
}


def test_hqq_quantize_golden():
    W = np.random.default_rng(42).normal(size=(4, 256)).astype(np.float32)
    for bits, (sha, codes8, scale8, zero8) in HQQ_GOLDEN.items():
        qt = quantize(jnp.asarray(W), nbits=bits, group_size=128)
        codes = np.asarray(bitpack.unpack(qt.packed, bits, qt.superblock_))
        assert codes[:8, 0].tolist() == codes8, bits
        assert _sha(codes.astype(np.int32)) == sha, bits
        np.testing.assert_allclose(np.asarray(qt.scale).ravel()[:8],
                                   scale8, rtol=2e-5, atol=2e-5)
        np.testing.assert_allclose(np.asarray(qt.zero).ravel()[:8],
                                   zero8, rtol=2e-5, atol=2e-5)


def test_proximal_zero_golden():
    Wg = jnp.asarray(
        np.random.default_rng(43).normal(size=(8, 128)).astype(np.float32))
    mn = Wg.min(axis=1, keepdims=True)
    mx = Wg.max(axis=1, keepdims=True)
    scale = 15.0 / (mx - mn)
    bz = optimize_zero_proximal(Wg, scale, -mn * scale, 15.0)
    np.testing.assert_allclose(
        np.asarray(bz).ravel(),
        [8.10292, 6.75528, 5.97514, 7.26695,
         9.20533, 6.79753, 7.52999, 6.86465],
        rtol=2e-5, atol=2e-5)


def _gptq_problem():
    rng = np.random.default_rng(44)
    W = rng.normal(size=(4, 256)).astype(np.float32)
    X = rng.normal(size=(256, 256)).astype(np.float32)
    H = (2.0 / X.shape[0]) * X.T @ X
    return W, H


def _hessian_loss(W, Q, H):
    D = (W - Q).astype(np.float64)
    return float(np.trace(D @ H.astype(np.float64) @ D.T))


def test_gptq_golden():
    W, H = _gptq_problem()
    Q = np.asarray(gptq_quantize_weight(jnp.asarray(W), jnp.asarray(H), 3))
    np.testing.assert_allclose(
        Q.ravel()[:8],
        [1.30398, 0.0, 0.0, 1.30398, 0.65199, 0.65199, -0.65199, -1.30398],
        rtol=2e-5, atol=2e-5)
    loss = _hessian_loss(W, Q, H)
    assert abs(loss - 61.013068) < 5e-3, loss


def test_owq_golden():
    W, H = _gptq_problem()
    Q, packed = owq_quantize_weight(jnp.asarray(W), jnp.asarray(H), 3,
                                    n_out=4, return_packed=True)
    Q = np.asarray(Q)
    out_ids = np.sort(
        np.asarray(packed["order"])[packed["n_nonout"]:]).tolist()
    assert out_ids == [19, 71, 221, 238], out_ids    # exact selection
    np.testing.assert_allclose(
        Q.ravel()[:8],
        [1.66258, 0.0, 0.554192, 1.10838,
         0.554192, 0.554192, -0.554192, -1.10838],
        rtol=2e-5, atol=2e-5)
    loss = _hessian_loss(W, Q, H)
    assert abs(loss - 33.717076) < 5e-3, loss
    # OWQ must beat plain GPTQ at the same bits (4 fp outlier cols kept)
    assert loss < 61.0


def test_owq_mse_grid_golden():
    x = jnp.asarray(
        np.random.default_rng(45).normal(size=(6, 128)).astype(np.float32))
    s, z = find_params_mse_grid(x, 4)
    np.testing.assert_allclose(
        np.asarray(s).ravel(),
        [0.297868, 0.349988, 0.340637, 0.374317, 0.328542, 0.302259],
        rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(z).ravel(),
                               [6, 8, 8, 7, 9, 7], atol=1e-6)


def test_awq_clip_golden():
    rng = np.random.default_rng(46)
    w = rng.normal(size=(8, 256)).astype(np.float32)
    feat = rng.normal(size=(64, 256)).astype(np.float32)
    mx, mn = _clip_search_single(jnp.asarray(w), jnp.asarray(feat), 3, 128)
    np.testing.assert_allclose(
        np.asarray(mx).ravel()[:8],
        [1.61056, 2.4041, 2.3559, 1.43715,
         2.4001, 2.22609, 2.16306, 1.7526],
        rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(
        np.asarray(mn).ravel()[:8],
        [-1.66055, -2.36644, -2.2905, -2.14144,
         -2.00069, -1.62273, -1.69386, -1.91376],
        rtol=2e-5, atol=2e-5)
