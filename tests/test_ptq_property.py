"""Property tests: the jitted lax GPTQ/OWQ loops against straight-line
float64 numpy references on larger matrices (ROADMAP item 8).

The lax implementations run masked fori_loops in float32; the references
below are direct transcriptions of the algorithm (reference
quantization/gptq.py:254-290 semantics) in float64.  Exact equality is
not expected — a single near-.5 rounding flip propagates through the
error feedback — so the assertions are: the vast majority of entries
agree on the quantization lattice, the Hessian objective matches within
a small factor, and structural invariants (lattice membership, exact
outlier preservation, monotone improvement) hold.
"""

import numpy as np
import jax.numpy as jnp

from amq_tpu.quantization.gptq import gptq_quantize_weight
from amq_tpu.quantization.owq import owq_quantize_weight


def _problem(rows=96, cols=512, n_x=1024, seed=0):
    rng = np.random.default_rng(seed)
    W = rng.normal(size=(rows, cols)).astype(np.float32)
    base = rng.normal(size=(n_x, cols // 4)).astype(np.float32)
    mix = rng.normal(size=(cols // 4, cols)).astype(np.float32)
    X = base @ mix + 0.1 * rng.normal(size=(n_x, cols)).astype(np.float32)
    H = ((2.0 / n_x) * X.T @ X).astype(np.float32)
    return W, H


def _hessian_loss(W, Q, H):
    D = np.asarray(W - Q, np.float64)
    return float(np.trace(D @ np.asarray(H, np.float64) @ D.T))


def _gptq_reference_f64(W, H, bits, group_size=128, blocksize=128,
                        percdamp=0.01, actorder=False):
    """Float64 numpy GPTQ (same semantics as the lax fori_loop version)."""
    rows, cols = W.shape
    maxq = 2 ** bits - 1
    W = W.astype(np.float64).copy()
    H = H.astype(np.float64).copy()
    dead = np.diag(H) == 0
    H = H + np.diag(np.where(dead, 1.0, 0.0))
    W[:, dead] = 0.0
    if actorder:
        perm = np.argsort(-np.diag(H))
        W = W[:, perm]
        H = H[perm][:, perm]
        invperm = np.argsort(perm)
    H = H + percdamp * np.mean(np.diag(H)) * np.eye(cols)
    Hinv_full = np.linalg.inv(H)
    Hinv = np.linalg.cholesky(Hinv_full.T).T     # upper: U^T U = Hinv

    Q = np.zeros_like(W)
    for i1 in range(0, cols, blocksize):
        W1 = W[:, i1:i1 + blocksize].copy()
        Q1 = np.zeros_like(W1)
        Err1 = np.zeros_like(W1)
        Hinv1 = Hinv[i1:i1 + blocksize, i1:i1 + blocksize]
        scale = zero = None
        for i in range(blocksize):
            if i % group_size == 0:
                g = W1[:, i:i + group_size]
                xmin = np.minimum(g.min(axis=1), 0.0)
                xmax = np.maximum(g.max(axis=1), 0.0)
                both = (xmin == 0) & (xmax == 0)
                xmin = np.where(both, -1.0, xmin)
                xmax = np.where(both, 1.0, xmax)
                scale = ((xmax - xmin) / maxq)[:, None]
                zero = np.round(-xmin[:, None] / scale)
            w = W1[:, i:i + 1]
            d = Hinv1[i, i]
            q = scale * (np.clip(np.round(w / scale) + zero, 0, maxq) - zero)
            err = (w - q) / d
            W1[:, i:] -= err @ Hinv1[i:i + 1, i:]
            Q1[:, i] = q[:, 0]
            Err1[:, i] = err[:, 0]
        Q[:, i1:i1 + blocksize] = Q1
        W[:, i1 + blocksize:] -= Err1 @ Hinv[i1:i1 + blocksize, i1 + blocksize:]
    if actorder:
        Q = Q[:, invperm]
    return Q


def test_gptq_matches_float64_reference():
    W, H = _problem()
    for bits in (2, 4):
        Q = np.asarray(gptq_quantize_weight(jnp.asarray(W), jnp.asarray(H),
                                            bits), np.float64)
        Q_ref = _gptq_reference_f64(W, H, bits)
        # entrywise: nearly all entries land on the same lattice point
        # (disagreements are isolated near-.5 rounding flips)
        agree = np.isclose(Q, Q_ref, rtol=0, atol=1e-3 * np.abs(W).max())
        assert agree.mean() > 0.97, (bits, agree.mean())
        # objective: same quality to within a few percent
        l32 = _hessian_loss(W, Q, H)
        l64 = _hessian_loss(W, Q_ref, H)
        assert l32 < 1.05 * l64, (bits, l32, l64)


def test_gptq_actorder_matches_float64_reference():
    W, H = _problem(seed=5)
    Q = np.asarray(gptq_quantize_weight(jnp.asarray(W), jnp.asarray(H), 3,
                                        actorder=True), np.float64)
    Q_ref = _gptq_reference_f64(W, H, 3, actorder=True)
    agree = np.isclose(Q, Q_ref, rtol=0, atol=1e-3 * np.abs(W).max())
    assert agree.mean() > 0.97, agree.mean()
    assert _hessian_loss(W, Q, H) < 1.05 * _hessian_loss(W, Q_ref, H)


def test_gptq_outputs_on_quantization_lattice():
    """Every group's values must be expressible as scale*(q - zero) with
    integer q in [0, maxq] — i.e. exactly 2^bits distinct values/group."""
    W, H = _problem(seed=2, rows=64, cols=256)
    for bits in (2, 3, 4):
        Q = np.asarray(gptq_quantize_weight(jnp.asarray(W), jnp.asarray(H),
                                            bits, group_size=128))
        for g in range(Q.shape[1] // 128):
            blk = Q[:, g * 128:(g + 1) * 128]
            for r in range(0, blk.shape[0], 16):
                vals = np.unique(blk[r])
                assert len(vals) <= 2 ** bits, (bits, g, r, len(vals))


def test_owq_outlier_columns_fp_and_monotone():
    """OWQ keeps outlier columns at full precision — equal to W up to the
    (tiny) error-feedback compensation they absorb from quantized
    neighbours (owq.py:348-386), far below the 2-bit quantization step —
    and more outliers never hurt the Hessian objective."""
    W, H = _problem(seed=3, rows=64, cols=256)
    # inflate some columns so the outlier pick is deterministic
    idx = np.array([5, 60, 130, 200])
    H[idx, idx] *= 1e3

    losses = []
    for n_out in (0, 2, 4, 8):
        Q = np.asarray(owq_quantize_weight(jnp.asarray(W), jnp.asarray(H), 2,
                                           n_out=n_out))
        losses.append(_hessian_loss(W, Q, H))
        if n_out >= 4:
            # the inflated columns must be among the preserved outliers:
            # full precision up to error-feedback compensation, which is
            # orders of magnitude below the 2-bit quantization step
            step = (W.max() - W.min()) / 3          # 2-bit step scale
            diff = np.abs(Q[:, idx] - W[:, idx]).max()
            assert diff < 0.02 * step, (n_out, diff, step)
    assert losses[1] < losses[0], losses
    assert losses[2] < losses[1], losses
    assert losses[3] < losses[2] * 1.001, losses
