"""Pallas fused dequant-matmul vs the XLA reference path.

Runs in interpreter mode on CPU (pl.pallas_call(interpret=...) via
pltpu.force_tpu_interpret_mode); the real-TPU run is bench.py's job.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from amq_tpu.core import quantize as q
from amq_tpu.ops.quant_matmul import quant_matmul, quant_matmul_reference


@pytest.mark.parametrize("nbits", [2, 3, 4, 8])
@pytest.mark.parametrize("M", [1, 8, 32])
def test_matches_reference(nbits, M):
    rng = np.random.default_rng(0)
    N, K = 256, 512
    W = jnp.asarray(rng.normal(size=(N, K)).astype(np.float32))
    qt = q.quantize(W, nbits=nbits, group_size=128)
    x = jnp.asarray(rng.normal(size=(M, K)).astype(np.float32))

    want = quant_matmul_reference(x, qt)
    with pltpu.force_tpu_interpret_mode():
        got = quant_matmul(x, qt)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("nbits", [5, 6])
def test_parity_widths_route_to_xla(nbits):
    """5/6-bit (HQQ-width parity) have no kernel extraction — quant_matmul
    must fall back to the XLA dequant path rather than trace a kernel."""
    rng = np.random.default_rng(0)
    N, K = 256, 512
    W = jnp.asarray(rng.normal(size=(N, K)).astype(np.float32))
    qt = q.quantize(W, nbits=nbits, group_size=128)
    x = jnp.asarray(rng.normal(size=(4, K)).astype(np.float32))
    # no interpret context: a kernel trace would fail on CPU
    got = quant_matmul(x, qt)
    want = quant_matmul_reference(x, qt)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want))


@pytest.mark.parametrize("nbits", [2, 3, 4, 8])
@pytest.mark.parametrize("M", [1, 4])
def test_decode_gemv_bf16_matches_reference(nbits, M):
    """bf16 x selects the block-diagonal serving GEMV (single plane via
    the 256-scale recombination at 3-bit) — a separate code path from the
    f32 fma dequant exercised above."""
    rng = np.random.default_rng(1)
    N, K = 256, 512
    W = jnp.asarray(rng.normal(size=(N, K)).astype(np.float32) * 0.02)
    qt = q.quantize(W, nbits=nbits, group_size=128)
    x = jnp.asarray(rng.normal(size=(M, K)).astype(np.float32)
                    ).astype(jnp.bfloat16)

    want = quant_matmul_reference(x, qt, out_dtype=jnp.float32)
    with pltpu.force_tpu_interpret_mode():
        got = quant_matmul(x, qt, out_dtype=jnp.float32)
    scale = float(jnp.abs(want).max())
    np.testing.assert_allclose(np.asarray(got) / scale,
                               np.asarray(want) / scale, atol=2e-2)


@pytest.mark.parametrize("nbits", [2, 3, 4])
def test_indexed_stacked_matches_per_layer(nbits):
    from amq_tpu.ops.quant_matmul import quant_matmul_indexed

    rng = np.random.default_rng(2)
    L, N, K = 3, 256, 512
    qts = [q.quantize(jnp.asarray(rng.normal(size=(N, K)).astype(np.float32)),
                      nbits=nbits) for _ in range(L)]
    packed = jnp.stack([t.packed for t in qts])
    scale = jnp.stack([t.scale for t in qts])
    zero = jnp.stack([t.zero for t in qts])
    x = jnp.asarray(rng.normal(size=(1, K)).astype(np.float32))

    for i in range(L):
        with pltpu.force_tpu_interpret_mode():
            got = quant_matmul_indexed(
                x, packed, scale, zero, jnp.int32(i),
                nbits=nbits, group_size=128, shape=(N, K),
                superblock=qts[i].superblock_)
        want = quant_matmul_reference(x, qts[i])
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-4, atol=2e-4)


def test_swiglu_fused_matches_composition():
    from amq_tpu.ops.quant_matmul import quant_matmul_swiglu_indexed

    rng = np.random.default_rng(3)
    L, N, K = 2, 128, 256
    qts = [q.quantize(jnp.asarray(rng.normal(size=(N, K)).astype(np.float32)),
                      nbits=3) for _ in range(L)]
    packed = jnp.stack([t.packed for t in qts])
    scale = jnp.stack([t.scale for t in qts])
    zero = jnp.stack([t.zero for t in qts])
    g = jnp.asarray(rng.normal(size=(1, K)).astype(np.float32))
    u = jnp.asarray(rng.normal(size=(1, K)).astype(np.float32))

    for i in range(L):
        with pltpu.force_tpu_interpret_mode():
            got = quant_matmul_swiglu_indexed(
                g, u, packed, scale, zero, jnp.int32(i),
                nbits=3, group_size=128, shape=(N, K),
                superblock=qts[i].superblock_)
        act = jax.nn.silu(g) * u
        want = quant_matmul_reference(act, qts[i])
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-4, atol=2e-4)


def test_batched_leading_dims():
    rng = np.random.default_rng(1)
    N, K = 128, 256
    W = jnp.asarray(rng.normal(size=(N, K)).astype(np.float32))
    qt = q.quantize(W, nbits=4)
    x = jnp.asarray(rng.normal(size=(2, 3, K)).astype(np.float32))
    with pltpu.force_tpu_interpret_mode():
        got = quant_matmul(x, qt)
    want = quant_matmul_reference(x, qt)
    assert got.shape == (2, 3, N)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


def test_decode_gemv_bn2560_matches_reference():
    """Non-power-of-two decode n-tile (bn=2560, 20 lanes of 128): the tile
    13B's 5120-lane o/down sites pick (scripts/bisect12.py); exercises the
    blockdiag GEMV with a bn that is not a multiple of the 1024 superblock."""
    from amq_tpu.ops.quant_matmul import _quant_matmul_packed

    rng = np.random.default_rng(7)
    N, K = 2560, 512
    W = jnp.asarray(rng.normal(size=(N, K)).astype(np.float32) * 0.02)
    qt = q.quantize(W, nbits=4, group_size=128)
    x = jnp.asarray(rng.normal(size=(1, K)).astype(np.float32)
                    ).astype(jnp.bfloat16)

    want = quant_matmul_reference(x, qt, out_dtype=jnp.float32)
    with pltpu.force_tpu_interpret_mode():
        got = _quant_matmul_packed(
            x, qt.packed, qt.scale, qt.zero, nbits=4, group_size=128,
            shape=qt.shape, superblock=qt.superblock_, block_n=2560,
            acc_dtype=jnp.bfloat16, out_dtype=jnp.float32)[:1, :N]
    scale = float(jnp.abs(want).max())
    np.testing.assert_allclose(np.asarray(got) / scale,
                               np.asarray(want) / scale, atol=2e-2)


@pytest.mark.parametrize("nbits", [2, 3, 4])
@pytest.mark.parametrize("n_sb", [2, 3])
def test_decode_gemv_ksub_matches_reference(nbits, n_sb, monkeypatch):
    """AMQ_KSUB=2: two superblocks per decode grid step (per-step fixed-
    cost amortization).  n_sb=3 exercises the non-divisible fallback."""
    from amq_tpu.ops import quant_matmul as qm

    monkeypatch.setattr(qm, "_KSUB_DEFAULT", 2)
    rng = np.random.default_rng(11 + nbits + n_sb)
    N, K = 256, 1024 * n_sb
    W = jnp.asarray(rng.normal(size=(N, K)).astype(np.float32) * 0.02)
    qt = q.quantize(W, nbits=nbits, group_size=128)
    assert qt.superblock_ == 1024 and K // qt.superblock_ == n_sb
    packed = jnp.stack([qt.packed])
    scale = jnp.stack([qt.scale])
    zero = jnp.stack([qt.zero])
    x = jnp.asarray(rng.normal(size=(1, K)).astype(np.float32)
                    ).astype(jnp.bfloat16)

    want = quant_matmul_reference(x, qt, out_dtype=jnp.float32)
    with pltpu.force_tpu_interpret_mode():
        got = qm.quant_matmul_indexed(
            x, packed, scale, zero, jnp.int32(0),
            nbits=nbits, group_size=128, shape=(N, K),
            superblock=qt.superblock_, acc_dtype=jnp.bfloat16,
            out_dtype=jnp.float32)
    scale_f = float(jnp.abs(want).max())
    np.testing.assert_allclose(np.asarray(got) / scale_f,
                               np.asarray(want) / scale_f, atol=2e-2)


def test_swiglu_ksub_matches_composition(monkeypatch):
    from amq_tpu.ops import quant_matmul as qm

    monkeypatch.setattr(qm, "_KSUB_DEFAULT", 2)
    rng = np.random.default_rng(13)
    N, K = 128, 2048
    qt = q.quantize(jnp.asarray(rng.normal(size=(N, K)).astype(np.float32)
                                * 0.02), nbits=4)
    g = (jnp.asarray(rng.normal(size=(1, K)).astype(np.float32))
         ).astype(jnp.bfloat16)
    u = (jnp.asarray(rng.normal(size=(1, K)).astype(np.float32))
         ).astype(jnp.bfloat16)
    with pltpu.force_tpu_interpret_mode():
        got = qm.quant_matmul_swiglu_indexed(
            g, u, jnp.stack([qt.packed]), jnp.stack([qt.scale]),
            jnp.stack([qt.zero]), jnp.int32(0),
            nbits=4, group_size=128, shape=(N, K),
            superblock=qt.superblock_, acc_dtype=jnp.bfloat16,
            out_dtype=jnp.float32)
    act = (jax.nn.silu(g.astype(jnp.float32))
           * u.astype(jnp.float32)).astype(jnp.bfloat16)
    want = quant_matmul_reference(act, qt, out_dtype=jnp.float32)
    scale_f = float(jnp.abs(want).max())
    np.testing.assert_allclose(np.asarray(got) / scale_f,
                               np.asarray(want) / scale_f, atol=2e-2)


@pytest.mark.parametrize("nbits", [2, 3, 4])
def test_pipelined_indexed_matches_reference(nbits, monkeypatch):
    """Opt-in software-pipelined decode GEMV (AMQ_PIPE=1): parity with the
    XLA reference.  Measured 2x SLOWER than the value-fed production path
    on chip (docs/ROADMAP.md r4 dead ends) — kept for re-evaluation on
    future Mosaic toolchains, so keep it from rotting."""
    import amq_tpu.ops.quant_matmul as qm_mod
    from amq_tpu.ops.quant_matmul import (quant_matmul_indexed,
                                          quant_matmul_swiglu_indexed)

    monkeypatch.setattr(qm_mod, "_PIPE_DEFAULT", 1)
    rng = np.random.default_rng(4)
    L, N, K = 2, 256, 1024
    qts = [q.quantize(jnp.asarray(rng.normal(size=(N, K)).astype(np.float32)),
                      nbits=nbits) for _ in range(L)]
    assert qts[0].superblock_ == 1024      # T=8 -> pipe path active
    packed = jnp.stack([t.packed for t in qts])
    scale = jnp.stack([t.scale for t in qts])
    zero = jnp.stack([t.zero for t in qts])
    x = jnp.asarray(rng.normal(size=(1, K))).astype(jnp.bfloat16)

    for i in range(L):
        with pltpu.force_tpu_interpret_mode():
            got = quant_matmul_indexed(
                x, packed, scale, zero, jnp.int32(i),
                nbits=nbits, group_size=128, shape=(N, K),
                superblock=1024, acc_dtype=jnp.bfloat16)
        want = quant_matmul_reference(x, qts[i], out_dtype=jnp.float32)
        scl = float(jnp.abs(want).max())
        np.testing.assert_allclose(np.asarray(got, np.float32) / scl,
                                   np.asarray(want) / scl, atol=2e-2)

    # swiglu-fused pipe path
    gate = jnp.asarray(rng.normal(size=(1, K))).astype(jnp.bfloat16)
    up = jnp.asarray(rng.normal(size=(1, K))).astype(jnp.bfloat16)
    with pltpu.force_tpu_interpret_mode():
        got = quant_matmul_swiglu_indexed(
            gate, up, packed, scale, zero, jnp.int32(0),
            nbits=nbits, group_size=128, shape=(N, K),
            superblock=1024, acc_dtype=jnp.bfloat16)
    xs = (gate.astype(jnp.float32) * jax.nn.sigmoid(gate.astype(jnp.float32))
          * up.astype(jnp.float32)).astype(jnp.bfloat16)
    want = quant_matmul_reference(xs, qts[0], out_dtype=jnp.float32)
    scl = float(jnp.abs(want).max())
    np.testing.assert_allclose(np.asarray(got, np.float32) / scl,
                               np.asarray(want) / scl, atol=2e-2)
