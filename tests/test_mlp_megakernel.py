"""Whole-MLP megakernel (gateup + SwiGLU + down in one pallas_call) vs
the separate-kernel decode path and the XLA reference."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from amq_tpu.core import quantize as q
from amq_tpu.ops.quant_matmul import (
    quant_matmul_indexed, quant_matmul_swiglu_indexed,
    quant_matmul_mlp_indexed, quant_matmul_reference)

HID, INTER, SB, GROUP, L = 512, 384, 128, 128, 2


def _stacks(nbits, seed):
    rng = np.random.default_rng(seed)
    gu_qts, d_qts = [], []
    for _ in range(L):
        Wgu = jnp.asarray(rng.normal(size=(2 * INTER, HID)).astype(np.float32)
                          * 0.05)
        Wd = jnp.asarray(rng.normal(size=(HID, INTER)).astype(np.float32)
                         * 0.05)
        gu_qts.append(q.quantize(Wgu, nbits=nbits, group_size=GROUP,
                                 superblock=SB))
        d_qts.append(q.quantize(Wd, nbits=nbits, group_size=GROUP,
                                superblock=SB))

    def stack(qts):
        return (jnp.stack([t.packed for t in qts]),
                jnp.stack([t.scale for t in qts]),
                jnp.stack([t.zero for t in qts]))

    return gu_qts, d_qts, stack(gu_qts), stack(d_qts)


@pytest.mark.parametrize("nbits", [2, 3, 4])
@pytest.mark.parametrize("M", [1, 4])
def test_merged_matches_separate_kernels(nbits, M):
    """The megakernel must reproduce the separate gateup-then-swiglu-down
    kernel chain (same accumulation dtype/order) near bit-exactly."""
    gu_qts, d_qts, (gup, gus, guz), (dp, ds, dz) = _stacks(nbits, seed=nbits)
    rng = np.random.default_rng(10 + nbits)
    x = jnp.asarray(rng.normal(size=(M, HID)).astype(np.float32)
                    ).astype(jnp.bfloat16)

    for layer in range(L):
        li = jnp.int32(layer)
        with pltpu.force_tpu_interpret_mode():
            gu = quant_matmul_indexed(
                x, gup, gus, guz, li, nbits=nbits, group_size=GROUP,
                shape=(2 * INTER, HID), superblock=SB,
                acc_dtype=jnp.bfloat16, out_dtype=jnp.bfloat16)
            want = quant_matmul_swiglu_indexed(
                gu[:, :INTER], gu[:, INTER:], dp, ds, dz, li,
                nbits=nbits, group_size=GROUP, shape=(HID, INTER),
                superblock=SB, acc_dtype=jnp.bfloat16,
                out_dtype=jnp.float32)
            got = quant_matmul_mlp_indexed(
                x, gup, gus, guz, dp, ds, dz, li,
                nbits=nbits, group_size=GROUP,
                gu_shape=(2 * INTER, HID), d_shape=(HID, INTER),
                superblock=SB, out_dtype=jnp.float32)
        scale = float(jnp.abs(want).max()) or 1.0
        np.testing.assert_allclose(np.asarray(got) / scale,
                                   np.asarray(want) / scale, atol=2e-3)


def test_merged_matches_xla_reference():
    """Coarse end-to-end check against the f32 dequant-then-matmul path."""
    nbits = 4
    gu_qts, d_qts, (gup, gus, guz), (dp, ds, dz) = _stacks(nbits, seed=99)
    rng = np.random.default_rng(42)
    x32 = jnp.asarray(rng.normal(size=(1, HID)).astype(np.float32))
    x = x32.astype(jnp.bfloat16)

    gu = quant_matmul_reference(x32, gu_qts[1], out_dtype=jnp.float32)
    gate, up = gu[:, :INTER], gu[:, INTER:]
    act = gate * (1 / (1 + np.exp(-np.asarray(gate)))) * up
    want = quant_matmul_reference(jnp.asarray(act), d_qts[1],
                                  out_dtype=jnp.float32)
    with pltpu.force_tpu_interpret_mode():
        got = quant_matmul_mlp_indexed(
            x, gup, gus, guz, dp, ds, dz, jnp.int32(1),
            nbits=nbits, group_size=GROUP,
            gu_shape=(2 * INTER, HID), d_shape=(HID, INTER),
            superblock=SB, out_dtype=jnp.float32)
    scale = float(jnp.abs(want).max())
    np.testing.assert_allclose(np.asarray(got) / scale,
                               np.asarray(want) / scale, atol=3e-2)
