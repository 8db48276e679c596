"""Flash-decode attention kernel vs the XLA split-attention path."""

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from amq_tpu.models.llama import _attention_split
from amq_tpu.ops.decode_attention import decode_attention_indexed


def _case(B=2, Hkv=4, G=2, hd=128, L=3, T=64, seed=0, window=None,
          offsets=(5, 63)):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.normal(size=(B, 1, Hkv * G, hd)).astype(np.float32))
    kc = jnp.asarray(rng.normal(size=(L, B, Hkv, T, hd)).astype(np.float32))
    vc = jnp.asarray(rng.normal(size=(L, B, Hkv, T, hd)).astype(np.float32))
    kn = jnp.asarray(rng.normal(size=(B, Hkv, 1, hd)).astype(np.float32))
    vn = jnp.asarray(rng.normal(size=(B, Hkv, 1, hd)).astype(np.float32))
    offs = jnp.asarray(offsets, jnp.int32)
    layer = jnp.int32(L - 1)

    want = _attention_split(q, kc[int(layer)], vc[int(layer)], kn, vn,
                            offs, window, jnp.float32)      # [B,1,Hq,hd]

    with pltpu.force_tpu_interpret_mode():
        got = decode_attention_indexed(
            q.reshape(B, Hkv, G, hd), kc, vc,
            kn.reshape(B, Hkv, hd), vn.reshape(B, Hkv, hd),
            offs, layer, window=window, out_dtype=jnp.float32)
    return np.asarray(want.reshape(B, Hkv, G, hd)), np.asarray(got)


def test_kernel_matches_split_attention():
    want, got = _case()
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_kernel_per_row_offsets_and_tiling():
    # T=96 forces the 32-wide T tiling; offsets hit tile boundaries + zero
    want, got = _case(B=3, Hkv=8, G=1, T=96, seed=1, offsets=(0, 32, 95))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_kernel_sliding_window():
    want, got = _case(B=2, Hkv=4, G=2, T=64, seed=2, window=16,
                      offsets=(10, 60))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)
