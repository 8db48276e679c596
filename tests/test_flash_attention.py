"""Flash prefill attention kernel vs the naive XLA reference.

Covers the unaligned-cache regime: ``attention_append`` calls the kernel
with T = cache max_len, which need not be a multiple of the k-tile
(bench's prefill-2048 runs T=2056).  flash_attention zero-pads T to the
tile internally; pads must be causally masked, never attended.
"""

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from amq_tpu.ops.flash_attention import (flash_attention,
                                         flash_attention_reference)


def _case(B=1, Hq=4, Hkv=2, S=128, T=128, d=128, offset=0, seed=0, **kw):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.normal(size=(B, Hq, S, d)).astype(np.float32))
    # only positions < offset + S are real; the tail (if any) is junk the
    # causal mask must hide
    k = jnp.asarray(rng.normal(size=(B, Hkv, T, d)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(B, Hkv, T, d)).astype(np.float32))
    off = jnp.int32(offset)
    want = flash_attention_reference(q, k, v, off)
    with pltpu.force_tpu_interpret_mode():
        got = flash_attention(q, k, v, off, **kw)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


def test_aligned():
    _case(S=128, T=128)


def test_unaligned_t_small():
    # T % 64 != 0 and T < block_k: bk = round_up(T, 64)
    _case(S=128, T=136)


def test_unaligned_t_multi_tile():
    # the bench regression: T % 64 == 0 but T % block_k != 0
    _case(S=128, T=320, block_k=256)


def test_unaligned_t_with_offset():
    # prefill-with-cache: queries start at offset, cache tail unaligned
    _case(S=128, T=200, offset=64)


def test_gqa_multi_batch():
    _case(B=2, Hq=8, Hkv=2, S=256, T=264, offset=8, block_q=128,
          block_k=128)
