"""LoRA adapters over quantized linears: apply and merge consistency."""

import numpy as np
import jax
import jax.numpy as jnp

from amq_tpu.core import quantize as qcore
from amq_tpu.core.lora import apply_lora_linear, init_adapter, merge_adapter
from amq_tpu.models.linear import QuantLinear, apply_linear


def test_zero_init_is_identity():
    rng = np.random.default_rng(0)
    W = jnp.asarray(rng.normal(size=(128, 256)).astype(np.float32))
    p = QuantLinear(qt=qcore.quantize(W, nbits=4))
    x = jnp.asarray(rng.normal(size=(3, 256)).astype(np.float32))
    ad = init_adapter(jax.random.PRNGKey(0), 256, 128, rank=4)
    np.testing.assert_allclose(np.asarray(apply_lora_linear(p, ad, x)),
                               np.asarray(apply_linear(p, x)), rtol=1e-6)


def test_merge_matches_apply():
    rng = np.random.default_rng(1)
    W = jnp.asarray(rng.normal(size=(128, 256)).astype(np.float32))
    p = QuantLinear(qt=qcore.quantize(W, nbits=8))
    ad = init_adapter(jax.random.PRNGKey(1), 256, 128, rank=4)
    ad = ad.__class__(A=ad.A, B=jnp.asarray(
        rng.normal(size=(4, 128)).astype(np.float32)) * 0.01,
        scaling=ad.scaling)
    x = jnp.asarray(rng.normal(size=(3, 256)).astype(np.float32))
    want = apply_lora_linear(p, ad, x)
    merged = merge_adapter(p, ad)
    got = apply_linear(merged, x)
    # requantization at 8-bit adds error ~ sqrt(in_dim) * quant step
    assert float(jnp.mean(jnp.abs(got - want))) < 0.2
    # and the adapter's effect is actually present (not a no-op merge)
    base = apply_linear(p, x)
    assert float(jnp.mean(jnp.abs(got - base))) > 0.01
