"""Fused q/k/v + gate/up stacking must match the unfused stacked forward."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from amq_tpu.models import get_config, init_params, quantize_model
from amq_tpu.models.config import LINEAR_NAMES
from amq_tpu.models import stacked


def _layer_uniform_arch(cfg, bits_range, seed):
    rng = np.random.default_rng(seed)
    per_layer = rng.choice(bits_range, cfg.num_layers)
    return {"linear": {l: per_layer.tolist() for l in LINEAR_NAMES}}


@pytest.mark.slow
def test_fused_matches_unfused():
    cfg = get_config("tiny-llama")
    params = init_params(cfg, jax.random.PRNGKey(0))
    bits_range = [2, 3, 4]
    proxies = [quantize_model(params, cfg, b) for b in bits_range]
    arch = _layer_uniform_arch(cfg, bits_range, 1)

    fused = stacked.stack_proxies(proxies, bits_range, arch, fuse="auto")
    plain = stacked.stack_proxies(proxies, bits_range, arch, fuse="never")
    assert "self_attn.qkv_proj" in fused.sites
    assert "self_attn.q_proj" in plain.sites

    toks = jnp.arange(8, dtype=jnp.int32)[None] % cfg.vocab_size
    got, _ = stacked.forward_stacked(fused, cfg, toks,
                                     compute_dtype=jnp.float32)
    want, _ = stacked.forward_stacked(plain, cfg, toks,
                                      compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_mixed_group_bits_falls_back_to_unfused():
    cfg = get_config("tiny-llama")
    params = init_params(cfg, jax.random.PRNGKey(1))
    bits_range = [2, 3, 4]
    proxies = [quantize_model(params, cfg, b) for b in bits_range]
    arch = {"linear": {l: [3] * cfg.num_layers for l in LINEAR_NAMES}}
    arch["linear"]["self_attn.k_proj"] = [2] * cfg.num_layers  # breaks fusion
    model = stacked.stack_proxies(proxies, bits_range, arch, fuse="auto")
    assert "self_attn.qkv_proj" not in model.sites


def test_set_arch_on_fused_asserts_on_mixed_groups():
    cfg = get_config("tiny-llama")
    params = init_params(cfg, jax.random.PRNGKey(2))
    bits_range = [2, 3, 4]
    proxies = [quantize_model(params, cfg, b) for b in bits_range]
    model = stacked.stack_proxies(proxies, bits_range, fuse="always")
    bad = {"linear": {l: [3] * cfg.num_layers for l in LINEAR_NAMES}}
    bad["linear"]["mlp.up_proj"] = [4] * cfg.num_layers
    with pytest.raises(AssertionError):
        stacked.set_arch(model, bad)


@pytest.mark.slow
def test_merge_containers_matches_unmerged():
    """Container-merged model (3-bit in nibble containers collapsed into
    the 4-bit branch, compact slot-indexed stacks) must produce identical
    logits to the unmerged switch model."""
    import jax
    import numpy as np
    from amq_tpu.models import get_config, init_params, quantize_model
    from amq_tpu.models.stacked import (SERVE_CONTAINERS, forward_stacked,
                                        merge_containers, stack_proxies)

    cfg = get_config("tiny-llama")
    params = init_params(cfg, jax.random.PRNGKey(0))
    bits = (2, 3, 4)
    proxies = [quantize_model(params, cfg, b) for b in bits]
    arch = {"linear": {n: [bits[i % 3] for i in range(cfg.num_layers)]
                       for n in cfg.topology()["linear"]}}
    base = stack_proxies(proxies, bits, arch,
                         container_bits=SERVE_CONTAINERS)
    merged = merge_containers(base)
    assert merged.bits_range == (2, 4)
    assert merged.sites["self_attn.qkv_proj"][1].packed.shape[0] == \
        sum(1 for i in range(cfg.num_layers) if bits[i % 3] in (3, 4))

    toks = jnp.arange(8, dtype=jnp.int32)[None]
    a, _ = forward_stacked(base, cfg, toks)
    b, _ = forward_stacked(merged, cfg, toks)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=1e-6, atol=1e-6)
