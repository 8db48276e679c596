"""Decoder forward: shapes, causality, KV-cache/teacher-forcing equivalence,
quantized and switch-model paths."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from amq_tpu.models import (
    KVCache, apply_linear, build_switch_model, forward, get_config,
    init_params, quantize_model, set_arch, uniform_arch,
)
from amq_tpu.models.config import LINEAR_NAMES


@pytest.fixture(scope="module")
def tiny():
    cfg = get_config("tiny-llama")
    params = init_params(cfg, jax.random.PRNGKey(0))
    return cfg, params


def test_forward_shapes(tiny):
    cfg, params = tiny
    tokens = jnp.arange(12, dtype=jnp.int32).reshape(2, 6) % cfg.vocab_size
    logits, cache = forward(params, cfg, tokens)
    assert logits.shape == (2, 6, cfg.vocab_size)
    assert cache is None
    assert bool(jnp.all(jnp.isfinite(logits)))


def test_causality(tiny):
    cfg, params = tiny
    rng = np.random.default_rng(0)
    t1 = rng.integers(0, cfg.vocab_size, (1, 8)).astype(np.int32)
    t2 = t1.copy()
    t2[0, -1] = (t2[0, -1] + 7) % cfg.vocab_size  # change only last token
    l1, _ = forward(params, cfg, jnp.asarray(t1))
    l2, _ = forward(params, cfg, jnp.asarray(t2))
    np.testing.assert_allclose(np.asarray(l1[0, :-1]), np.asarray(l2[0, :-1]),
                               rtol=1e-5, atol=1e-5)
    assert not np.allclose(np.asarray(l1[0, -1]), np.asarray(l2[0, -1]))


@pytest.mark.slow
def test_kv_cache_matches_full_forward(tiny):
    cfg, params = tiny
    rng = np.random.default_rng(1)
    tokens = jnp.asarray(rng.integers(0, cfg.vocab_size, (1, 10)).astype(np.int32))
    full, _ = forward(params, cfg, tokens)

    cache = KVCache.create(cfg, batch=1, max_len=16, dtype=jnp.float32)
    # prefill 6, then decode 4 one-by-one
    logits_p, cache = forward(params, cfg, tokens[:, :6], cache=cache)
    step_logits = [logits_p]
    for i in range(6, 10):
        l, cache = forward(params, cfg, tokens[:, i:i + 1], cache=cache)
        step_logits.append(l)
    inc = jnp.concatenate(step_logits, axis=1)
    np.testing.assert_allclose(np.asarray(full), np.asarray(inc),
                               rtol=2e-4, atol=2e-4)


def test_qwen_variant_runs():
    cfg = get_config("tiny-qwen2")
    params = init_params(cfg, jax.random.PRNGKey(1))
    assert "lm_head" not in params  # tied
    tokens = jnp.zeros((1, 4), jnp.int32)
    logits, _ = forward(params, cfg, tokens)
    assert logits.shape == (1, 4, cfg.vocab_size)


def test_quantized_model_close_to_dense(tiny):
    cfg, params = tiny
    qparams = quantize_model(params, cfg, 8)
    tokens = jnp.arange(6, dtype=jnp.int32)[None]
    ld, _ = forward(params, cfg, tokens)
    lq, _ = forward(qparams, cfg, tokens)
    # 8-bit should be near-lossless
    assert float(jnp.mean(jnp.abs(ld - lq))) < 0.05


@pytest.mark.slow
def test_switch_model_matches_stitched(tiny):
    cfg, params = tiny
    bits_range = [2, 3, 4]
    proxies = [quantize_model(params, cfg, b) for b in bits_range]
    switch = build_switch_model(proxies, bits_range)

    rng = np.random.default_rng(2)
    arch = {"linear": {l: rng.choice(bits_range, cfg.num_layers).tolist()
                       for l in LINEAR_NAMES}}
    switch = set_arch(switch, arch, bits_range)
    tokens = jnp.arange(5, dtype=jnp.int32)[None]
    l_switch, _ = forward(switch, cfg, tokens)

    # manual stitch: per-site copy from the matching proxy
    stitched = {k: v for k, v in proxies[-1].items()}
    stitched["layers"] = []
    for i in range(cfg.num_layers):
        layer = dict(proxies[-1]["layers"][i])
        for name in LINEAR_NAMES:
            j = bits_range.index(arch["linear"][name][i])
            layer[name] = proxies[j]["layers"][i][name]
        stitched["layers"].append(layer)
    l_stitch, _ = forward(stitched, cfg, tokens)
    np.testing.assert_allclose(np.asarray(l_switch), np.asarray(l_stitch),
                               rtol=1e-6, atol=1e-6)


@pytest.mark.slow
def test_set_arch_does_not_retrace(tiny):
    cfg, params = tiny
    bits_range = [2, 3, 4]
    proxies = [quantize_model(params, cfg, b) for b in bits_range]
    switch = build_switch_model(proxies, bits_range)

    count = {"n": 0}

    @jax.jit
    def run(p, tokens):
        count["n"] += 1
        return forward(p, cfg, tokens)[0]

    tokens = jnp.zeros((1, 4), jnp.int32)
    run(switch, tokens)
    for bits in ([2] * cfg.num_layers, [4] * cfg.num_layers):
        arch = {"linear": {l: list(bits) for l in LINEAR_NAMES}}
        run(set_arch(switch, arch, bits_range), tokens)
    assert count["n"] == 1, f"retraced {count['n']} times"


def test_forward_dense_matches_unrolled(tiny):
    """Dense scan-over-layers forward (llama.forward_dense) must equal the
    unrolled forward bit-for-bit in structure (same blocks, same dtypes);
    required for the FP16 logit cache at 7B+ (remote compiler size limit)."""
    from amq_tpu.models import llama
    cfg, params = tiny
    toks = jnp.asarray(
        np.random.default_rng(3).integers(0, cfg.vocab_size, (2, 32)),
        jnp.int32)
    ref, _ = llama.forward(params, cfg, toks)
    stacked = llama.stack_dense(params)
    out, _ = llama.forward_dense(stacked, cfg, toks)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.slow
def test_forward_dense_cache_matches(tiny):
    """Incremental prefill+decode through forward_dense == full forward."""
    from amq_tpu.models import llama
    cfg, params = tiny
    rng = np.random.default_rng(4)
    toks = jnp.asarray(rng.integers(0, cfg.vocab_size, (1, 12)), jnp.int32)
    full, _ = llama.forward(params, cfg, toks)
    stacked = llama.stack_dense(params)
    cache = llama.KVCache.create(cfg, 1, 16, dtype=jnp.float32)
    lp, cache = llama.forward_dense(stacked, cfg, toks[:, :8], cache=cache)
    ld, cache = llama.forward_dense(stacked, cfg, toks[:, 8:], cache=cache)
    np.testing.assert_allclose(np.asarray(ld[:, -1]),
                               np.asarray(full[:, -1]), rtol=1e-4, atol=1e-4)


def test_forward_dense_qwen_bias():
    """qkv_bias + tied embeddings path through the dense scan."""
    from amq_tpu.models import llama
    cfg = get_config("tiny-qwen2")
    params = init_params(cfg, jax.random.PRNGKey(1))
    toks = jnp.asarray(
        np.random.default_rng(5).integers(0, cfg.vocab_size, (1, 16)),
        jnp.int32)
    ref, _ = llama.forward(params, cfg, toks)
    out, _ = llama.forward_dense(llama.stack_dense(params), cfg, toks)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)
