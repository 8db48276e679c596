"""StackedModel (scan-over-layers) must match the per-layer python-loop
forward, with and without KV cache, across mixed-bit selections."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from amq_tpu.models import (
    KVCache, build_switch_model, forward, get_config, init_params,
    quantize_model, set_arch as set_switch_arch,
)
from amq_tpu.models.config import LINEAR_NAMES
from amq_tpu.models import stacked


@pytest.fixture(scope="module")
def setup():
    cfg = get_config("tiny-llama")
    params = init_params(cfg, jax.random.PRNGKey(0))
    bits_range = [2, 3, 4]
    proxies = [quantize_model(params, cfg, b) for b in bits_range]
    return cfg, params, bits_range, proxies


def _rand_arch(cfg, bits_range, seed):
    rng = np.random.default_rng(seed)
    return {"linear": {l: rng.choice(bits_range, cfg.num_layers).tolist()
                       for l in LINEAR_NAMES}}


@pytest.mark.slow
def test_stacked_matches_switch_forward(setup):
    cfg, params, bits_range, proxies = setup
    arch = _rand_arch(cfg, bits_range, 0)
    model = stacked.stack_proxies(proxies, bits_range, arch)
    switch = set_switch_arch(build_switch_model(proxies, bits_range), arch,
                             bits_range)
    tokens = jnp.arange(10, dtype=jnp.int32)[None] % cfg.vocab_size
    got, _ = stacked.forward_stacked(model, cfg, tokens,
                                     compute_dtype=jnp.float32)
    want, _ = forward(switch, cfg, tokens, compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


def test_stacked_set_arch_no_retrace(setup):
    cfg, params, bits_range, proxies = setup
    # per-site random archs mix bits inside q/k/v -> needs the unfused form
    model = stacked.stack_proxies(proxies, bits_range, fuse="never")
    count = {"n": 0}

    @jax.jit
    def run(m, toks):
        count["n"] += 1
        return stacked.forward_stacked(m, cfg, toks,
                                       compute_dtype=jnp.float32)[0]

    toks = jnp.zeros((1, 4), jnp.int32)
    run(model, toks)
    run(stacked.set_arch(model, _rand_arch(cfg, bits_range, 1)), toks)
    run(stacked.set_arch(model, _rand_arch(cfg, bits_range, 2)), toks)
    assert count["n"] == 1


@pytest.mark.slow
def test_stacked_decode_with_cache_matches_full(setup):
    cfg, params, bits_range, proxies = setup
    arch = _rand_arch(cfg, bits_range, 3)
    model = stacked.stack_proxies(proxies, bits_range, arch)
    rng = np.random.default_rng(4)
    tokens = jnp.asarray(rng.integers(0, cfg.vocab_size, (1, 9)).astype(np.int32))

    full, _ = stacked.forward_stacked(model, cfg, tokens,
                                      compute_dtype=jnp.float32)
    cache = KVCache.create(cfg, 1, 16, dtype=jnp.float32)
    l_pre, cache = stacked.forward_stacked(model, cfg, tokens[:, :5],
                                           cache=cache,
                                           compute_dtype=jnp.float32)
    outs = [l_pre]
    for i in range(5, 9):
        l, cache = stacked.forward_stacked(model, cfg, tokens[:, i:i + 1],
                                           cache=cache,
                                           compute_dtype=jnp.float32)
        outs.append(l)
    inc = jnp.concatenate(outs, axis=1)
    np.testing.assert_allclose(np.asarray(full), np.asarray(inc),
                               rtol=2e-4, atol=2e-4)


def test_stack_proxies_factories_match_lists(setup):
    """Elements of ``proxies`` may be zero-arg factories (7B memory
    staging: one per-bit proxy resident at a time); the folded model must
    be identical to the list-of-pytrees path."""
    cfg, params, bits_range, proxies = setup
    arch = _rand_arch(cfg, bits_range, 5)
    want = stacked.stack_proxies(proxies, bits_range, arch)
    got = stacked.stack_proxies([(lambda p=p: p) for p in proxies],
                                bits_range, arch)
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(b)),
        want, got)


@pytest.mark.slow
def test_stack_proxies_mesh_replicated_device(setup):
    """``device`` may be a NamedSharding: every dense part lands mesh-
    replicated and the forward runs against data-sharded tokens without
    a mixed-placement error."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    cfg, params, bits_range, proxies = setup
    arch = _rand_arch(cfg, bits_range, 6)
    mesh = Mesh(np.array(jax.devices()[:8]), ("data",))
    rep = NamedSharding(mesh, P())
    model = stacked.stack_proxies(proxies, bits_range, arch, device=rep)
    assert model.embed.sharding.is_equivalent_to(rep, model.embed.ndim)
    toks = jnp.asarray(np.random.default_rng(0).integers(
        0, cfg.vocab_size, (8, 6)).astype(np.int32))
    toks = jax.device_put(toks, NamedSharding(mesh, P("data", None)))
    got, _ = jax.jit(lambda m, t: stacked.forward_stacked(
        m, cfg, t, compute_dtype=jnp.float32))(model, toks)
    want, _ = stacked.forward_stacked(
        stacked.stack_proxies(proxies, bits_range, arch), cfg,
        jnp.asarray(np.asarray(toks)), compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


@pytest.mark.slow
def test_quantized_head_matches_dense(setup):
    """stack_proxies(head_bits=8): logits from the packed 8-bit head must
    track the dense head closely (8-bit group quantization is ~lossless
    relative to the logit scale) and argmax-agree on a greedy step."""
    cfg, params, bits_range, proxies = setup
    arch = _rand_arch(cfg, bits_range, 7)
    dense = stacked.stack_proxies(proxies, bits_range, arch)
    q8 = stacked.stack_proxies(proxies, bits_range, arch, head_bits=8,
                               head_meta_dtype=jnp.float32)
    assert q8.lm_head_qt is not None
    # lane padding to the decode n-tile, logical vocab preserved
    assert q8.lm_head_qt.shape[0] == cfg.vocab_size

    tokens = jnp.arange(12, dtype=jnp.int32)[None] % cfg.vocab_size
    want, _ = stacked.forward_stacked(dense, cfg, tokens,
                                      compute_dtype=jnp.float32)
    got, _ = stacked.forward_stacked(q8, cfg, tokens,
                                     compute_dtype=jnp.float32)
    scale = float(jnp.abs(want).max())
    err = float(jnp.abs(got - want).max())
    assert err < 0.01 * scale, (err, scale)
    np.testing.assert_array_equal(np.asarray(jnp.argmax(got, -1)),
                                  np.asarray(jnp.argmax(want, -1)))


def test_pick_lane_pad_calibrated_rule():
    """The decode n-tile lane-pad rule, pinned to the in-model bench
    calibration (docs/ROADMAP.md): 2560 beats 2048 only at equal-or-
    smaller pad; padding up to 2048 over 1024 is kept; pad <= n/7."""
    from amq_tpu.models.stacked import _pick_lane_pad

    # (N, expected Np) per measured model site
    cases = {
        12288: 12288,   # 7B qkv: 2048 pad 0 (NOT 2560 pad 512 — regressed)
        22016: 22528,   # 7B gateup: 2048 pad 512 over 2560 pad 1024
        15360: 15360,   # 13B qkv: 2560 pad 0 over 2048 pad 1024
        5120: 5120,     # 13B o/down: 2560x2 (2048 pad out of bound)
        27648: 28160,   # 13B gateup: 2560 pad 512 < 2048 pad 1024
        4608: 5120,     # Qwen2.5-7B qkv: 2560 pad 512 (2048 out of bound)
        3584: 4096,     # Qwen o/down: 2048 pad 512 (the 67->112 fix)
        28672: 28672,   # Llama-3 gateup: 2048 pad 0 (2560 pad too big)
        10240: 10240,   # 70B qkv: both pad 0 -> fewer steps (2560)
        3072: 3072,     # no big tile within bound -> 1024 pad 0
    }
    for n, np_expect in cases.items():
        assert n + _pick_lane_pad(n) == np_expect, n
