"""TP x stacked-scan parity: the sharded serving model must reproduce the
unsharded stacked forward exactly (up to psum reordering) — VERDICT r2
item 2.  Covers prefill, decode chains, mixed-bit container-merged
models, the vocab-sharded quantized head, uneven intermediate splits,
and the composed (data x tensor) mesh."""

import dataclasses

import numpy as np
import pytest

pytestmark = pytest.mark.slow
import jax
import jax.numpy as jnp

from amq_tpu.models import get_config, init_params, quantize_model
from amq_tpu.models.llama import KVCache
from amq_tpu.models.stacked import (SERVE_CONTAINERS, forward_stacked,
                                    merge_containers, stack_proxies)
from amq_tpu.parallel import tp_stacked as tps

BITS = (2, 3, 4)


def _build(cfg, seed=1):
    params = init_params(cfg, jax.random.PRNGKey(seed))
    return params, [quantize_model(params, cfg, b, optimize=False)
                    for b in BITS]


def _arch(cfg, pattern):
    bits = [pattern[i % len(pattern)] for i in range(cfg.num_layers)]
    from amq_tpu.models.config import LINEAR_NAMES
    return {"linear": {n: list(bits) for n in LINEAR_NAMES}}


def _ref_logits(model, cfg, toks, T=32, steps=0):
    cache = KVCache.create(cfg, batch=toks.shape[0], max_len=T,
                           dtype=jnp.float32)
    fwd = jax.jit(lambda m, t, c: forward_stacked(
        m, cfg, t, cache=c, compute_dtype=jnp.float32))
    logits, cache = fwd(model, jnp.asarray(toks), cache)
    outs = [np.asarray(logits)]
    tok = jnp.argmax(logits[:, -1, :], axis=-1).astype(jnp.int32)
    for _ in range(steps):
        logits, cache = fwd(model, tok[:, None], cache)
        outs.append(np.asarray(logits))
        tok = jnp.argmax(logits[:, -1, :], axis=-1).astype(jnp.int32)
    return outs


def _tp_logits(cfg, proxies, arch, tp, toks, T=32, steps=0, data=1,
               **stack_kw):
    mesh = tps.make_tp_mesh(tp, data=data)
    model = tps.stack_proxies_tp(proxies, BITS, cfg, tp, arch=arch,
                                 mesh=mesh, **stack_kw)
    fwd = jax.jit(tps.make_tp_forward_stacked(
        cfg, mesh, model, compute_dtype=jnp.float32))
    cache = tps.new_tp_cache(cfg, tp, toks.shape[0], T, dtype=jnp.float32,
                             mesh=mesh)
    logits, cache = fwd(model, jnp.asarray(toks), cache)
    outs = [np.asarray(logits)]
    tok = jnp.argmax(logits[:, -1, :], axis=-1).astype(jnp.int32)
    for _ in range(steps):
        logits, cache = fwd(model, tok[:, None], cache)
        outs.append(np.asarray(logits))
        tok = jnp.argmax(logits[:, -1, :], axis=-1).astype(jnp.int32)
    return outs


@pytest.fixture(scope="module")
def setup():
    cfg = get_config("graft-tp")
    params, proxies = _build(cfg)
    toks = np.random.default_rng(0).integers(
        0, cfg.vocab_size, (2, 16)).astype(np.int32)
    return cfg, proxies, toks


@pytest.mark.parametrize("tp", [2, 4])
def test_tp_stacked_prefill_parity(setup, tp):
    cfg, proxies, toks = setup
    arch = _arch(cfg, (2, 3, 4))
    ref = _ref_logits(stack_proxies(proxies, BITS, arch=arch), cfg, toks)[0]
    got = _tp_logits(cfg, proxies, arch, tp, toks)[0]
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)


def test_tp_stacked_decode_chain(setup):
    cfg, proxies, toks = setup
    arch = _arch(cfg, (4, 2, 3))
    refs = _ref_logits(stack_proxies(proxies, BITS, arch=arch), cfg, toks,
                       steps=3)
    gots = _tp_logits(cfg, proxies, arch, 2, toks, steps=3)
    for r, g in zip(refs, gots):
        np.testing.assert_allclose(g, r, rtol=3e-4, atol=3e-4)


def test_tp_stacked_merged_containers(setup):
    """SERVE_CONTAINERS + merge_containers per shard matches the local
    merged model (the shipping serving configuration)."""
    cfg, proxies, toks = setup
    arch = _arch(cfg, (3, 4, 2))
    local = merge_containers(stack_proxies(
        proxies, BITS, arch=arch, container_bits=SERVE_CONTAINERS))
    ref = _ref_logits(local, cfg, toks)[0]
    got = _tp_logits(cfg, proxies, arch, 2, toks,
                     container_bits=SERVE_CONTAINERS, merge=True)[0]
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)


def test_tp_stacked_sharded_head(setup):
    """Vocab-sharded 8-bit quantized head + all_gather == the local
    quantized head (row-wise quantization makes shards bit-identical)."""
    cfg, proxies, toks = setup
    arch = _arch(cfg, (4,))
    local = stack_proxies(proxies, BITS, arch=arch, head_bits=8)
    ref = _ref_logits(local, cfg, toks)[0]
    got = _tp_logits(cfg, proxies, arch, 2, toks, head_bits=8)[0]
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)


def test_tp_stacked_uneven_intermediate():
    """Intermediate groups not divisible by tp: zero-scale phantom groups
    keep shard shapes equal without changing numerics (9 groups over 2)."""
    cfg = dataclasses.replace(get_config("graft-tp"),
                              intermediate_size=1152, name="graft-tp-odd")
    params, proxies = _build(cfg, seed=3)
    toks = np.random.default_rng(2).integers(
        0, cfg.vocab_size, (1, 8)).astype(np.int32)
    arch = _arch(cfg, (2, 3, 4))
    ref = _ref_logits(stack_proxies(proxies, BITS, arch=arch), cfg, toks)[0]
    got = _tp_logits(cfg, proxies, arch, 2, toks)[0]
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)


def test_tp_stacked_data_tensor_composed(setup):
    """data=2 x tensor=2: batch shards over 'data', weights over 'tensor'."""
    cfg, proxies, toks = setup
    arch = _arch(cfg, (2, 4))
    ref = _ref_logits(stack_proxies(proxies, BITS, arch=arch), cfg, toks)[0]
    got = _tp_logits(cfg, proxies, arch, 2, toks, data=2)[0]
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)


def test_tp_engine_generate(setup):
    """The TP Engine produces token-identical greedy generations."""
    from amq_tpu.serving.engine import Engine
    cfg, proxies, toks = setup
    arch = _arch(cfg, (3, 2))
    local = stack_proxies(proxies, BITS, arch=arch)
    eng_ref = Engine(local, cfg, batch_size=2, max_len=48,
                     compute_dtype=jnp.float32, use_pallas=False,
                     cache_dtype=jnp.float32)
    ref = eng_ref.generate(toks, max_new_tokens=8)

    mesh = tps.make_tp_mesh(2)
    model = tps.stack_proxies_tp(proxies, BITS, cfg, 2, arch=arch,
                                 mesh=mesh)
    eng = tps.make_tp_engine(cfg, mesh, model, batch_size=2, max_len=48,
                             compute_dtype=jnp.float32,
                             cache_dtype=jnp.float32, use_pallas=False)
    got = eng.generate(toks, max_new_tokens=8)
    np.testing.assert_array_equal(got, ref)
