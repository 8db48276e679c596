"""Tensor-parallel numeric parity: make_tp_forward logits vs the
single-device forward on identical quantized params (VERDICT r1 item 6).

The reference's behavioral contract is "same archs -> same losses
regardless of process count" (SURVEY §2.7); here the sharded program must
reproduce the unsharded logits up to psum reordering."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from amq_tpu.models import get_config, init_params, quantize_model
from amq_tpu.models.llama import KVCache, forward
from amq_tpu.parallel import tp as tpmod


@pytest.fixture(scope="module")
def setup():
    cfg = get_config("graft-tp")
    params = init_params(cfg, jax.random.PRNGKey(1))
    qparams = quantize_model(params, cfg, 3, optimize=False, superblock=128)
    toks = np.random.default_rng(0).integers(
        0, cfg.vocab_size, (2, 16)).astype(np.int32)
    ref_logits, _ = jax.jit(lambda p, t: forward(
        p, cfg, t, compute_dtype=jnp.float32))(qparams, jnp.asarray(toks))
    return cfg, qparams, toks, np.asarray(ref_logits)


@pytest.mark.parametrize("tp", [2, 4])
@pytest.mark.slow
def test_tp_forward_matches_single_device(setup, tp):
    cfg, qparams, toks, ref = setup
    mesh = tpmod.make_mesh(n_devices=tp, data=1, tensor=tp)
    sharded = tpmod.shard_params(qparams, mesh)
    fwd = jax.jit(tpmod.make_tp_forward(cfg, mesh, qparams,
                                        compute_dtype=jnp.float32))
    B, S = toks.shape
    T = 32
    tokens = jax.device_put(jnp.asarray(toks),
                            NamedSharding(mesh, P("data", None)))
    cache = KVCache.create(cfg, batch=B, max_len=T, dtype=jnp.float32)
    cache = jax.device_put(cache, jax.tree.map(
        lambda s: NamedSharding(mesh, s), tpmod.cache_specs(),
        is_leaf=lambda x: isinstance(x, P)))
    logits, cache = fwd(sharded, tokens, cache)
    got = np.asarray(logits)
    # prefill-with-cache logits must match the cacheless reference
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)


@pytest.mark.slow
def test_tp_decode_chain_matches_single_device(setup):
    """Prefill + 3 decode steps through the sharded program reproduce the
    unsharded incremental forward."""
    cfg, qparams, toks, _ = setup
    tp = 4
    mesh = tpmod.make_mesh(n_devices=tp, data=1, tensor=tp)
    sharded = tpmod.shard_params(qparams, mesh)
    fwd = jax.jit(tpmod.make_tp_forward(cfg, mesh, qparams,
                                        compute_dtype=jnp.float32))
    B, S = toks.shape
    T = 32

    def put_cache(c):
        return jax.device_put(c, jax.tree.map(
            lambda s: NamedSharding(mesh, s), tpmod.cache_specs(),
            is_leaf=lambda x: isinstance(x, P)))

    cache_tp = put_cache(KVCache.create(cfg, B, T, dtype=jnp.float32))
    cache_1 = KVCache.create(cfg, B, T, dtype=jnp.float32)
    fwd1 = jax.jit(lambda p, t, c: forward(p, cfg, t, cache=c,
                                           compute_dtype=jnp.float32))

    tokens = jax.device_put(jnp.asarray(toks),
                            NamedSharding(mesh, P("data", None)))
    lg_tp, cache_tp = fwd(sharded, tokens, cache_tp)
    lg_1, cache_1 = fwd1(qparams, jnp.asarray(toks), cache_1)
    np.testing.assert_allclose(np.asarray(lg_tp), np.asarray(lg_1),
                               rtol=2e-4, atol=2e-4)

    step_toks = np.random.default_rng(1).integers(
        0, cfg.vocab_size, (3, B, 1)).astype(np.int32)
    for i in range(3):
        t = jax.device_put(jnp.asarray(step_toks[i]),
                           NamedSharding(mesh, P("data", None)))
        lg_tp, cache_tp = fwd(sharded, t, cache_tp)
        lg_1, cache_1 = fwd1(qparams, jnp.asarray(step_toks[i]), cache_1)
        np.testing.assert_allclose(np.asarray(lg_tp), np.asarray(lg_1),
                                   rtol=2e-4, atol=2e-4,
                                   err_msg=f"decode step {i}")
