"""Pipeline parallelism: stage-sharded stacked model + microbatched
ppermute decode must reproduce the single-device forward (BASELINE
config 5's mechanism; the reference only has sequential block placement)."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from amq_tpu.models import get_config, init_params, quantize_model
from amq_tpu.models.llama import KVCache
from amq_tpu.models.stacked import stack_proxies, forward_stacked
from amq_tpu.parallel import pp


@pytest.fixture(scope="module")
def setup():
    cfg = get_config("tiny-llama")          # 4 layers
    params = init_params(cfg, jax.random.PRNGKey(0))
    proxies = [quantize_model(params, cfg, b, optimize=False)
               for b in (2, 3, 4)]
    arch = {"linear": {n: [(2, 3, 4)[i % 3] for i in range(cfg.num_layers)]
                       for n in ["self_attn.q_proj", "self_attn.k_proj",
                                 "self_attn.v_proj", "self_attn.o_proj",
                                 "mlp.gate_proj", "mlp.up_proj",
                                 "mlp.down_proj"]}}
    model = stack_proxies(proxies, (2, 3, 4), arch=arch)
    return cfg, model


@pytest.mark.parametrize("n_stages,n_micro", [(2, 2), (4, 2)])
def test_pp_prefill_and_decode_matches_single(setup, n_stages, n_micro):
    cfg, model = setup
    mesh = pp.make_stage_mesh(n_stages)
    sharded = pp.shard_model_pp(model, mesh)

    B, S_pre, T = 4, 8, 16
    rng = np.random.default_rng(0)
    prompt = jnp.asarray(rng.integers(0, cfg.vocab_size, (B, S_pre)),
                         jnp.int32)

    # reference: single-device incremental forward
    cache_ref = KVCache.create(cfg, B, T, dtype=jnp.float32)
    ref_step = jax.jit(lambda m, t, c: forward_stacked(
        m, cfg, t, cache=c, compute_dtype=jnp.float32))
    lr, cache_ref = ref_step(model, prompt, cache_ref)

    cache_pp = KVCache.create(cfg, B, T, dtype=jnp.float32)
    cache_pp = jax.device_put(cache_pp, jax.tree.map(
        lambda s: NamedSharding(mesh, s), pp.cache_specs(),
        is_leaf=lambda x: isinstance(x, P)))
    prefill = pp.make_pp_step(cfg, mesh, model, n_micro=n_micro,
                              seq_len=S_pre, batch=B,
                              compute_dtype=jnp.float32)
    lp, cache_pp = prefill(sharded, prompt, cache_pp)
    np.testing.assert_allclose(np.asarray(lp), np.asarray(lr[:, -1]),
                               rtol=2e-4, atol=2e-4)

    # 3 decode steps
    decode = pp.make_pp_step(cfg, mesh, model, n_micro=n_micro,
                             seq_len=1, batch=B, compute_dtype=jnp.float32)
    toks = rng.integers(0, cfg.vocab_size, (3, B, 1)).astype(np.int32)
    for i in range(3):
        t = jnp.asarray(toks[i])
        lr, cache_ref = ref_step(model, t, cache_ref)
        lp, cache_pp = decode(sharded, t, cache_pp)
        np.testing.assert_allclose(np.asarray(lp),
                                   np.asarray(lr[:, -1]),
                                   rtol=2e-4, atol=2e-4,
                                   err_msg=f"decode step {i}")


@pytest.mark.parametrize("n_stages,tp", [(2, 2), (4, 2)])
def test_pp_tp_composed_matches_single(setup, n_stages, tp):
    """Composed (stage x tensor) mesh: stages shard layers, tensor shards
    lanes/rows of the packed stacks (VERDICT r2 item 2's composition)."""
    from amq_tpu.models import init_params, quantize_model
    from amq_tpu.parallel import tp_stacked as tps

    cfg, model = setup
    params = init_params(cfg, jax.random.PRNGKey(0))
    proxies = [quantize_model(params, cfg, b, optimize=False)
               for b in (2, 3, 4)]
    arch = {"linear": {n: [(2, 3, 4)[i % 3] for i in range(cfg.num_layers)]
                       for n in ["self_attn.q_proj", "self_attn.k_proj",
                                 "self_attn.v_proj", "self_attn.o_proj",
                                 "mlp.gate_proj", "mlp.up_proj",
                                 "mlp.down_proj"]}}

    mesh = pp.make_stage_mesh(n_stages, tp=tp)
    tp_model = tps.stack_proxies_tp(proxies, (2, 3, 4), cfg, tp, arch=arch)
    sharded = pp.shard_model_pp(tp_model, mesh)

    B, S_pre, T = 4, 8, 16
    n_micro = 2
    rng = np.random.default_rng(1)
    prompt = jnp.asarray(rng.integers(0, cfg.vocab_size, (B, S_pre)),
                         jnp.int32)

    cache_ref = KVCache.create(cfg, B, T, dtype=jnp.float32)
    ref_step = jax.jit(lambda m, t, c: forward_stacked(
        m, cfg, t, cache=c, compute_dtype=jnp.float32))
    lr, cache_ref = ref_step(model, prompt, cache_ref)

    lcfg = tps.local_stacked_config(cfg, tp)
    cache_pp = KVCache(
        k=jnp.zeros((tp, cfg.num_layers, B, lcfg.num_kv_heads, T,
                     lcfg.head_dim_), jnp.float32),
        v=jnp.zeros((tp, cfg.num_layers, B, lcfg.num_kv_heads, T,
                     lcfg.head_dim_), jnp.float32),
        length=jnp.int32(0))
    cache_pp = jax.device_put(cache_pp, jax.tree.map(
        lambda s: NamedSharding(mesh, s), pp.cache_specs(tp=True),
        is_leaf=lambda x: isinstance(x, P)))

    prefill = pp.make_pp_step(cfg, mesh, tp_model, n_micro=n_micro,
                              seq_len=S_pre, batch=B,
                              compute_dtype=jnp.float32)
    lp, cache_pp = prefill(sharded, prompt, cache_pp)
    np.testing.assert_allclose(np.asarray(lp), np.asarray(lr[:, -1]),
                               rtol=3e-4, atol=3e-4)

    decode = pp.make_pp_step(cfg, mesh, tp_model, n_micro=n_micro,
                             seq_len=1, batch=B, compute_dtype=jnp.float32)
    toks = rng.integers(0, cfg.vocab_size, (2, B, 1)).astype(np.int32)
    for i in range(2):
        t = jnp.asarray(toks[i])
        lr, cache_ref = ref_step(model, t, cache_ref)
        lp, cache_pp = decode(sharded, t, cache_pp)
        np.testing.assert_allclose(np.asarray(lp), np.asarray(lr[:, -1]),
                                   rtol=3e-4, atol=3e-4,
                                   err_msg=f"decode step {i}")
