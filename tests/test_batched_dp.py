"""Mesh-data-parallel slot batching must produce exactly the tokens the
host-local SlotEngine produces (same prompts, same arrivals), with the
slot axis sharded over the 'data' axis of a multi-device mesh."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow
import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from amq_tpu.models import get_config, init_params, quantize_model
from amq_tpu.models.stacked import stack_proxies
from amq_tpu.serving import ContinuousBatcher, Request
from amq_tpu.serving.batched import SlotEngine
from amq_tpu.serving.dp import DPSlotEngine


@pytest.fixture(scope="module")
def setup():
    cfg = get_config("tiny-llama")
    params = init_params(cfg, jax.random.PRNGKey(0))
    bits_range = [2, 3, 4]
    proxies = [quantize_model(params, cfg, b) for b in bits_range]
    model = stack_proxies(proxies, bits_range)
    return cfg, model


def _run(engine, prompts, n_new, n_slots):
    batcher = ContinuousBatcher(n_slots=n_slots, max_len=64)
    for i, p in enumerate(prompts):
        batcher.submit(Request(uid=i, prompt=p, max_new_tokens=n_new))
    return engine.run(batcher)


@pytest.mark.parametrize("chunk_steps", [1, 3])
def test_dp_slots_match_local(setup, chunk_steps):
    cfg, model = setup
    n_shards = 4
    assert len(jax.devices()) >= n_shards
    mesh = Mesh(np.array(jax.devices()[:n_shards]), ("data",))

    rng = np.random.default_rng(0)
    prompts = [rng.integers(0, cfg.vocab_size, n).astype(np.int32)
               for n in (5, 7, 4, 6, 3, 8)]
    n_new = 5

    local = SlotEngine(model, cfg, n_slots=n_shards, max_len=64,
                       compute_dtype=jnp.float32, use_pallas=False,
                       prefill_buckets=(8, 16), chunk_steps=chunk_steps)
    want = _run(local, prompts, n_new, n_shards)

    dp = DPSlotEngine(model, cfg, mesh, slots_per_shard=1, max_len=64,
                      compute_dtype=jnp.float32, use_pallas=False,
                      prefill_buckets=(8, 16), chunk_steps=chunk_steps)
    got = _run(dp, prompts, n_new, dp.n_slots)

    assert set(got) == set(want)
    for uid in want:
        assert got[uid] == want[uid], (uid, got[uid], want[uid])


def test_dp_cache_actually_sharded(setup):
    cfg, model = setup
    mesh = Mesh(np.array(jax.devices()[:4]), ("data",))
    dp = DPSlotEngine(model, cfg, mesh, slots_per_shard=2, max_len=32,
                      compute_dtype=jnp.float32, use_pallas=False,
                      prefill_buckets=(8,))
    assert dp.n_slots == 8
    # the KV buffers live sharded on the slot axis, 1/4 per device
    shard_shapes = {s.data.shape for s in dp.k.addressable_shards}
    assert shard_shapes == {(cfg.num_layers, 2, cfg.num_kv_heads, 32,
                             cfg.head_dim_)}
    dp.prefill(5, np.arange(4, dtype=np.int32) % cfg.vocab_size)
    lengths = np.asarray(dp.lengths)
    assert lengths[5] == 4 and lengths.sum() == 4
