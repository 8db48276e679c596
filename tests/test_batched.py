"""Slot-batched continuous decoding must match single-sequence greedy
generation per request, across staggered arrivals."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from amq_tpu.models import get_config, init_params, quantize_model
from amq_tpu.models.stacked import stack_proxies
from amq_tpu.serving import ContinuousBatcher, Engine, Request
from amq_tpu.serving.batched import SlotEngine


@pytest.fixture(scope="module")
def setup():
    cfg = get_config("tiny-llama")
    params = init_params(cfg, jax.random.PRNGKey(0))
    bits_range = [2, 3, 4]
    proxies = [quantize_model(params, cfg, b) for b in bits_range]
    model = stack_proxies(proxies, bits_range)  # all-4-bit default
    return cfg, model


def _reference_greedy(cfg, model, prompt, n_new):
    eng = Engine(model, cfg, batch_size=1, max_len=64,
                 compute_dtype=jnp.float32, use_pallas=False,
                 cache_dtype=jnp.float32)
    return eng.generate(prompt[None], max_new_tokens=n_new)[0]


@pytest.mark.slow
def test_slot_batching_matches_single(setup):
    cfg, model = setup
    rng = np.random.default_rng(0)
    prompts = [rng.integers(0, cfg.vocab_size, n).astype(np.int32)
               for n in (5, 7, 4, 6)]
    n_new = 6

    want = {i: _reference_greedy(cfg, model, p, n_new).tolist()
            for i, p in enumerate(prompts)}

    eng = SlotEngine(model, cfg, n_slots=2, max_len=64,
                     compute_dtype=jnp.float32, use_pallas=False,
                     prefill_buckets=(8, 16))
    batcher = ContinuousBatcher(n_slots=2, max_len=64)
    for i, p in enumerate(prompts):
        batcher.submit(Request(uid=i, prompt=p, max_new_tokens=n_new))
    results = eng.run(batcher)

    assert set(results) == set(want)
    for uid in want:
        assert results[uid] == want[uid], (uid, results[uid], want[uid])


@pytest.mark.slow
def test_all_slots_retire_at_prefill_queue_drains(setup):
    """max_new=1 requests retire at prefill; with every slot empty and
    requests still queued, run() must refill rather than exit early."""
    cfg, model = setup
    rng = np.random.default_rng(2)
    prompts = [rng.integers(0, cfg.vocab_size, 5).astype(np.int32)
               for _ in range(4)]
    eng = SlotEngine(model, cfg, n_slots=2, max_len=64,
                     compute_dtype=jnp.float32, use_pallas=False,
                     prefill_buckets=(8,))
    batcher = ContinuousBatcher(n_slots=2, max_len=64)
    for i, p in enumerate(prompts):
        batcher.submit(Request(uid=i, prompt=p, max_new_tokens=1))
    results = eng.run(batcher)
    assert set(results) == set(range(4))
    for uid, p in enumerate(prompts):
        want = _reference_greedy(cfg, model, p, 1).tolist()
        assert results[uid] == want, (uid, results[uid], want)


@pytest.mark.slow
def test_chunked_slot_batching_matches_single(setup):
    cfg, model = setup
    rng = np.random.default_rng(1)
    prompts = [rng.integers(0, cfg.vocab_size, n).astype(np.int32)
               for n in (5, 7, 4)]
    n_new = 7  # not a multiple of chunk_steps: mid-chunk retirement

    want = {i: _reference_greedy(cfg, model, p, n_new).tolist()
            for i, p in enumerate(prompts)}

    from amq_tpu.serving.batched import SlotEngine as SE
    eng = SE(model, cfg, n_slots=2, max_len=64,
             compute_dtype=jnp.float32, use_pallas=False,
             prefill_buckets=(8, 16), chunk_steps=3)
    batcher = ContinuousBatcher(n_slots=2, max_len=64)
    for i, p in enumerate(prompts):
        batcher.submit(Request(uid=i, prompt=p, max_new_tokens=n_new))
    results = eng.run(batcher)
    assert set(results) == set(want)
    for uid in want:
        assert results[uid] == want[uid], (uid, results[uid], want[uid])


@pytest.mark.slow
@pytest.mark.parametrize("use_native", [False, True])
def test_preempted_request_resumes_token_exact(setup, use_native):
    """A high-priority arrival evicts a running request; after re-prefill
    (prompt + generated-so-far) the victim's final tokens must equal its
    uninterrupted greedy generation."""
    cfg, model = setup
    rng = np.random.default_rng(3)
    prompts = {0: rng.integers(0, cfg.vocab_size, 5).astype(np.int32),
               1: rng.integers(0, cfg.vocab_size, 6).astype(np.int32),
               2: rng.integers(0, cfg.vocab_size, 4).astype(np.int32)}
    n_new = {0: 10, 1: 10, 2: 3}

    want = {u: _reference_greedy(cfg, model, prompts[u], n_new[u]).tolist()
            for u in prompts}

    eng = SlotEngine(model, cfg, n_slots=2, max_len=64,
                     compute_dtype=jnp.float32, use_pallas=False,
                     prefill_buckets=(8, 16, 32))
    batcher = ContinuousBatcher(n_slots=2, max_len=64,
                                use_native=use_native)
    if use_native and batcher._native is None:
        pytest.skip("native library unavailable")
    for u in (0, 1):
        batcher.submit(Request(uid=u, prompt=prompts[u],
                               max_new_tokens=n_new[u]))
    # drive a couple of steps so 0/1 make progress, then submit the
    # preemptor mid-flight via a wrapped has_work hook
    state = {"steps": 0}
    orig_has_work = batcher.has_work

    def has_work():
        state["steps"] += 1
        if state["steps"] == 3:
            batcher.submit(Request(uid=2, prompt=prompts[2],
                                   max_new_tokens=n_new[2], priority=5))
        return orig_has_work()

    batcher.has_work = has_work
    results = eng.run(batcher)
    assert set(results) == {0, 1, 2}
    for u in results:
        assert results[u] == want[u], (u, results[u], want[u])


@pytest.mark.slow
@pytest.mark.parametrize("use_native", [False, True])
def test_chunked_prefill_token_exact(setup, use_native):
    """Chunked prefill (prefill_chunk_len) must produce exactly the
    tokens of whole-prompt prefill, while other slots decode between
    chunks."""
    cfg, model = setup
    rng = np.random.default_rng(7)
    prompts = {0: rng.integers(0, cfg.vocab_size, 5).astype(np.int32),
               1: rng.integers(0, cfg.vocab_size, 21).astype(np.int32),
               2: rng.integers(0, cfg.vocab_size, 13).astype(np.int32)}
    n_new = {0: 12, 1: 5, 2: 6}

    want = {u: _reference_greedy(cfg, model, prompts[u], n_new[u]).tolist()
            for u in prompts}

    eng = SlotEngine(model, cfg, n_slots=2, max_len=64,
                     compute_dtype=jnp.float32, use_pallas=False,
                     prefill_buckets=(8, 16, 24, 32),
                     prefill_chunk_len=8)
    batcher = ContinuousBatcher(n_slots=2, max_len=64,
                                use_native=use_native)
    if use_native and batcher._native is None:
        pytest.skip("native library unavailable")
    # 0 starts decoding; 1 (21 tokens = 3 chunks) prefills across
    # iterations while 0 decodes; 2 queues behind
    for u in (0, 1, 2):
        batcher.submit(Request(uid=u, prompt=prompts[u],
                               max_new_tokens=n_new[u]))
    results = eng.run(batcher)
    assert set(results) == {0, 1, 2}
    for u in results:
        assert results[u] == want[u], (u, results[u], want[u])
    assert not eng._prefilling
