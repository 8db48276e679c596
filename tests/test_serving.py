"""Engine: scan-based greedy generation matches a naive per-token loop."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from amq_tpu.models import forward, get_config, init_params, quantize_model
from amq_tpu.models.stacked import stack_proxies
from amq_tpu.serving import ContinuousBatcher, Engine, Request


@pytest.fixture(scope="module")
def setup():
    cfg = get_config("tiny-llama")
    params = init_params(cfg, jax.random.PRNGKey(0))
    return cfg, params


def _naive_greedy(params, cfg, prompt, n_new):
    toks = list(prompt[0])
    out = []
    for _ in range(n_new):
        logits, _ = forward(params, cfg, jnp.asarray([toks], jnp.int32),
                            compute_dtype=jnp.float32)
        nxt = int(jnp.argmax(logits[0, -1]))
        out.append(nxt)
        toks.append(nxt)
    return np.asarray([out])


@pytest.mark.slow
def test_engine_matches_naive_greedy(setup):
    cfg, params = setup
    rng = np.random.default_rng(0)
    prompt = rng.integers(0, cfg.vocab_size, (1, 6)).astype(np.int32)
    eng = Engine(params, cfg, batch_size=1, max_len=32,
                 compute_dtype=jnp.float32, use_pallas=False,
                 cache_dtype=jnp.float32)
    got = eng.generate(prompt, max_new_tokens=5)
    want = _naive_greedy(params, cfg, prompt, 5)
    np.testing.assert_array_equal(got, want)


@pytest.mark.slow
def test_engine_stacked_quantized(setup):
    cfg, params = setup
    bits_range = [2, 3, 4]
    proxies = [quantize_model(params, cfg, b) for b in bits_range]
    model = stack_proxies(proxies, bits_range)
    rng = np.random.default_rng(1)
    prompt = rng.integers(0, cfg.vocab_size, (2, 4)).astype(np.int32)
    eng = Engine(model, cfg, batch_size=2, max_len=16,
                 compute_dtype=jnp.float32, use_pallas=False,
                 cache_dtype=jnp.float32)
    out = eng.generate(prompt, max_new_tokens=4)
    assert out.shape == (2, 4)
    assert (out >= 0).all() and (out < cfg.vocab_size).all()


def test_engine_hot_path_never_donates(setup):
    """The single-stream Engine must not donate its KV cache: donation
    there forces XLA layout copies and cost 172->143 tok/s on-chip
    (round-4 bisect, commit 3257215).  On CPU any donation surfaces as a
    'Some donated buffers were not usable' warning — assert it never
    fires on the prefill/decode hot path."""
    import warnings

    cfg, params = setup
    rng = np.random.default_rng(2)
    prompt = rng.integers(0, cfg.vocab_size, (1, 4)).astype(np.int32)
    eng = Engine(params, cfg, batch_size=1, max_len=16,
                 compute_dtype=jnp.float32, use_pallas=False,
                 cache_dtype=jnp.float32)
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        eng.generate(prompt, max_new_tokens=3)
    donated = [w for w in caught if "donat" in str(w.message).lower()]
    assert not donated, [str(w.message) for w in donated]


def test_peak_mem_tracker_high_water():
    """PeakMemTracker keeps the max across dispatch-boundary samples,
    surviving frees (a single end-of-run snapshot would not)."""
    from amq_tpu.serving.benchmark import PeakMemTracker

    t = PeakMemTracker()
    t.sample()
    base = t.peak_gib
    big = jnp.ones((1024, 1024), jnp.float32)  # 4 MiB
    big.block_until_ready()
    t.sample()
    high = t.peak_gib
    assert high >= base
    del big
    t.sample()
    peak, kind = t.result()
    assert peak == high                     # high-water survives the free
    assert kind in ("peak", "live_high_water")


def test_benchmark_speed_reports_mem(setup):
    from amq_tpu.serving.benchmark import PeakMemTracker, benchmark_speed

    cfg, params = setup
    eng = Engine(params, cfg, batch_size=1, max_len=16,
                 compute_dtype=jnp.float32, use_pallas=False,
                 cache_dtype=jnp.float32)
    mem = PeakMemTracker()
    out = benchmark_speed(eng, "TTFT", prompt_len=4, gen_len=2, mem=mem)
    assert "ttft_ms" in out
    peak, kind = mem.result()
    assert peak > 0 and kind in ("peak", "live_high_water")


def test_continuous_batcher_bookkeeping():
    b = ContinuousBatcher(n_slots=2, max_len=16)
    for uid in range(4):
        b.submit(Request(uid=uid, prompt=np.zeros(4, np.int32),
                         max_new_tokens=2))
    assert b.fill_slots() == [(0, b.slots[0]), (1, b.slots[1])]
    steps = 0
    done = []
    while b.has_work() and steps < 20:
        b.fill_slots()
        toks = np.arange(b.n_slots)
        done += b.step_bookkeeping(toks)
        steps += 1
    assert len(done) == 4
    assert all(len(r.generated) == 2 for r in done)
    assert b.active == 0
