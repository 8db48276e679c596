"""Speculative decoding is lossless for greedy: output must equal plain
greedy decoding regardless of the draft; perfect draft accepts everything."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from amq_tpu.models import get_config, init_params, quantize_model
from amq_tpu.serving import Engine
from amq_tpu.serving.speculative import SpeculativeEngine


@pytest.fixture(scope="module")
def setup():
    cfg = get_config("tiny-llama")
    params = init_params(cfg, jax.random.PRNGKey(0))
    eng = Engine(params, cfg, batch_size=1, max_len=64,
                 compute_dtype=jnp.float32, use_pallas=False,
                 cache_dtype=jnp.float32)
    rng = np.random.default_rng(0)
    prompt = rng.integers(0, cfg.vocab_size, (1, 6)).astype(np.int32)
    want = eng.generate(prompt, max_new_tokens=12)
    return cfg, params, eng, prompt, want


def test_perfect_draft_accepts_everything(setup):
    cfg, params, eng, prompt, want = setup
    spec = SpeculativeEngine(eng, draft_params=params, gamma=3)
    got, stats = spec.generate(prompt, max_new_tokens=12)
    np.testing.assert_array_equal(got, want)
    # perfect draft: gamma accepted per round
    assert stats.acceptance_rate == pytest.approx(3.0)


def test_weak_draft_still_lossless(setup):
    cfg, params, eng, prompt, want = setup
    draft = quantize_model(params, cfg, 2)  # heavily degraded draft
    spec = SpeculativeEngine(eng, draft_params=draft, gamma=3)
    got, stats = spec.generate(prompt, max_new_tokens=12)
    np.testing.assert_array_equal(got, want)
    assert 0.0 <= stats.acceptance_rate <= 3.0
