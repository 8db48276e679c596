"""Model-family coverage: rope scaling, sliding window, registry topology."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from amq_tpu.models import forward, get_config, init_params
from amq_tpu.models.config import LINEAR_NAMES, ModelConfig, register
from amq_tpu.models.llama import _llama3_scale_freqs, rope_cos_sin


def test_llama3_rope_scaling_changes_low_freqs_only():
    hd = 128
    inv = 1.0 / (500000.0 ** (jnp.arange(0, hd, 2) / hd))
    scaled = _llama3_scale_freqs(inv)
    # high-frequency components untouched, low-frequency divided by ~8
    np.testing.assert_allclose(np.asarray(scaled[:8]), np.asarray(inv[:8]))
    assert float(scaled[-1]) == pytest.approx(float(inv[-1]) / 8.0)


def test_sliding_window_masks_distant_tokens():
    # mask property: query attends only keys in (q - window, q]
    from amq_tpu.models.llama import _causal_mask
    m = np.asarray(_causal_mask(8, 8, jnp.int32(0), sliding_window=4))[0, 0]
    for q in range(8):
        for k in range(8):
            visible = m[q, k] == 0.0
            assert visible == (k <= q and k > q - 4), (q, k)

    # single-layer model: receptive field == window, so a token outside
    # the window cannot affect the last position's logits
    base = get_config("tiny-llama")
    import dataclasses
    cfg = register(dataclasses.replace(base, name="tiny-swa", num_layers=1,
                                       sliding_window=4))
    params = init_params(cfg, jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    t1 = rng.integers(0, cfg.vocab_size, (1, 12)).astype(np.int32)
    t2 = t1.copy()
    t2[0, 0] = (t2[0, 0] + 5) % cfg.vocab_size
    l1, _ = forward(params, cfg, jnp.asarray(t1))
    l2, _ = forward(params, cfg, jnp.asarray(t2))
    np.testing.assert_allclose(np.asarray(l1[0, -1]), np.asarray(l2[0, -1]),
                               rtol=1e-5, atol=1e-5)
    assert not np.allclose(np.asarray(l1[0, 1]), np.asarray(l2[0, 1]))


def test_registry_topologies_consistent():
    for name in ("Llama-2-7b-hf", "Llama-2-13b-hf", "Llama-2-70b-hf",
                 "Mistral-7B-v0.3", "Qwen2-0.5B", "Qwen2.5-7B"):
        cfg = get_config(name)
        top = cfg.topology()
        assert top["n_block"] == cfg.num_layers
        assert set(top["linear"]) == set(LINEAR_NAMES)
        total = sum(o * i for o, i in top["linear_shape"].values())
        assert top["model_numel"] == total * cfg.num_layers


def test_reference_model_numel_parity():
    # values recorded in the reference configs (amq/configs/*.json)
    assert get_config("Llama-2-7b-hf").topology()["model_numel"] == 6476005376
    assert get_config("Llama-2-13b-hf").topology()["model_numel"] == 12687769600
    assert get_config("Llama-2-70b-hf").topology()["model_numel"] == 68451041280
    # Llama-3.1 rows (amq/configs/llama.json keys "Llama-3.1-70B",
    # "Llama-3.1-8B-Instruct"): shapes + numel recorded from that JSON
    t70 = get_config("Llama-3.1-70B").topology()
    assert t70["model_numel"] == 68451041280
    assert t70["n_block"] == 80
    assert t70["linear_shape"]["self_attn.k_proj"] == [1024, 8192]
    assert t70["linear_shape"]["mlp.gate_proj"] == [28672, 8192]
    t8i = get_config("Llama-3.1-8B-Instruct").topology()
    assert t8i["model_numel"] == 6979321856
    assert t8i["linear_shape"]["self_attn.k_proj"] == [1024, 4096]
    assert t8i == get_config("Llama-3.1-8B").topology()
