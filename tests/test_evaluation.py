"""Evaluator behavior: JSD ordering across bit-widths, PPL sanity,
bits-usage accounting parity, sensitivity table schema, data-parallel mesh
equivalence."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from amq_tpu.evaluation import Evaluator, get_bits_usage, metrics
from amq_tpu.evaluation.data import synthetic_tokens
from amq_tpu.evaluation.sensitivity import linear_sensitivity
from amq_tpu.models import get_config, init_params
from amq_tpu.models.config import LINEAR_NAMES


@pytest.fixture(scope="module")
def setup():
    cfg = get_config("tiny-llama")
    params = init_params(cfg, jax.random.PRNGKey(0))
    toks = synthetic_tokens(cfg.vocab_size, n_sample=4, seqlen=64, seed=0)
    ev = Evaluator(cfg, dense_params=params, datasets={"synthetic": toks},
                   batch_size=2)
    return cfg, params, ev


def _uniform(cfg, bits):
    return {"linear": {l: [bits] * cfg.num_layers for l in LINEAR_NAMES}}


def test_loss_monotone_in_bits(setup):
    cfg, _, ev = setup
    losses = {}
    for bits in (2, 3, 4):
        metric, usage = ev.eval(_uniform(cfg, bits))
        losses[bits] = metric["synthetic"]
        assert usage == pytest.approx(bits + 32 / 128)
    assert losses[4] < losses[3] < losses[2], losses
    assert losses[4] >= 0


def test_bits_usage_matches_reference_formula(setup):
    cfg, _, ev = setup
    arch = _uniform(cfg, 4)
    arch["linear"]["mlp.down_proj"] = [2] * cfg.num_layers
    usage = get_bits_usage(arch, cfg.topology(), 128)
    top = cfg.topology()
    down = top["linear_shape"]["mlp.down_proj"]
    down_numel = down[0] * down[1] * cfg.num_layers
    expected = ((top["model_numel"] - down_numel) * (4 + 0.25)
                + down_numel * (2 + 0.25)) / top["model_numel"]
    assert usage == pytest.approx(expected)


def test_jsd_identity_is_zero():
    logits = jnp.asarray(np.random.default_rng(0).normal(size=(1, 8, 32)),
                         jnp.float32)
    assert float(metrics.jsd_shifted(logits, logits)) == pytest.approx(0.0, abs=1e-6)


@pytest.mark.parametrize("S,chunk", [(65, 16), (64, 16), (300, 256), (8, 16)])
def test_jsd_chunked_matches_fused(S, chunk):
    """Chunked JSD (the 7B-on-one-chip loss step) ≡ the fused step,
    including a final chunk whose dynamic_slice start gets clamped."""
    rng = np.random.default_rng(0)
    p = jnp.asarray(rng.normal(size=(3, S, 37)), jnp.float32)
    q = jnp.asarray(rng.normal(size=(3, S, 37)), jnp.float16)
    want = metrics.jsd_shifted_per_sample(p, q)
    got = metrics.jsd_shifted_per_sample(p, q, chunk=chunk)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-7)


def test_ppl_final_mode(setup):
    cfg, params, _ = setup
    toks = synthetic_tokens(cfg.vocab_size, n_sample=2, seqlen=64, seed=1)
    ev = Evaluator(cfg, dense_params=params, datasets={"synthetic": toks},
                   search=False,
                   quantize_fn=lambda p, c, a, m: p)  # identity "quantizer"
    metric, _ = ev.eval(_uniform(cfg, 4), method="fp16")
    ppl = metric["synthetic"]
    # untrained model: PPL should be in the vicinity of uniform-over-vocab
    assert 1.0 < ppl < cfg.vocab_size * 8


@pytest.mark.slow
def test_sensitivity_schema():
    cfg = get_config("tiny-llama")
    params = init_params(cfg, jax.random.PRNGKey(2))
    toks = synthetic_tokens(cfg.vocab_size, n_sample=2, seqlen=32, seed=2)
    ev = Evaluator(cfg, dense_params=params, datasets={"synthetic": toks},
                   batch_size=2)
    table = linear_sensitivity(ev, "synthetic")
    assert len(table["loss"]) == cfg.num_layers * len(LINEAR_NAMES)
    assert all(v >= 0 for v in table["loss"].values())
    assert "0.self_attn.q_proj" in table["loss"]


@pytest.mark.slow
def test_mesh_data_parallel_matches_single_device(setup):
    cfg, params, ev_single = setup
    toks = synthetic_tokens(cfg.vocab_size, n_sample=8, seqlen=64, seed=0)
    mesh = jax.sharding.Mesh(np.array(jax.devices()[:8]).reshape(8), ("data",))
    ev_mesh = Evaluator(cfg, dense_params=params,
                        datasets={"synthetic": toks}, mesh=mesh)
    ev_ref = Evaluator(cfg, dense_params=params,
                       datasets={"synthetic": toks}, batch_size=8)
    arch = _uniform(cfg, 3)
    m_mesh, _ = ev_mesh.eval(arch)
    m_ref, _ = ev_ref.eval(arch)
    assert m_mesh["synthetic"] == pytest.approx(m_ref["synthetic"], rel=1e-4)


@pytest.mark.slow
def test_ragged_batch_padding_matches_batch1(setup):
    """11 samples at B=8 (one full + one padded batch) == batch-1 losses.

    Guards the padded-last-batch path: pad rows are repeats of the final
    sample and must be excluded from the mean (VERDICT r1 weak item 6)."""
    cfg, params, _ = setup
    toks = synthetic_tokens(cfg.vocab_size, n_sample=11, seqlen=64, seed=1)
    arch = _uniform(cfg, 3)
    res = {}
    for B in (1, 8):
        ev = Evaluator(cfg, dense_params=params,
                       datasets={"synthetic": toks}, batch_size=B)
        m, _ = ev.eval(arch)
        res[B] = m["synthetic"]
    assert res[1] == pytest.approx(res[8], rel=1e-5)


@pytest.mark.slow
def test_ragged_batch_padding_under_mesh(setup):
    """N=11 not divisible by the 8-device 'data' axis: padding must keep
    the sharded batch shape divisible (the pre-fix code would fail in
    device_put)."""
    cfg, params, _ = setup
    toks = synthetic_tokens(cfg.vocab_size, n_sample=11, seqlen=64, seed=1)
    mesh = jax.sharding.Mesh(np.array(jax.devices()[:8]).reshape(8), ("data",))
    ev = Evaluator(cfg, dense_params=params, datasets={"synthetic": toks},
                   mesh=mesh)
    ev1 = Evaluator(cfg, dense_params=params, datasets={"synthetic": toks},
                    batch_size=1)
    arch = _uniform(cfg, 3)
    m, _ = ev.eval(arch)
    m1, _ = ev1.eval(arch)
    assert m["synthetic"] == pytest.approx(m1["synthetic"], rel=1e-4)


@pytest.mark.slow
def test_dense_device_cache_and_fp8(setup, monkeypatch):
    """The pinned device cache must not change the loss; fp8 pinning
    (AMQ_DENSE_CACHE_DTYPE=float8_e4m3fn) stays within ~2e-3 JSD."""
    cfg, params, ev = setup
    arch = _uniform(cfg, 3)
    base, _ = ev.eval(arch)

    ev2 = Evaluator(cfg, dense_params=params,
                    datasets={"synthetic": ev.datasets["synthetic"]},
                    batch_size=2)
    ev2.dense_cache_bytes = 1 << 30
    m1, _ = ev2.eval(arch)          # fills the cache
    assert ev2._dense_dev_bytes > 0 and len(ev2._dense_dev) == 2
    m2, _ = ev2.eval(arch)          # cache-hit path
    assert m2["synthetic"] == pytest.approx(m1["synthetic"], abs=1e-6)
    assert m1["synthetic"] == pytest.approx(base["synthetic"], abs=1e-5)

    ev8 = Evaluator(cfg, dense_params=params,
                    datasets={"synthetic": ev.datasets["synthetic"]},
                    batch_size=2)
    ev8.dense_cache_dtype = jnp.dtype(jnp.float8_e4m3fn)
    ev8.dense_cache_bytes = 1 << 30
    m8, _ = ev8.eval(arch)
    assert m8["synthetic"] == pytest.approx(base["synthetic"], abs=2e-3)


def test_chunked_dense_cache_matches_full_forward(setup, monkeypatch):
    """The layer-chunked dense logit-cache pass (7B+ on one chip) must
    reproduce the single-pass forward's logits exactly."""
    cfg, params, ev = setup
    toks = ev.datasets["synthetic"]

    monkeypatch.setenv("AMQ_DENSE_CHUNK_GIB", "1e-9")  # force 1 layer/chunk
    ev_c = Evaluator(cfg, dense_params=params,
                     datasets={"synthetic": toks}, batch_size=2)
    import jax.numpy as jnp
    from amq_tpu.models import llama
    want = np.asarray(
        llama.forward(params, cfg, jnp.asarray(toks),
                      compute_dtype=jnp.float32)[0]).astype(np.float16)
    got = ev_c.dense_logits["synthetic"]
    assert got.shape == want.shape
    np.testing.assert_allclose(got.astype(np.float32),
                               want.astype(np.float32), rtol=0, atol=2e-2)


def test_eval_many_matches_sequential(setup):
    """Batched multi-arch evaluation (eval_many) must reproduce eval()
    exactly — same losses, same bits — including tile padding on a
    non-multiple count (VERDICT r2 item 9)."""
    cfg, _, ev = setup
    rng = np.random.default_rng(5)
    archs = []
    for _ in range(5):                      # 5 archs, tile 2 -> pad path
        archs.append({"linear": {
            l: [int(b) for b in rng.choice([2, 3, 4], cfg.num_layers)]
            for l in LINEAR_NAMES}})
    got = ev.eval_many(archs, tile=2)
    for a, (m, bits) in zip(archs, got):
        m_ref, bits_ref = ev.eval(a)
        assert bits == pytest.approx(bits_ref)
        assert m["synthetic"] == pytest.approx(m_ref["synthetic"],
                                               rel=1e-5, abs=1e-7)


@pytest.mark.slow
def test_sensitivity_paths_agree(setup):
    """All three sensitivity strategies — suffix (cached block-input
    resume), batched eval_many, and the sequential probe loop — must
    produce the same loss table (the suffix path skips the all-4 prefix
    blocks, which is mathematically identical, not approximate)."""
    cfg, params, _ = setup
    toks = synthetic_tokens(cfg.vocab_size, n_sample=2, seqlen=64, seed=1)
    ev = Evaluator(cfg, dense_params=params, datasets={"synthetic": toks},
                   batch_size=2)
    table_suffix = linear_sensitivity(ev, "synthetic")     # default: suffix
    table_many = linear_sensitivity(ev, "synthetic", suffix=False)
    ev.eval_many = None                       # force the sequential path
    table_seq = linear_sensitivity(ev, "synthetic", suffix=False)
    assert set(table_suffix["loss"]) == set(table_seq["loss"])
    for k in table_seq["loss"]:
        assert table_many["loss"][k] == pytest.approx(
            table_seq["loss"][k], rel=1e-5, abs=1e-7)
        assert table_suffix["loss"][k] == pytest.approx(
            table_seq["loss"][k], rel=1e-4, abs=1e-6)


@pytest.mark.slow
def test_device_resident_cache_matches_host(setup):
    """defer_logit_cache + dense_logits_device: the dense pass writes
    per-batch logits straight into the device cache (dev->host on the
    tunneled backend is ~10-17 MB/s — a 7B 128-sample gather would take
    ~25 min).  Same eval results as the host-cached mode, plus
    cache_dataset / alias_dataset / free_dataset lifecycle."""
    cfg, params, _ = setup
    toks = synthetic_tokens(cfg.vocab_size, n_sample=4, seqlen=64, seed=3)
    ev_host = Evaluator(cfg, dense_params=params,
                        datasets={"synthetic": toks}, batch_size=2)
    ev_dev = Evaluator(cfg, dense_params=params,
                       datasets={"synthetic": toks}, batch_size=2,
                       dense_logits_device=True, defer_logit_cache=True)
    ev_dev.dense_cache_dtype = jnp.dtype(jnp.float16)  # match host fp16
    assert ev_dev.dense_logits.get("synthetic") is None
    ev_dev.cache_dataset("synthetic")
    assert ev_dev.dense_logits["synthetic"] is None          # device-only
    assert ev_dev._dense_dev_bytes > 0

    arch = _uniform(cfg, 3)
    m_host, _ = ev_host.eval(arch)
    m_dev, _ = ev_dev.eval(arch)
    assert m_dev["synthetic"] == pytest.approx(m_host["synthetic"],
                                               rel=1e-4, abs=1e-6)

    # suffix sensitivity over the device cache.  rel 1e-3: the host path
    # rounds f32 head logits through bf16 before its fp16 store, the
    # device path casts f32 -> fp16 directly (one rounding fewer)
    t_host = linear_sensitivity(ev_host, "synthetic")
    t_dev = linear_sensitivity(ev_dev, "synthetic")
    for k in t_host["loss"]:
        assert t_dev["loss"][k] == pytest.approx(t_host["loss"][k],
                                                 rel=1e-3, abs=1e-5)

    # alias: first 2 rows share the pinned batches (no recompute)
    ev_dev.alias_dataset("slice", "synthetic", 2)
    m_slice, _ = ev_dev.eval_many([arch])[0]
    assert "slice" in m_slice
    # free: evicted rows must raise, not silently recompute wrong
    ev_dev.free_dataset("synthetic")
    with pytest.raises(RuntimeError):
        ev_dev.eval(arch)


def test_fold_nibble_eval_parity(monkeypatch):
    """Two-branch nibble-folded eval (AMQ_EVAL_FOLD_NIBBLE=1) must match
    the plain three-branch evaluator to float tolerance on mixed and
    uniform archs — the fold is the 7B one-chip unblock path
    (docs/MEASUREMENTS.md r5 entry)."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from amq_tpu.models import get_config, init_params
    from amq_tpu.models.config import LINEAR_NAMES
    from amq_tpu.evaluation import Evaluator
    from amq_tpu.evaluation.data import synthetic_tokens
    from amq_tpu.evaluation.sensitivity import SuffixArchEvaluator

    cfg = get_config("tiny-llama")
    params = init_params(cfg, jax.random.PRNGKey(0))
    toks = synthetic_tokens(cfg.vocab_size, n_sample=3, seqlen=64, seed=0)
    rng = np.random.default_rng(5)
    archs = [{"linear": {l: rng.choice([2, 3, 4], cfg.num_layers).tolist()
                         for l in LINEAR_NAMES}} for _ in range(2)]
    archs.append({"linear": {l: [2] * cfg.num_layers for l in LINEAR_NAMES}})

    plain = Evaluator(cfg, dense_params=params, datasets={"d": toks},
                      batch_size=2, compute_dtype=jnp.float32)
    want = [plain.eval(a) for a in archs]

    monkeypatch.setenv("AMQ_EVAL_FOLD_NIBBLE", "1")
    folded = Evaluator(cfg, dense_params=params, datasets={"d": toks},
                       batch_size=2, compute_dtype=jnp.float32)
    assert folded.folded
    sev = SuffixArchEvaluator(folded, "d")
    for a, (mw, bw) in zip(archs, want):
        mg, bg = sev.eval(a)
        assert abs(mw["d"] - mg["d"]) < 1e-6
        assert bw == bg
    # the plain eval path on a folded model routes through set_arch
    m2, _ = folded.eval(archs[0])
    assert abs(m2["d"] - want[0][0]["d"]) < 1e-6
