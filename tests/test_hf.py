"""Real-weights code paths: HF checkpoint round-trip, real tokenizer load,
dataset chunking semantics (incl. mocked hub datasets) — VERDICT r1 items
5 and weak-7: these paths must not be dead code."""

import sys
import types

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from amq_tpu.evaluation import data as data_mod
from amq_tpu.models import get_config, init_params
from amq_tpu.models import hf as hf_mod


@pytest.fixture(scope="module")
def ckpt(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("hf_ckpt") / "tiny-llama-hf")
    cfg = get_config("tiny-llama")
    params = init_params(cfg, jax.random.PRNGKey(0))
    hf_mod.save_hf_checkpoint(params, cfg, path)
    hf_mod.save_dummy_tokenizer(path, cfg.vocab_size)
    return path, cfg, params


def test_hf_checkpoint_roundtrip(ckpt):
    path, cfg, params = ckpt
    cfg2 = hf_mod.config_from_hf(path)
    assert cfg2.hidden_size == cfg.hidden_size
    assert cfg2.num_kv_heads == cfg.num_kv_heads
    loaded = hf_mod.load_hf_params(path, cfg2)
    np.testing.assert_allclose(np.asarray(loaded["embed"]),
                               np.asarray(params["embed"]), rtol=1e-6)
    for i in range(cfg.num_layers):
        np.testing.assert_allclose(
            np.asarray(loaded["layers"][i]["self_attn.q_proj"].weight),
            np.asarray(params["layers"][i]["self_attn.q_proj"].weight),
            rtol=1e-6)


def test_real_tokenizer_and_local_text(ckpt, tmp_path):
    path, cfg, _ = ckpt
    tok = hf_mod.load_tokenizer(path)
    txt = tmp_path / "corpus.txt"
    words = [f"w{(i % (cfg.vocab_size - 1)) + 1}" for i in range(600)]
    txt.write_text("\n".join(" ".join(words[i:i + 20])
                             for i in range(0, 600, 20)))
    toks = data_mod.get_local_text(str(txt), tok, seqlen=64)
    assert toks.ndim == 2 and toks.shape[1] == 64
    assert toks.dtype == np.int32
    assert (toks > 0).all() and (toks < cfg.vocab_size).all()
    # train split: seeded shuffle, subset of lines
    tr = data_mod.get_local_text(str(txt), tok, seqlen=32, train=True,
                                 seed=0, n_sample=10)
    assert tr.shape[1] == 32


class _MockSplit:
    """datasets.Dataset stand-in with the slicing the loaders use."""

    def __init__(self, rows):
        self._rows = rows

    def shuffle(self, seed):
        rng = np.random.default_rng(seed)
        order = rng.permutation(len(self._rows))
        return _MockSplit([self._rows[i] for i in order])

    def __getitem__(self, key):
        if isinstance(key, slice):
            return {"text": [r for r in self._rows[key]]}
        if key == "text":
            return list(self._rows)
        raise KeyError(key)

    def __iter__(self):
        return ({"text": r} for r in self._rows)


def test_wikitext_c4_chunking_semantics(ckpt, monkeypatch):
    """get_wikitext2/get_c4 slicing against a mocked `datasets` module:
    \\n\\n join (wikitext test), seeded-shuffle first-n (train), 1100-doc
    space join with 256*seqlen cap (c4 val) — utils/data.py:15-76."""
    path, cfg, _ = ckpt
    tok = hf_mod.load_tokenizer(path)
    rows = [f"w{(i % 60) + 1} w{(i % 50) + 2}" for i in range(1200)]

    mock = types.ModuleType("datasets")

    def load_dataset(name, *a, **kw):
        return _MockSplit(rows)

    mock.load_dataset = load_dataset
    monkeypatch.setitem(sys.modules, "datasets", mock)

    wt = data_mod.get_wikitext2(tok, seqlen=32)
    ref_text = "\n\n".join(rows)
    ref_ids = np.asarray(tok(ref_text, return_tensors="np").input_ids[0])
    n = ref_ids.size // 32
    np.testing.assert_array_equal(wt, ref_ids[: n * 32].reshape(n, 32))

    wt_tr = data_mod.get_wikitext2(tok, seqlen=16, train=True, seed=3,
                                   n_sample=7)
    ref_rows = _MockSplit(rows).shuffle(seed=3)[:7]["text"]
    ref_ids = np.asarray(tok("\n\n".join(ref_rows),
                             return_tensors="np").input_ids[0])
    n = ref_ids.size // 16
    np.testing.assert_array_equal(wt_tr, ref_ids[: n * 16].reshape(n, 16))

    c4 = data_mod.get_c4(tok, seqlen=8)
    ref_ids = np.asarray(tok(" ".join(rows[:1100]),
                             return_tensors="np").input_ids[0])[: 256 * 8]
    n = ref_ids.size // 8
    np.testing.assert_array_equal(c4, ref_ids[: n * 8].reshape(n, 8))


@pytest.mark.slow
def test_cli_pipeline_on_hf_checkpoint(ckpt, tmp_path):
    """quantize CLI end-to-end on an HF-format checkpoint + real tokenizer
    + local-text dataset (the non-synthetic code path)."""
    path, cfg, _ = ckpt
    txt = tmp_path / "corpus.txt"
    words = [f"w{(i % (cfg.vocab_size - 1)) + 1}" for i in range(4000)]
    txt.write_text("\n".join(" ".join(words[i:i + 40])
                             for i in range(0, 4000, 40)))

    from amq_tpu.cli import sensitivity as sens_cli
    out = tmp_path / "sens"
    sens_cli.main([
        "--model_path", path, "--dataset", f"local:{txt}",
        "--platform", "cpu", "--n_sample", "4", "--seqlen", "64",
        "--save_path", str(out)])
    import glob as g
    files = g.glob(str(out / "*.json"))
    assert files, "sensitivity output missing"


def test_pileval_chunking_semantics(ckpt, monkeypatch):
    """get_pileval vs the reference contract (quantization/base.py:7-34):
    seed-42 shuffle, per-line encode, skip >512-token lines, first-n
    lines concatenated and split into block_size blocks."""
    path, cfg, _ = ckpt
    tok = hf_mod.load_tokenizer(path)
    rows = [f"w{(i % 60) + 1} w{(i % 50) + 2} w{(i % 40) + 3}"
            for i in range(300)]
    rows[5] = " ".join(f"w{(j % 60) + 1}" for j in range(600))  # >512 toks

    mock = types.ModuleType("datasets")
    mock.load_dataset = lambda *a, **kw: _MockSplit(rows)
    monkeypatch.setitem(sys.modules, "datasets", mock)

    got = data_mod.get_pileval(tok, block_size=16, n_lines=20)

    parts, n_run = [], 0
    for r in _MockSplit(rows).shuffle(seed=42)._rows:
        enc = np.asarray(tok.encode(r.strip()))
        if enc.size > 512 or enc.size == 0:
            continue
        parts.append(enc)
        n_run += 1
        if n_run == 20:
            break
    ref = np.concatenate(parts)
    n = ref.size // 16
    np.testing.assert_array_equal(got, ref[: n * 16].reshape(n, 16))
