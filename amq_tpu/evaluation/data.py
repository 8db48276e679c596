"""Calibration / evaluation token pipelines.

Token-slicing semantics mirror the reference exactly (utils/data.py:15-76):

* wikitext2 test: join all lines with ``"\\n\\n"``, tokenize once, truncate
  to a multiple of seqlen, reshape ``[n_sample, seqlen]``,
* wikitext2 train: seeded ``datasets.shuffle``, first ``n_sample`` *rows*
  of text joined and re-chunked,
* c4 validation: first 1100 docs joined by space, cap 256*seqlen tokens,
* c4 train: seeded shuffle of the first train shard, first n_sample docs.

In this environment HF hub access is unavailable; loaders raise a clear
error when the dataset cache is missing, and :func:`synthetic_tokens`
provides a deterministic stand-in with the same ``[n_sample, seqlen]``
contract for tests and benches.

A "loader" is just an int32 array ``[n_sample, seqlen]`` — batching is
slicing, sharding is a NamedSharding over the 'data' mesh axis.
"""

from __future__ import annotations

from typing import Optional

import numpy as np


def synthetic_tokens(vocab_size: int, n_sample: int = 8, seqlen: int = 128,
                     seed: int = 0) -> np.ndarray:
    """Deterministic Zipf-ish token stream (synthetic wikitext stand-in)."""
    rng = np.random.default_rng(seed)
    # Zipf-like marginal + short-range repetition structure so that a
    # language model actually has something to fit / compare against.
    ranks = np.arange(1, vocab_size + 1, dtype=np.float64)
    probs = 1.0 / ranks
    probs /= probs.sum()
    flat = rng.choice(vocab_size, size=n_sample * seqlen, p=probs)
    # repeat-previous-token structure
    rep = rng.random(flat.shape) < 0.3
    flat[1:][rep[1:]] = flat[:-1][rep[1:]]
    return flat.reshape(n_sample, seqlen).astype(np.int32)


def _chunk(token_ids: np.ndarray, seqlen: int) -> np.ndarray:
    n = token_ids.size // seqlen
    return token_ids[: n * seqlen].reshape(n, seqlen).astype(np.int32)


def _require_datasets():
    try:
        import datasets  # noqa: F401
        return datasets
    except Exception as e:  # pragma: no cover
        raise RuntimeError("HF `datasets` unavailable") from e


def get_wikitext2(tokenizer, seqlen: int = 2048, train: bool = False,
                  seed: int = 0, n_sample: int = 128,
                  cache_dir: Optional[str] = None) -> np.ndarray:
    """utils/data.py:15-21 (test) / :34-42 (train) semantics."""
    datasets = _require_datasets()
    if train:
        d = datasets.load_dataset("wikitext", "wikitext-2-raw-v1",
                                  split="train", cache_dir=cache_dir)
        d = d.shuffle(seed=seed)
        text = "\n\n".join(d[:n_sample]["text"])
    else:
        d = datasets.load_dataset("wikitext", "wikitext-2-raw-v1",
                                  split="test", cache_dir=cache_dir)
        text = "\n\n".join(d["text"])
    ids = np.asarray(tokenizer(text, return_tensors="np").input_ids[0])
    return _chunk(ids, seqlen)


def get_c4(tokenizer, seqlen: int = 2048, train: bool = False, seed: int = 0,
           n_sample: int = 128, cache_dir: Optional[str] = None) -> np.ndarray:
    """utils/data.py:23-32 (validation) / :44-54 (train) semantics."""
    datasets = _require_datasets()
    if train:
        d = datasets.load_dataset(
            "allenai/c4",
            data_files={"train": "en/c4-train.00000-of-01024.json.gz"},
            split="train", cache_dir=cache_dir)
        d = d.shuffle(seed=seed)
        text = " ".join(d[:n_sample]["text"])
        ids = np.asarray(tokenizer(text, return_tensors="np").input_ids[0])
        return _chunk(ids, seqlen)
    d = datasets.load_dataset(
        "allenai/c4",
        data_files={"validation": "en/c4-validation.00000-of-00008.json.gz"},
        split="validation", cache_dir=cache_dir)
    ids = np.asarray(tokenizer(" ".join(d[:1100]["text"]),
                               return_tensors="np").input_ids[0])
    ids = ids[: 256 * seqlen]
    return _chunk(ids, seqlen)


def get_pileval(tokenizer, block_size: int = 512, n_lines: int = 512,
                seed: int = 42,
                cache_dir: Optional[str] = None) -> np.ndarray:
    """AWQ's pileval calibration set with the reference's exact semantics
    (quantization/base.py:7-34): shuffle seed 42, per-line tokenize, skip
    lines longer than 512 tokens, take ``n_lines`` lines, concatenate and
    split into ``block_size``-token blocks."""
    datasets = _require_datasets()
    d = datasets.load_dataset("mit-han-lab/pile-val-backup",
                              split="validation", cache_dir=cache_dir)
    d = d.shuffle(seed=seed)
    ids_parts = []
    n_run = 0
    for row in d:
        enc = np.asarray(tokenizer.encode(row["text"].strip()))
        if enc.size > 512 or enc.size == 0:
            continue
        ids_parts.append(enc)
        n_run += 1
        if n_run == n_lines:
            break
    return _chunk(np.concatenate(ids_parts), block_size)


def get_local_text(path: str, tokenizer, seqlen: int = 2048,
                   train: bool = False, seed: int = 0,
                   n_sample: int = 128) -> np.ndarray:
    """Local text file with wikitext2 slicing semantics: lines joined by
    ``"\\n\\n"`` (test) or a seeded line shuffle's first ``n_sample`` lines
    (train) — so airgapped environments can run the real loader path on a
    real corpus file (utils/data.py:15-21/:34-42 contract)."""
    with open(path) as f:
        lines = f.read().splitlines()
    if train:
        rng = np.random.default_rng(seed)
        order = rng.permutation(len(lines))[:n_sample]
        text = "\n\n".join(lines[i] for i in order)
    else:
        text = "\n\n".join(lines)
    ids = np.asarray(tokenizer(text, return_tensors="np").input_ids[0])
    return _chunk(ids, seqlen)


def get_loader(name: str, tokenizer=None, n_sample: int = 128,
               train: bool = True, seed: int = 0, seqlen: int = 2048,
               cache_dir: Optional[str] = None,
               synthetic_vocab: Optional[int] = None) -> np.ndarray:
    """Reference get_loader (utils/data.py:63-76) + synthetic escape hatch."""
    if name == "synthetic":
        assert synthetic_vocab is not None
        return synthetic_tokens(synthetic_vocab, n_sample=n_sample,
                                seqlen=seqlen, seed=seed)
    if name.startswith("local:"):
        toks = get_local_text(name[len("local:"):], tokenizer, seqlen=seqlen,
                              train=train, seed=seed, n_sample=n_sample)
        return toks[:n_sample] if train else toks
    if name == "pileval":
        return get_pileval(tokenizer, block_size=seqlen,
                           cache_dir=cache_dir)
    if "wikitext2" in name:
        return get_wikitext2(tokenizer, seqlen=seqlen, train=train, seed=seed,
                             n_sample=n_sample, cache_dir=cache_dir)
    if "c4" in name:
        return get_c4(tokenizer, seqlen=seqlen, train=train, seed=seed,
                      n_sample=n_sample, cache_dir=cache_dir)
    raise ValueError(f"unknown dataset {name!r}")
