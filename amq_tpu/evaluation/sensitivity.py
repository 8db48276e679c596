"""Layer-wise sensitivity analysis for search-space pruning.

Behavioral mirror of amq/amq_sensitivity.py:16-81: start from the all-4-bit
architecture, drop each (block, linear) site to 2-bit in turn, measure the
JSD loss against the dense model, and record a ``{block}.{linear} -> loss``
table (the search uses it to pin layers whose loss exceeds
``median * threshold`` to max bits, search/optimizer.py:53-55).

The output dict schema matches the reference sensitivity JSON so archives
are interchangeable.

Two evaluation strategies:

* ``suffix`` (default in search mode): every probe arch is identical to
  the all-4 baseline up to its probe block, so its activations are too —
  the probe resumes from the baseline's cached block-b input and runs
  only blocks ``b..L`` (models/stacked.forward_stacked_suffix).  Total
  block-compute drops to ``(sum_b P*(L-b) + L) / (P*L*L)`` ~ 52% of the
  naive stage at L=32, with bit-identical losses (parity-tested).  The
  reference re-runs the full forward per probe (amq_sensitivity.py:49-63).
* naive: full forward per probe via Evaluator.eval_many / eval.
"""

from __future__ import annotations

import time
from typing import Dict, Optional

import numpy as np

from ..models.config import LINEAR_NAMES, ModelConfig
from .evaluator import Evaluator


def _suffix_losses(ev: Evaluator, dataset: str, keys, probes, base,
                   n_block: int, progress: bool) -> Dict[str, float]:
    """Suffix-evaluated probe losses (see module docstring)."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from ..models.stacked import forward_stacked_suffix, scan_layers
    from . import metrics

    cfg = ev.cfg
    P = len(LINEAR_NAMES)
    m = ev._stacked.set_arch(ev.switch_params, base)    # all-4 baseline
    sel_by_block = [ev._select_stack(probes[b * P:(b + 1) * P])
                    for b in range(n_block)]

    jsd_chunk = ev._jsd_chunk
    loss_dtype = ev._loss_dtype
    cd = ev.compute_dtype

    @jax.jit
    def embed_fn(mm, t):
        return mm.embed[t].astype(cd)

    @jax.jit
    def advance(mm, x, b):
        # apply block b at baseline bits (cond-skips every other layer)
        return scan_layers(mm, cfg, x, compute_dtype=cd,
                           start_layer=b, stop_layer=b + 1)[0]

    @jax.jit
    def probe_loss(mm, sel, x, dense, b):
        # ONE probe per dispatch: the lax.map-over-7-probes variant OOMed
        # a 16 GB chip at 7B next to the proxy stacks + fp8 logit cache
        # (XLA's map buffering), while this program is the proven
        # _loss_step shape plus the cond-suffix wrapper.  Dispatches stay
        # async (results are synced per batch, not per probe), so the
        # ~25 ms tunnel dispatch overlaps device work.
        logits = forward_stacked_suffix(
            dataclasses.replace(mm, select=sel), cfg, x, b,
            compute_dtype=cd).astype(loss_dtype)
        return metrics.jsd_shifted_per_sample(logits, dense,
                                              chunk=jsd_chunk)

    toks = ev.datasets[dataset]
    dense_logits = ev.dense_logits[dataset]
    sums = np.zeros((n_block, P))
    batches = list(ev._batches(toks, batch_size=ev._loss_batch))
    starts = np.cumsum([0] + [nv for _, nv in batches])[:-1]
    for bi, ((batch, n_valid), st) in enumerate(zip(batches, starts)):
        tb = ev._shard_tokens(jnp.asarray(batch))
        dense = ev._dense_batch(dense_logits, int(st), n_valid,
                                batch.shape[0], cache_key=dataset)
        x = embed_fn(m, tb)
        for b in range(n_block):
            sels = sel_by_block[b]
            vals = []
            for j in range(P):
                sel_j = {k: v[j] for k, v in sels.items()}
                vals.append(probe_loss(m, sel_j, x, dense, jnp.int32(b)))
            if b + 1 < n_block:
                x = advance(m, x, jnp.int32(b))
            # sync per BLOCK (after dispatching the next block's advance,
            # so host sync overlaps device work).  A whole-batch async
            # queue pins every block's [B, S, H] activation buffer at
            # once (~32 x 128 MiB at 7B) and OOMs the 16 GB chip next to
            # the proxy stacks + fp8 logit cache; per-block sync bounds
            # live activations to two blocks for ~25 ms/block tunnel cost.
            for j, v in enumerate(vals):
                sums[b, j] += np.asarray(v)[:n_valid].sum()
        if progress:
            print(f"sensitivity batch {bi + 1}/{len(batches)} "
                  f"({st + n_valid}/{toks.shape[0]} samples)", flush=True)
    total = toks.shape[0]
    return {keys[b * P + j]: float(sums[b, j] / total)
            for b in range(n_block) for j in range(P)}


def make_suffix_arch_eval(ev: Evaluator, dataset: str):
    """Arch-evaluation closure through the sensitivity-stage program shape.

    ``probe_loss`` at ``b=0`` IS a full-arch evaluation: embed runs in its
    own jit, the layer scan is the cond-bounded suffix program, and the
    head+JSD follow — numerically identical to ``Evaluator.eval``
    (suffix==naive parity is pinned by tests).  At 7B on one chip this is
    the only loss program PROVEN to compile and execute next to the
    resident proxy stacks (round-4 sensitivity artifact); the one-shot
    ``_forward_logits`` program OOMs there (RESOURCE_EXHAUSTED at first
    execution) even at batch 2 with single-plane branches.

    Returns ``eval_fn(arch) -> ({dataset: loss}, bits_usage)`` with all
    jits built once (no per-arch retrace).
    """
    import dataclasses

    import jax
    import jax.numpy as jnp

    from ..models.stacked import forward_stacked_suffix
    from . import metrics

    cfg = ev.cfg
    m = ev.switch_params
    jsd_chunk = ev._jsd_chunk
    loss_dtype = ev._loss_dtype
    cd = ev.compute_dtype

    @jax.jit
    def embed_fn(mm, t):
        return mm.embed[t].astype(cd)

    folded = getattr(ev, "folded", False)

    @jax.jit
    def arch_loss(mm, fields, x, dense):
        logits = forward_stacked_suffix(
            dataclasses.replace(mm, **fields), cfg, x, jnp.int32(0),
            compute_dtype=cd).astype(loss_dtype)
        return metrics.jsd_shifted_per_sample(logits, dense,
                                              chunk=jsd_chunk)

    def arch_fields(arch):
        if folded:
            from ..models.stacked import arch_fold_selectors
            sel, slots = arch_fold_selectors(m, arch)
            return {"select": sel, "site_slots": slots}
        return {"select": {k: v[0]
                           for k, v in ev._select_stack([arch]).items()}}

    toks = ev.datasets[dataset]
    dense_logits = ev.dense_logits[dataset]
    batches = list(ev._batches(toks, batch_size=ev._loss_batch))
    starts = np.cumsum([0] + [nv for _, nv in batches])[:-1]
    total = toks.shape[0]

    def eval_fn(arch):
        fields = arch_fields(arch)
        s = 0.0
        for (batch, n_valid), st in zip(batches, starts):
            tb = ev._shard_tokens(jnp.asarray(batch))
            dense = ev._dense_batch(dense_logits, int(st), n_valid,
                                    batch.shape[0], cache_key=dataset)
            x = embed_fn(m, tb)
            s += float(np.asarray(arch_loss(m, fields, x, dense))
                       [:n_valid].sum())
        bits = metrics.get_bits_usage(arch, ev.topology, ev.group_size)
        return {dataset: s / total}, bits

    return eval_fn


class SuffixArchEvaluator:
    """Adapter presenting :func:`make_suffix_arch_eval` as the
    ``Evaluator.eval`` surface the Search loop consumes (``search=False``
    keeps Search on the per-arch path)."""

    search = False

    def __init__(self, ev: Evaluator, dataset: str):
        self._fn = make_suffix_arch_eval(ev, dataset)

    def eval(self, arch):
        return self._fn(arch)


def linear_sensitivity(
    evaluator: Evaluator,
    dataset: str,
    max_bits: int = 4,
    probe_bits: int = 2,
    progress: bool = False,
    suffix: Optional[bool] = None,
) -> Dict:
    import copy

    cfg = evaluator.cfg
    n_block = cfg.num_layers
    base = {"linear": {l: [max_bits] * n_block for l in LINEAR_NAMES}}

    keys, probes = [], []
    for block_idx in range(n_block):
        for linear_group in LINEAR_NAMES:
            keys.append(f"{block_idx}.{linear_group}")
            a = copy.deepcopy(base)
            a["linear"][linear_group][block_idx] = probe_bits
            probes.append(a)

    if suffix is None:
        suffix = bool(getattr(evaluator, "search", False))
    start = time.time()
    loss_list: Dict[str, float] = {}
    if suffix and getattr(evaluator, "search", False):
        loss_list = _suffix_losses(evaluator, dataset, keys, probes, base,
                                   n_block, progress)
    else:
        many = getattr(evaluator, "eval_many", None)
        if many is not None and getattr(evaluator, "search", False):
            # batched probes: k archs per dispatch (evaluator.eval_many)
            tile = 8
            for ci in range(0, len(probes), tile):
                for key, (metric, _) in zip(
                        keys[ci:ci + tile], many(probes[ci:ci + tile])):
                    loss_list[key] = metric[dataset]
                    if progress:
                        print(f"{key}: {loss_list[key]:.6f}", flush=True)
        else:
            for key, a in zip(keys, probes):
                metric, _ = evaluator.eval(a)
                loss_list[key] = metric[dataset]
                if progress:
                    print(f"{key}: {loss_list[key]:.6f}", flush=True)

    return {
        "loss": loss_list,
        "time_elapsed": time.time() - start,
        "dataset": dataset,
        "n_block": n_block,
        "linear": list(LINEAR_NAMES),
    }
