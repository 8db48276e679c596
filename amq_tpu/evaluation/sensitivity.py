"""Layer-wise sensitivity analysis for search-space pruning.

Behavioral mirror of amq/amq_sensitivity.py:16-81: start from the all-4-bit
architecture, drop each (block, linear) site to 2-bit in turn, measure the
JSD loss against the dense model, and record a ``{block}.{linear} -> loss``
table (the search uses it to pin layers whose loss exceeds
``median * threshold`` to max bits, search/optimizer.py:53-55).

The output dict schema matches the reference sensitivity JSON so archives
are interchangeable.
"""

from __future__ import annotations

import time
from typing import Dict, Optional

from ..models.config import LINEAR_NAMES, ModelConfig
from .evaluator import Evaluator


def linear_sensitivity(
    evaluator: Evaluator,
    dataset: str,
    max_bits: int = 4,
    probe_bits: int = 2,
    progress: bool = False,
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

    loss_list: Dict[str, float] = {}
    start = time.time()
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
