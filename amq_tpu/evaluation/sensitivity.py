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
    cfg = evaluator.cfg
    n_block = cfg.num_layers
    arch = {"linear": {l: [max_bits] * n_block for l in LINEAR_NAMES}}

    loss_list: Dict[str, float] = {}
    start = time.time()
    for block_idx in range(n_block):
        for linear_group in LINEAR_NAMES:
            key = f"{block_idx}.{linear_group}"
            arch["linear"][linear_group][block_idx] = probe_bits
            metric, _ = evaluator.eval(arch)
            loss_list[key] = metric[dataset]
            arch["linear"][linear_group][block_idx] = max_bits
            if progress:
                print(f"{key}: {loss_list[key]:.6f}", flush=True)

    return {
        "loss": loss_list,
        "time_elapsed": time.time() - start,
        "dataset": dataset,
        "n_block": n_block,
        "linear": list(LINEAR_NAMES),
    }
