"""Continuous-batching throughput on the bench 7B model (real TPU).

Re-measures the README slot-batched numbers after the flash-decode
attention kernel (per-slot DMA clamped to each slot's live length) and
the append-only KV path landed in the slot engine.
"""

import os
import sys
import json

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax_comp"))

import numpy as np  # noqa: E402
import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from amq_tpu.models import get_config  # noqa: E402
from amq_tpu.serving.benchmark import benchmark_continuous  # noqa: E402
from bench import random_stacked_model, MODEL  # noqa: E402


def main():
    print(f"devices: {jax.devices()}", file=sys.stderr, flush=True)
    cfg = get_config(MODEL)
    model = random_stacked_model(cfg, np.random.default_rng(0))
    jax.block_until_ready(model.embed)
    slots = tuple(int(s) for s in os.environ.get("SLOTS", "4,8").split(","))
    for n in slots:
        r = benchmark_continuous(model, cfg, n_slots=n,
                                 n_requests=4 * n, prompt_len=64,
                                 gen_len=64, max_len=512)
        print(json.dumps(r), flush=True)


if __name__ == "__main__":
    main()
