"""Batched decode cost vs slot count (continuous-serving diagnosis).

Weight streaming is shared across the batch in the m<=8 GEMV regime, so
decode_chunk per-STEP cost should be nearly flat in n_slots — if it
isn't, the batch path (per-slot attention cache DMA, slot masking) is
the continuous-throughput bottleneck rather than the scheduler.  Also
sweeps chunk_steps to size the per-chunk host round trip (~25 ms on the
axon tunnel).

Host-transfer sync (block_until_ready is unreliable on tunneled
backends).  Run: python scripts/bench_batched_decode.py [model]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax_comp"))

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import bench  # noqa: E402  (reuse the bench model builder)
from amq_tpu.serving.batched import SlotEngine  # noqa: E402

MODEL = sys.argv[1] if len(sys.argv) > 1 else bench.MODEL
MAX_LEN = int(os.environ.get("BBD_MAX_LEN", "512"))
PROMPT = int(os.environ.get("BBD_PROMPT", "64"))


def main():
    print(f"devices: {jax.devices()}", flush=True)
    cfg = bench.get_config(MODEL)
    rng = np.random.default_rng(0)
    model = bench.random_stacked_model(cfg, rng)
    jax.block_until_ready(model.embed)

    for n_slots in (1, 2, 4, 8):
        for chunk in (8, 32):
            # fresh engine per config: accumulated steps would otherwise
            # push lengths past MAX_LEN and the timed chunks would measure
            # clamped out-of-bounds cache writes, not steady-state decode
            eng = SlotEngine(model, cfg, n_slots=n_slots, max_len=MAX_LEN,
                             compute_dtype=jnp.bfloat16, use_pallas=True,
                             prefill_buckets=(PROMPT,), chunk_steps=8)
            for slot in range(n_slots):
                prompt = rng.integers(0, cfg.vocab_size,
                                      PROMPT).astype(np.int32)
                eng.prefill(slot, prompt)
            active = np.ones(n_slots, bool)
            eng.step_chunk(active, chunk)        # warmup/compile
            best = None
            for _ in range(3):
                t0 = time.perf_counter()
                reps = 4
                for _ in range(reps):
                    eng.step_chunk(active, chunk)
                dt = (time.perf_counter() - t0) / reps
                best = dt if best is None else min(best, dt)
            per_step = best / chunk
            agg = n_slots / per_step
            print(f"slots={n_slots} chunk={chunk}: {best*1e3:.1f}ms/chunk "
                  f"{per_step*1e3:.2f}ms/step -> {agg:.0f} tok/s aggregate",
                  flush=True)


if __name__ == "__main__":
    main()
