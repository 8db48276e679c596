"""Long-context decode A/B: flash-decode attention kernel vs XLA split path.

The decode attention kernel (ops/decode_attention.py) exists to kill the
per-layer [B,kv,T,hd] cache-slice materialization, whose cost grows with
the cache length T.  The headline bench (prompt 64 + gen 128, T=200) barely
exercises it; this script decodes at a long live context.

Run twice:  AMQ_ATTN_KERNEL=1 python scripts/bench_longctx.py
            AMQ_ATTN_KERNEL=0 python scripts/bench_longctx.py
or with CTX=512,1024,1920 to sweep.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax_comp"))

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from amq_tpu.models import get_config  # noqa: E402
from amq_tpu.serving import Engine  # noqa: E402
from bench import random_stacked_model  # noqa: E402

MODEL = os.environ.get("BENCH_MODEL", "Llama-2-7b-hf")
CTXS = tuple(int(c) for c in os.environ.get("CTX", "512,1024,1920").split(","))
GEN = 64
MAX_LEN = 2048


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    log(f"attn_kernel={os.environ.get('AMQ_ATTN_KERNEL', '1')} "
        f"devices={jax.devices()}")
    cfg = get_config(MODEL)
    rng = np.random.default_rng(0)
    model = random_stacked_model(cfg, rng)
    jax.block_until_ready(model.embed)
    eng = Engine(model, cfg, batch_size=1, max_len=MAX_LEN,
                 compute_dtype=jnp.bfloat16, use_pallas=True)

    for ctx in CTXS:
        prompt = rng.integers(0, cfg.vocab_size, (1, ctx)).astype(np.int32)
        cache = eng.new_cache()
        last, cache = eng._prefill(eng.params, jnp.asarray(prompt), cache)
        first = jnp.argmax(last, axis=-1).astype(jnp.int32)
        np.asarray(first)
        # compile
        toks, _ = eng._decode_n(eng.params, first, cache, n_steps=GEN)
        np.asarray(toks)
        best = np.inf
        for _ in range(3):
            c2 = eng.new_cache()
            last, c2 = eng._prefill(eng.params, jnp.asarray(prompt), c2)
            f2 = jnp.argmax(last, axis=-1).astype(jnp.int32)
            np.asarray(f2)
            t0 = time.time()
            toks, _ = eng._decode_n(eng.params, f2, c2, n_steps=GEN)
            np.asarray(toks)
            best = min(best, time.time() - t0)
        log(f"ctx={ctx}: {GEN} tokens in {best*1e3:.1f}ms "
            f"({GEN/best:.1f} tok/s, {best/GEN*1e3:.2f} ms/token)")


if __name__ == "__main__":
    main()
