#!/usr/bin/env python
"""7B search-mode Evaluator on ONE real chip: init (dense logit cache +
3 proxies) and two arch evals.

Exercises the memory-staging path end-to-end at real scale: host-resident
bf16 dense params, layer-chunked dense logit-cache pass, packed proxy
stacks, chunked-JSD loss step.  The reference runs this stage on A100-80GB
(SURVEY §2.3); one v5e chip has 16 GB, hence the staging.

    python scripts/smoke_7b_eval.py [model] [n_sample] [seqlen]
"""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax_comp"))
import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from amq_tpu.models import get_config, init_params           # noqa: E402
from amq_tpu.models.config import LINEAR_NAMES               # noqa: E402
from amq_tpu.evaluation import Evaluator                     # noqa: E402
from amq_tpu.evaluation.data import synthetic_tokens         # noqa: E402

model = sys.argv[1] if len(sys.argv) > 1 else "Llama-2-7b-hf"
n_sample = int(sys.argv[2]) if len(sys.argv) > 2 else 16
seqlen = int(sys.argv[3]) if len(sys.argv) > 3 else 2048


def device_gib(tag):
    by_kind = {}
    total = 0
    for a in jax.live_arrays():
        try:
            plat = next(iter(a.sharding.device_set)).platform
        except Exception:
            plat = "tpu"  # count unknowns
        if plat != "tpu":
            continue
        total += a.nbytes
        if a.nbytes > 64 * 2**20:
            key = (str(a.dtype), tuple(a.shape))
            by_kind[key] = by_kind.get(key, 0) + a.nbytes
    print(f"[mem] {tag}: {total/2**30:.2f} GiB live on TPU", flush=True)
    for (dt, shp), nb in sorted(by_kind.items(), key=lambda kv: -kv[1])[:12]:
        print(f"[mem]   {nb/2**30:6.2f} GiB  {dt} {shp}", flush=True)

cfg = get_config(model)
cpu = jax.devices("cpu")[0]
t0 = time.time()
with jax.default_device(cpu):
    params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.bfloat16)
print(f"host init: {time.time()-t0:.0f}s", flush=True)

toks = synthetic_tokens(cfg.vocab_size, n_sample=n_sample, seqlen=seqlen,
                        seed=0)
t0 = time.time()
ev = Evaluator(cfg, dense_params=params, datasets={"synthetic": toks},
               batch_size=8, compute_dtype=jnp.bfloat16)
print(f"Evaluator init (logit cache + 3 proxies): {time.time()-t0:.0f}s",
      flush=True)
device_gib("after init")

arch = {"linear": {l: [2 + (i % 3) for i in range(cfg.num_layers)]
                   for l in LINEAR_NAMES}}
t0 = time.time()
m, bits = ev.eval(arch)
print(f"first eval: {time.time()-t0:.0f}s loss={m['synthetic']:.4f} "
      f"bits={bits:.3f}", flush=True)
device_gib("after first eval")
t0 = time.time()
m, bits = ev.eval(arch)
dt = time.time() - t0
print(f"second eval (compiled+pinned): {dt:.1f}s -> "
      f"{dt/n_sample*1e3:.0f} ms/sample", flush=True)
