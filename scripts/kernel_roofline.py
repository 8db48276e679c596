"""Isolated fused dequant-GEMV roofline: % of HBM peak per bit-width.

BASELINE.md's kernel criterion is >=85% of HBM roofline for the fused
dequant-matmul (the contract of the reference's
ft/quantization_new/gemv/gemv_cuda.cu, which exists to be bandwidth-bound).
This measures the Pallas kernel alone — 64 chained decode GEMVs per timed
unit (the output feeds the next input, so steps serialize like the real
scan) — at Llama-2-7B shapes, per packed width.

    python scripts/kernel_roofline.py          # real TPU
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

from jax.experimental.pallas import tpu as pltpu          # noqa: E402

from amq_tpu.core.quantize import quantize, to_container  # noqa: E402
from amq_tpu.ops.quant_matmul import quant_matmul         # noqa: E402

if jax.default_backend() == "cpu":                         # CPU smoke only
    _interp = pltpu.force_tpu_interpret_mode()
    _interp.__enter__()

HBM_PEAK = float(os.environ.get("HBM_PEAK_GBS", "819")) * 1e9  # v5e
STEPS = int(os.environ.get("KR_STEPS", "64"))
REPS = int(os.environ.get("KR_REPS", "10"))
SCALE = int(os.environ.get("KR_SCALE", "1"))  # shrink for CPU smoke

# (label, N out, K in) — the 7B decode sites
SHAPES = [("o_proj", 4096 // SCALE, 4096 // SCALE),
          ("down", 4096 // SCALE, (11008 // SCALE // 128) * 128)]


def bench_site(label, N, K, nbits, container):
    rng = np.random.default_rng(0)
    W = jnp.asarray(rng.normal(size=(N, K)).astype(np.float32))
    qt = quantize(W, nbits=nbits, group_size=128, optimize=False,
                  meta_dtype=jnp.bfloat16)
    if container != nbits:
        qt = to_container(qt, container)
    x0 = jnp.asarray(rng.normal(size=(1, K)).astype(np.float32),
                     jnp.bfloat16)

    def step(x, _):
        y = quant_matmul(x, qt)                    # [1, N]
        # feed back (serialize steps); tile/slice to K lanes
        reps = -(-K // N)
        xn = jnp.tile(y, (1, reps))[:, :K] if reps > 1 else y[:, :K]
        return (xn * 1e-3).astype(jnp.bfloat16), None

    run = jax.jit(lambda x: jax.lax.scan(step, x, None, length=STEPS)[0])
    np.asarray(run(x0))                            # compile + warm
    best = float("inf")
    for _ in range(REPS):
        t0 = time.time()
        np.asarray(run(x0))
        best = min(best, time.time() - t0)
    per = best / STEPS
    bytes_step = (qt.packed.nbytes + qt.scale.nbytes + qt.zero.nbytes)
    gbs = bytes_step / per
    print(f"{label:8s} {nbits}b/{container}c: {per*1e6:7.1f} us/gemv  "
          f"{gbs/1e9:6.1f} GB/s  {gbs/HBM_PEAK*100:5.1f}% of HBM peak",
          flush=True)
    return {"site": label, "nbits": nbits, "container": container,
            "us": per * 1e6, "gbs": gbs / 1e9,
            "roofline_pct": gbs / HBM_PEAK * 100}


def main():
    print(f"devices: {jax.devices()}", flush=True)
    out = []
    for label, N, K in SHAPES:
        for nbits, cont in [(2, 2), (3, 3), (3, 4), (4, 4), (8, 8)]:
            out.append(bench_site(label, N, K, nbits, cont))
    import json
    print(json.dumps(out))


if __name__ == "__main__":
    main()
