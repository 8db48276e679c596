"""Non-power-of-two decode n-tiles for odd-lane sites (Llama-2-13B).

13B's o/down sites have N=5120 lanes: the power-of-two candidate list
drops them to bn=1024 (5 n-tiles), and lane-padding to 2048 would cost
+20% streamed bytes (> the n/7 bound).  bn=2560 divides 5120 exactly
(2 tiles, 20 lanes of 128) — this measures chained decode GEMVs at the
13B shapes for bn in {1024, 2560} per container width.

    python scripts/bisect12.py
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

from amq_tpu.core.quantize import quantize, to_container      # noqa: E402
from amq_tpu.ops.quant_matmul import _quant_matmul_packed     # noqa: E402

HBM_PEAK = 819e9
#: chain-length differencing cancels the host->device dispatch RTT (the
#: axon tunnel adds ~25 ms per blocking call, which dwarfs a 40-step
#: chain — measured 648 us/gemv "per step" for a 16 us kernel)
STEPS_LO = 64
STEPS_HI = 576
REPS = 8

# 13B odd-lane decode sites (N, K_padded-by-quantize)
SHAPES = [("o_13b", 5120, 5120), ("down_13b", 5120, 13824)]


def bench(label, N, K, nbits, container, bn):
    rng = np.random.default_rng(0)
    W = jnp.asarray(rng.normal(size=(N, K)).astype(np.float32))
    qt = quantize(W, nbits=nbits, group_size=128, optimize=False,
                  meta_dtype=jnp.bfloat16)
    if container != nbits:
        qt = to_container(qt, container)
    x0 = jnp.asarray(rng.normal(size=(1, qt.in_features)), jnp.bfloat16)

    def step(x, _):
        y = _quant_matmul_packed(
            x, qt.packed, qt.scale, qt.zero, nbits=container,
            group_size=128, shape=qt.shape, superblock=qt.superblock_,
            block_n=bn, acc_dtype=jnp.bfloat16, out_dtype=jnp.bfloat16)
        reps = -(-qt.in_features // N)
        xn = (jnp.tile(y, (1, reps))[:, :qt.in_features]
              if reps > 1 else y[:, :qt.in_features])
        return xn * jnp.bfloat16(1e-3), None

    def timed(steps):
        @jax.jit
        def chain(x):
            xf, _ = jax.lax.scan(step, x, None, length=steps)
            return xf

        chain(x0).block_until_ready()
        best = 1e9
        for _ in range(REPS):
            t0 = time.perf_counter()
            chain(x0).block_until_ready()
            best = min(best, time.perf_counter() - t0)
        return best

    per = (timed(STEPS_HI) - timed(STEPS_LO)) / (STEPS_HI - STEPS_LO)
    byts = qt.packed.nbytes + qt.scale.nbytes + qt.zero.nbytes
    gbs = byts / per / 1e9
    print(f"{label} {nbits}b/c{container} bn={bn}: {per*1e6:7.1f} us/gemv "
          f"{gbs:6.0f} GB/s ({gbs*1e9/HBM_PEAK*100:4.1f}% peak)",
          flush=True)
    return per


if __name__ == "__main__":
    print(f"devices: {jax.devices()}", flush=True)
    for label, N, K in SHAPES:
        for nbits, container in ((4, 4), (2, 2)):
            for bn in (1024, 2560):
                bench(label, N, K, nbits, container, bn)
