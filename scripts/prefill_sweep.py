"""Prefill/eval GEMM tile sweep for the M in [8, 256) regime (VERDICT r4
item 5): the prompt-64 prefill falls into a single-m-tile Pallas path
whose (block_n, block_m) choices were never tuned, and the eval GEMM
(M=2048+) runs ~57% MXU.  Sweeps block_n (and block_m where M allows)
per site at M in {64, 256, 2048}, against the XLA dequant+matmul
reference and the compute/byte roofline.

Chain-differenced timing with HOST-TRANSFER sync (block_until_ready does
not reliably synchronize on the tunneled axon backend — bench.py sync()).

Run: python scripts/prefill_sweep.py [site] [M...]
Env: SWEEP_NBITS (default 4), SWEEP_REPS (default 30).
"""

import functools
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

from amq_tpu.ops import quant_matmul as qm  # noqa: E402

SITES = {
    "o": (4096, 4096),
    "qkv": (12288, 4096),
    "gu": (22528, 4096),
    "down": (4096, 11264),
}
GROUP = 128
SB = 1024
NBITS = int(os.environ.get("SWEEP_NBITS", "4"))
REPS = int(os.environ.get("SWEEP_REPS", "30"))
PEAK_TF = 197e12        # v5e bf16
HBM = 819e9


def build(site, M, bn, bm, n_layers, use_xla=False):
    N, K = SITES[site]
    rng = jax.random.PRNGKey(0)
    packed = jax.random.bits(rng, (n_layers, K * NBITS // 32, N), jnp.uint32)
    scale = jnp.full((n_layers, K // GROUP, N), 0.01, jnp.bfloat16)
    zero = jnp.full((n_layers, K // GROUP, N), 3.0, jnp.bfloat16)
    x = jnp.ones((M, K), jnp.bfloat16)

    from amq_tpu.core.quantize import QuantizedTensor

    def one_xla(pk, sc, zr, x):
        qt = QuantizedTensor(packed=pk, scale=sc, zero=zr, nbits=NBITS,
                             group_size=GROUP, shape=(N, K), superblock=SB)
        return qm.quant_matmul_reference(x, qt)

    def one_pallas(pk, sc, zr, x):
        return qm._quant_matmul_packed(
            x, pk, sc, zr, nbits=NBITS, group_size=GROUP, shape=(N, K),
            superblock=SB, block_n=bn, block_m=bm,
            acc_dtype=jnp.bfloat16, out_dtype=jnp.bfloat16)

    one = one_xla if use_xla else one_pallas

    # weights as jit ARGUMENTS (constants would 413 the compile tunnel)
    @jax.jit
    def chain(x, packed, scale, zero):
        c = jnp.float32(0)
        for step in range(n_layers):
            y = one(packed[step], scale[step], zero[step],
                    x + c.astype(x.dtype) * 0)
            c = c + y[0, 0].astype(jnp.float32)
        return c

    return functools.partial(chain, packed=packed, scale=scale,
                             zero=zero), x


def measure(site, M, bn, bm, lens=(2, 10), use_xla=False):
    outs = []
    for n in lens:
        chain, x = build(site, M, bn, bm, n, use_xla)
        np.asarray(chain(x))
        best = None
        for _ in range(3):
            t0 = time.perf_counter()
            y = None
            for _ in range(REPS):
                y = chain(x)
            np.asarray(y)
            dt = (time.perf_counter() - t0) / REPS
            best = dt if best is None else min(best, dt)
        outs.append(best)
    return (outs[1] - outs[0]) / (lens[1] - lens[0])


def main():
    site = sys.argv[1] if len(sys.argv) > 1 else "o"
    Ms = [int(m) for m in sys.argv[2:]] or [64, 256, 2048]
    N, K = SITES[site]
    for M in Ms:
        flops = 2 * M * N * K
        byts = K * NBITS // 8 * N + M * K * 2 + M * N * 2
        t_ideal = max(flops / PEAK_TF, byts / HBM)
        t_xla = measure(site, M, None, None, use_xla=True)
        line = [f"site={site} M={M}: xla={t_xla*1e6:.0f}us"]
        best = (t_xla, "xla")
        for bn in (2048, 1024, 512, 256):
            if N % bn:
                continue
            bms = [None]
            if M >= 16:
                bms = sorted({c for c in (256, 128, 64, 32, 16)
                              if M % c == 0 and c <= M} | {None},
                             key=lambda v: -1 if v is None else v)
            for bm in bms:
                try:
                    t = measure(site, M, bn, bm)
                except Exception as e:
                    line.append(f"bn{bn}/bm{bm}=ERR({type(e).__name__})")
                    continue
                tag = f"bn{bn}" + (f"/bm{bm}" if bm else "")
                line.append(f"{tag}={t*1e6:.0f}us")
                if t < best[0]:
                    best = (t, tag)
        eff = t_ideal / best[0] * 100
        line.append(f"| best={best[1]} ideal={t_ideal*1e6:.0f}us "
                    f"eff={eff:.0f}%")
        print("  ".join(line), flush=True)


if __name__ == "__main__":
    main()
