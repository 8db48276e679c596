"""In-kernel attribution of the decode GEMV: DMA vs extraction vs dot.

Round-3 consolidation of the bisect5/7/8 methodology (see
docs/MEASUREMENTS.md): for each container width, run CHAINS of the
production blockdiag GEMV with the kernel body progressively stripped,
difference two chain lengths (tunnel dispatch ~25 ms swamps single
calls), and print a per-step cost table:

  full      production _gemv_blockdiag body
  dot_only  skip extraction: dot against a constant bf16 codes tile
  ext_only  extraction + a tiny dot (128 lanes) so nothing is DCE'd
  dma_only  load the packed tile, reduce it, skip extract+dot

The gap full - max(dot_only, ext_only, dma_only) is pipeline overlap
slack; whichever variant tracks `full` is the critical path.

Run: python scripts/kernel_attrib.py [o|gu|down] [nbits...]
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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from amq_tpu.ops import quant_matmul as qm

SITES = {
    "o": (4096, 4096),
    "qkv": (12288, 4096),
    "gu": (22528, 4096),
    "down": (4096, 11264),
}
GROUP = 128
SB = 1024
BN = 2048
L = 32


def _kernel(x_ref, w_ref, s_ref, z_ref, o_ref, *, nbits, variant):
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)

    T = SB // GROUP
    bn = o_ref.shape[1]
    s_blk = s_ref[0]
    z_blk = z_ref[0]
    if variant == "full":
        y = qm._gemv_blockdiag(x_ref[:], w_ref[:], s_blk, z_blk,
                               nbits, GROUP, T, bn,
                               acc_dtype=jnp.bfloat16, m_real=1)
        o_ref[:] += y.astype(o_ref.dtype)
    elif variant == "dot_only":
        # same dot shape/count as full, constant codes (no extraction)
        codes = jnp.full((SB, bn), jnp.bfloat16(129.0))
        xb = x_ref[:8].astype(jnp.bfloat16)
        k_ids = jax.lax.broadcasted_iota(jnp.int32, (T, 1, SB), 2) // GROUP
        g_ids = jax.lax.broadcasted_iota(jnp.int32, (T, 1, SB), 0)
        xd = jnp.where(k_ids == g_ids, xb[None],
                       jnp.zeros((), jnp.bfloat16)).reshape(T * 8, SB)
        yp = jnp.dot(xd, codes, preferred_element_type=jnp.float32)
        yp = yp.reshape(T, 8, bn)
        s = s_blk.reshape(T, 1, bn).astype(jnp.float32)
        o_ref[:] += jnp.sum(s * yp, axis=0).astype(o_ref.dtype)
    elif variant == "ext_only":
        chunks, splits, zoff = qm._codes_chunks_bf16(w_ref[:], nbits, SB)
        # tiny dot over the extracted codes so extraction isn't DCE'd
        acc = jnp.zeros((8, bn), jnp.float32)
        xsmall = x_ref[:8].astype(jnp.bfloat16)
        for c in chunks:
            acc += jnp.dot(xsmall[:, :c.shape[0]], c,
                           preferred_element_type=jnp.float32)
        o_ref[:] += acc.astype(o_ref.dtype)
    else:                                           # dma_only
        # touch every packed word without extract/dot: bitcast to bf16
        # (free) and reduce (uint32->f32 casts don't lower in Mosaic)
        w = pltpu.bitcast(w_ref[:], jnp.bfloat16)
        o_ref[:] += jnp.sum(w.astype(jnp.float32), axis=0,
                            keepdims=True).astype(o_ref.dtype)[:1]


def build(site, nbits, variant, n_layers):
    N, K = SITES[site]
    rows = K * nbits // 32
    rpt = SB * nbits // 32
    rng = jax.random.PRNGKey(0)
    packed = jax.random.bits(rng, (n_layers, rows, N), jnp.uint32)
    scale = jnp.full((n_layers, K // SB, SB // GROUP, N), 0.01, jnp.bfloat16)
    zero = jnp.full((n_layers, K // SB, SB // GROUP, N), 3.0, jnp.bfloat16)
    x = jnp.ones((8, K), jnp.bfloat16)

    kern = functools.partial(_kernel, nbits=nbits, variant=variant)

    def one(pk, sc, zr, x):
        grid = (N // BN, K // SB)
        return pl.pallas_call(
            kern,
            grid=grid,
            in_specs=[
                pl.BlockSpec((8, SB), lambda n, k: (0, k)),
                pl.BlockSpec((rpt, BN), lambda n, k: (k, n)),
                pl.BlockSpec((1, SB // GROUP, BN), lambda n, k: (k, 0, n)),
                pl.BlockSpec((1, SB // GROUP, BN), lambda n, k: (k, 0, n)),
            ],
            out_specs=pl.BlockSpec((8, BN), lambda n, k: (0, n)),
            out_shape=jax.ShapeDtypeStruct((8, N), jnp.bfloat16),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "arbitrary")),
        )(x, pk, sc, zr)

    # weights enter as jit ARGUMENTS (trace-time constants would embed
    # hundreds of MB of literals in the compile request — the axon
    # remote-compile tunnel 413s past ~200 MB)
    @jax.jit
    def chain(x, packed, scale, zero):
        c = jnp.float32(0)
        for step in range(n_layers):
            y = one(packed[step], scale[step], zero[step],
                    x + c.astype(x.dtype) * 0)
            c = c + y[0, 0].astype(jnp.float32)
        return c

    chain2 = functools.partial(chain, packed=packed, scale=scale, zero=zero)
    return chain2, x


def measure(site, nbits, variant, lens=(8, 40), reps=100):
    """Per-layer us via chain differencing; reps queued async, blocked
    ONCE (a per-rep block pays the ~25 ms axon round trip each call)."""
    outs = []
    for n in lens:
        chain, x = build(site, nbits, variant, n)
        np.asarray(chain(x))   # block_until_ready is unreliable on axon:
        best = None            # sync via the scalar host transfer
        for _ in range(3):
            t0 = time.perf_counter()
            y = None
            for _ in range(reps):
                y = chain(x)
            np.asarray(y)
            dt = (time.perf_counter() - t0) / reps
            best = dt if best is None else min(best, dt)
        outs.append(best)
    per_call = (outs[1] - outs[0]) / (lens[1] - lens[0])
    return per_call


def main():
    site = sys.argv[1] if len(sys.argv) > 1 else "o"
    bits = [int(b) for b in sys.argv[2:]] or [2, 4]
    N, K = SITES[site]
    steps = (N // BN) * (K // SB)
    print(f"site={site} N={N} K={K} grid_steps={steps}")
    for nb in bits:
        byte_ideal = (K * N * nb / 8 + K // GROUP * N * 4) / 819e9
        row = {v: measure(site, nb, v)
               for v in ("full", "dot_only", "ext_only", "dma_only")}
        print(f"nbits={nb}: " + "  ".join(
            f"{v}={t*1e6:.1f}us" for v, t in row.items())
            + f"  byte_roofline={byte_ideal*1e6:.1f}us"
            + f"  per_step_full={row['full']/steps*1e6:.2f}us")


if __name__ == "__main__":
    main()
