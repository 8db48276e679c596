"""Bisect stage 4: why does the pallas kernel stream cycling weight
buffers at ~198 GB/s when XLA's dense matmul cycles at ~1000 GB/s?

Probes (all o_proj-shaped: N=K=4096, 3-bit, superblock 1024, L=32):

  P1 idx kernel, cycling li, bn=1024      (round-1 baseline shape)
  P2 idx kernel, cycling li, bn=4096      (fully contiguous blocks)
  P3 copy-only kernel, cycling, bn=1024   (pure pallas DMA rate, strided)
  P4 copy-only kernel, cycling, bn=4096   (pure pallas DMA rate, contig)
  P5 copy-only ONE call, grid=(L,k,n)     (megakernel streaming probe)
  P6 idx kernel, li=0, bn=4096            (in-kernel ceiling, contig)
"""
import os, sys, time, functools

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax_comp"))
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from amq_tpu.ops.quant_matmul import quant_matmul_indexed

L = 32
N = K = 4096
BIT = 3
SB = 1024
G = 128
ROWS = K * BIT // 32          # 384


def log(m):
    print(m, file=sys.stderr, flush=True)


def timed(fn, n1, n2, reps=8):
    np.asarray(fn(n1)); np.asarray(fn(n2))
    def best(n):
        b = np.inf
        for _ in range(reps):
            t0 = time.time(); np.asarray(fn(n)); b = min(b, time.time() - t0)
        return b
    return (best(n2) - best(n1)) / (n2 - n1)


def main():
    log(f"devices: {jax.devices()}")
    k0 = jax.random.PRNGKey(0)
    packed = jax.random.randint(k0, (L, ROWS, N), 0, 2**31 - 1,
                                jnp.int32).astype(jnp.uint32)
    scale = jnp.ones((L, K // G, N), jnp.float32) * 0.01
    zero = jnp.zeros((L, K // G, N), jnp.float32)
    jax.block_until_ready(packed)
    x0 = jnp.ones((1, K), jnp.bfloat16) * 0.01
    mb = (ROWS * N * 4 + 2 * (K // G) * N * 4) / 1e6   # packed + meta

    def qmm(bn):
        @functools.partial(jax.jit, static_argnames="n")
        def run(P, S, Z, n):
            def step(x, i):
                y = quant_matmul_indexed(
                    x, P, S, Z, i % L, nbits=BIT, group_size=G,
                    shape=(N, K), superblock=SB, block_n=bn,
                    acc_dtype=jnp.bfloat16, out_dtype=jnp.bfloat16)
                return y * 0.001, None
            x, _ = jax.lax.scan(step, x0, jnp.arange(n, dtype=jnp.int32))
            return x
        return lambda n: run(packed, scale, zero, n)

    def qmm_fixed(bn):
        @functools.partial(jax.jit, static_argnames="n")
        def run(P, S, Z, n):
            def step(x, _):
                y = quant_matmul_indexed(
                    x, P, S, Z, jnp.int32(0), nbits=BIT, group_size=G,
                    shape=(N, K), superblock=SB, block_n=bn,
                    acc_dtype=jnp.bfloat16, out_dtype=jnp.bfloat16)
                return y * 0.001, None
            x, _ = jax.lax.scan(step, x0, None, length=n)
            return x
        return lambda n: run(packed, scale, zero, n)

    # --- copy-only kernel: read packed blocks, reduce into [8,128] ---
    def copy_kernel(idx_ref, w_ref, o_ref):
        del idx_ref
        kstep = pl.program_id(0)
        n = pl.program_id(1)

        @pl.when((kstep == 0) & (n == 0))
        def _():
            o_ref[:] = jnp.zeros_like(o_ref)
        s = jnp.sum(pltpu.bitcast(w_ref[0], jnp.int32).astype(jnp.float32))
        o_ref[:] = o_ref[:] + s

    def copy_cycling(bn):
        rows_blk = SB * BIT // 32
        grid = (K // SB, N // bn)

        @functools.partial(jax.jit, static_argnames="n")
        def run(P, n):
            def one(li):
                gs = pltpu.PrefetchScalarGridSpec(
                    num_scalar_prefetch=1, grid=grid,
                    in_specs=[pl.BlockSpec(
                        (1, rows_blk, bn),
                        lambda k, nn, idx: (idx[0], k, nn))],
                    out_specs=pl.BlockSpec((8, 128),
                                           lambda k, nn, idx: (0, 0)),
                )
                return pl.pallas_call(
                    copy_kernel, grid_spec=gs,
                    out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
                )(jnp.asarray(li, jnp.int32).reshape(1), P)

            def step(acc, i):
                return acc + one(i % L)[0, 0] * 1e-30, None
            acc, _ = jax.lax.scan(step, jnp.float32(0),
                                  jnp.arange(n, dtype=jnp.int32))
            return acc
        return lambda n: run(packed, n)

    # --- P5: one call, grid walks all layers ---
    def copy_mega(bn):
        rows_blk = SB * BIT // 32
        grid = (L, K // SB, N // bn)

        def kern(w_ref, o_ref):
            li = pl.program_id(0)
            kstep = pl.program_id(1)
            n = pl.program_id(2)

            @pl.when((li == 0) & (kstep == 0) & (n == 0))
            def _():
                o_ref[:] = jnp.zeros_like(o_ref)
            o_ref[:] = o_ref[:] + jnp.sum(pltpu.bitcast(w_ref[0], jnp.int32).astype(jnp.float32))

        @functools.partial(jax.jit, static_argnames="n")
        def run(P, n):
            def step(acc, _):
                y = pl.pallas_call(
                    kern, grid=grid,
                    in_specs=[pl.BlockSpec(
                        (1, rows_blk, bn),
                        lambda l, k, nn: (l, k, nn),
                        memory_space=pltpu.VMEM)],
                    out_specs=pl.BlockSpec((8, 128),
                                           lambda l, k, nn: (0, 0),
                                           memory_space=pltpu.VMEM),
                    out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
                )(P)
                return acc + y[0, 0] * 1e-30, None
            acc, _ = jax.lax.scan(step, jnp.float32(0), None, length=n)
            return acc
        return lambda n: run(packed, n)

    pk_mb = ROWS * N * 4 / 1e6

    t = timed(qmm(1024), 32, 224)
    log(f"P1 idx cyc bn=1024 : {t*1e6:7.1f} us ({mb/t/1e3:4.0f} GB/s)")
    t = timed(qmm(2048), 32, 224)
    log(f"P2 idx cyc bn=2048 : {t*1e6:7.1f} us ({mb/t/1e3:4.0f} GB/s)")
    t = timed(copy_cycling(1024), 32, 224)
    log(f"P3 cpy cyc bn=1024 : {t*1e6:7.1f} us ({pk_mb/t/1e3:4.0f} GB/s)")
    t = timed(copy_cycling(4096), 32, 224)
    log(f"P4 cpy cyc bn=4096 : {t*1e6:7.1f} us ({pk_mb/t/1e3:4.0f} GB/s)")
    t = timed(copy_mega(4096), 2, 10)
    log(f"P5 cpy mega bn=4096: {t*1e6/L:7.1f} us/lyr ({pk_mb/(t/L)/1e3:4.0f} GB/s)")
    t = timed(copy_mega(1024), 2, 10)
    log(f"P5b cpy mega bn=1k : {t*1e6/L:7.1f} us/lyr ({pk_mb/(t/L)/1e3:4.0f} GB/s)")
    t = timed(qmm_fixed(2048), 32, 224)
    log(f"P6 idx li0 bn=2048 : {t*1e6:7.1f} us ({mb/t/1e3:4.0f} GB/s)")


if __name__ == "__main__":
    main()
