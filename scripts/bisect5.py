"""Bisect stage 5: in-kernel ablation of the blockdiag GEMV body.

o_proj shape, 3-bit, sb=1024, bn=1024, L=32, cycling li.

  AB0 full kernel                     (baseline)
  AB1 dots only (skip extract+store)  -> dot + correction cost
  AB2 extract+store only (tiny dot)   -> extraction cost
  AB3 hi plane only (1 dot, half extract)
  CPY copy-only                       (DMA floor)
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
sys.path.insert(0, "/root/repo")

from amq_tpu.core.bitpack import packed_rows
from amq_tpu.ops.quant_matmul import _extract_pairs_bf16, _dequant_tile

L, N, K, BIT, SB, G = 32, 4096, 4096, 3, 1024, 128
ROWS = K * BIT // 32
T = SB // G
BN = 1024
RPT = packed_rows(SB, BIT)          # packed rows per K tile


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


def make_kernel(mode, BN):
    def kern(idx_ref, x_ref, w_ref, s_ref, z_ref, o_ref, scratch):
        del idx_ref
        k = pl.program_id(1)

        @pl.when(k == 0)
        def _():
            o_ref[:] = jnp.zeros_like(o_ref)

        sb = SB
        bn = BN
        w_blk = w_ref[0]
        xb = x_ref[0:1].astype(jnp.bfloat16)
        xf = xb.astype(jnp.float32)
        xsum = jnp.sum(xf.reshape(1, T, G), axis=2)
        k_ids = jax.lax.broadcasted_iota(jnp.int32, (T, 1, sb), 2) // G
        g_ids = jax.lax.broadcasted_iota(jnp.int32, (T, 1, sb), 0)
        xd = jnp.where(k_ids == g_ids, xb[None],
                       jnp.zeros((), jnp.bfloat16)).reshape(T, sb)

        if mode == "fma":
            w = _dequant_tile(w_blk, s_ref[0, 0], z_ref[0, 0], BIT,
                              G, T, bn, jnp.bfloat16).reshape(T * G, bn)
            o_ref[:] += jnp.dot(x_ref[:].astype(jnp.bfloat16), w,
                                preferred_element_type=jnp.float32
                                ).astype(o_ref.dtype)
            return

        if mode in ("full", "extract", "hi_only"):
            hi_rows = packed_rows(sb, 2)
            hi = _extract_pairs_bf16(w_blk[:hi_rows, :], 2, range(0, 16, 2))
            off = 0
            for ch in hi:
                scratch[off:off + ch.shape[0], :] = ch
                off += ch.shape[0]
            if mode != "hi_only":
                lo = _extract_pairs_bf16(w_blk[hi_rows:, :], 1, range(16))
                for ch in lo:
                    scratch[off:off + ch.shape[0], :] = ch
                    off += ch.shape[0]

        if mode == "extract":
            yp = jnp.dot(xd[:, :8].astype(jnp.bfloat16),
                         scratch[:8, :],
                         preferred_element_type=jnp.float32) * 3.0
        elif mode == "hi_only":
            yp = 2.0 * jnp.dot(xd, scratch[:sb, :],
                               preferred_element_type=jnp.float32)
        else:
            yp = 2.0 * jnp.dot(xd, scratch[:sb, :],
                               preferred_element_type=jnp.float32)
            yp += jnp.dot(xd, scratch[sb:2 * sb, :],
                          preferred_element_type=jnp.float32)
        yp = yp.reshape(T, 1, bn) if yp.shape[0] == T else yp[None]
        s = s_ref[0, 0].reshape(T, 1, bn).astype(jnp.float32)
        z = z_ref[0, 0].reshape(T, 1, bn).astype(jnp.float32)
        corr = (z + 3 * 128.0) * s
        if yp.shape[0] == T:
            y = jnp.sum(s * yp - xsum.T[:, :, None] * corr, axis=0)
        else:
            y = jnp.sum(s[:1] * yp - xsum.T[:1, :, None] * corr[:1], axis=0)
        o_ref[:] += jnp.concatenate(
            [y, jnp.zeros((7, bn), y.dtype)], axis=0).astype(o_ref.dtype)
    return kern


def runner(mode, BN):
    kern = make_kernel(mode, BN)
    grid = (N // BN, K // SB, 1)
    gs = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            pl.BlockSpec((8, SB), lambda n, k, m, idx: (m, k)),
            pl.BlockSpec((1, RPT, BN), lambda n, k, m, idx: (idx[0], k, n)),
            pl.BlockSpec((1, 1, T, BN), lambda n, k, m, idx: (idx[0], k, 0, n)),
            pl.BlockSpec((1, 1, T, BN), lambda n, k, m, idx: (idx[0], k, 0, n)),
        ],
        out_specs=pl.BlockSpec((8, BN), lambda n, k, m, idx: (m, n)),
        scratch_shapes=[pltpu.VMEM((2 * SB, BN), jnp.bfloat16)],
    )

    def call(x, P, S4, Z4, li):
        return pl.pallas_call(
            kern, grid_spec=gs,
            out_shape=jax.ShapeDtypeStruct((8, N), jnp.bfloat16),
        )(jnp.asarray(li, jnp.int32).reshape(1), x, P, S4, Z4)

    @functools.partial(jax.jit, static_argnames="n")
    def run(P, S4, Z4, n):
        x0 = jnp.ones((8, K), jnp.bfloat16) * 0.01
        def step(x, i):
            y = call(x, P, S4, Z4, i % L)
            return y * 0.001, None
        x, _ = jax.lax.scan(step, x0, jnp.arange(n, dtype=jnp.int32))
        return x
    return run


def main():
    log(f"devices: {jax.devices()}")
    k0 = jax.random.PRNGKey(0)
    packed = jax.random.randint(k0, (L, ROWS, N), 0, 2**31 - 1,
                                jnp.int32).astype(jnp.uint32)
    scale4 = jnp.ones((L, K // SB, T, N), jnp.float32) * 0.01
    zero4 = jnp.zeros((L, K // SB, T, N), jnp.float32)
    jax.block_until_ready(packed)
    mb = (ROWS * N * 4 + 2 * (K // G) * N * 4) / 1e6

    for mode in ("fma", "full"):
        for bn in (1024, 2048):
            run = runner(mode, bn)
            t = timed(lambda n: run(packed, scale4, zero4, n), 32, 224)
            log(f"AB {mode:8s} bn={bn}: {t*1e6:7.1f} us ({mb/t/1e3:4.0f} GB/s)")


if __name__ == "__main__":
    main()
