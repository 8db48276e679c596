"""Bisect stage 8: does cross-grid-step VPU/MXU overlap exist, and does
the scratch round-trip cost?

o_proj chain (32 calls, 3-bit, sb=1024, bn=2048) with three GEMV bodies:
  S1 single scratch buffer (production kernel form)
  S2 codes as a VALUE operand to the dot (no explicit scratch)
  S3 double-buffered scratch (k-parity slots) — breaks the cross-step
     WAR hazard so step i+1 extraction may overlap step i's dot
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

from amq_tpu.core.bitpack import packed_rows
from amq_tpu.ops.quant_matmul import _codes_tile_bf16, _extract_pairs_bf16

L, N, K, BIT, SB, G = 32, 4096, 4096, 3, 1024, 128
ROWS = K * BIT // 32
T = SB // G
BN = 2048
RPT = packed_rows(SB, BIT)


def log(m):
    print(m, file=sys.stderr, flush=True)


def timed(fn, n1, n2, reps=12):
    np.asarray(fn(n1)); np.asarray(fn(n2))
    def best(n):
        b = np.inf
        for _ in range(reps):
            t0 = time.time(); np.asarray(fn(n)); b = min(b, time.time() - t0)
        return b
    return (best(n2) - best(n1)) / (n2 - n1)


def _xd(x_ref):
    xb = x_ref[0:1].astype(jnp.bfloat16)
    xf = xb.astype(jnp.float32)
    xsum = jnp.sum(xf.reshape(1, T, G), axis=2)
    k_ids = jax.lax.broadcasted_iota(jnp.int32, (T, 1, SB), 2) // G
    g_ids = jax.lax.broadcasted_iota(jnp.int32, (T, 1, SB), 0)
    xd = jnp.where(k_ids == g_ids, xb[None],
                   jnp.zeros((), jnp.bfloat16)).reshape(T, SB)
    return xd, xsum


def _finish(o_ref, yp, xsum, s_ref, z_ref):
    yp = yp.reshape(T, 1, BN)
    s = s_ref[0, 0].reshape(T, 1, BN).astype(jnp.float32)
    z = z_ref[0, 0].reshape(T, 1, BN).astype(jnp.float32)
    corr = (z + 128.0) * s
    y = jnp.sum(s * yp - xsum.T[:, :, None] * corr, axis=0)
    o_ref[:] += jnp.concatenate(
        [y, jnp.zeros((7, BN), y.dtype)], axis=0).astype(o_ref.dtype)


def _combined_chunks(w_blk):
    hi_rows = packed_rows(SB, 2)
    hw = w_blk[:hi_rows, :]
    pm2 = jnp.uint32(0x00030003)
    c256 = jnp.uint32(0x43804380)
    hi = [pltpu.bitcast((hw >> jnp.uint32(2 * p)) & pm2 | c256, jnp.bfloat16)
          for p in range(8)]
    lo = _extract_pairs_bf16(w_blk[hi_rows:, :], 1, range(16))
    half = hi[0].shape[0] // 2
    b256 = jnp.bfloat16(256.0)
    comb = []
    for j, h in enumerate(hi):
        comb.append((h[:half] - b256) + lo[2 * j])
        comb.append((h[half:] - b256) + lo[2 * j + 1])
    return comb


def make_kernel(mode):
    if mode == "S3":
        def kern(idx_ref, x_ref, w_ref, s_ref, z_ref, o_ref, sc0, sc1):
            k = pl.program_id(1)

            @pl.when(k == 0)
            def _():
                o_ref[:] = jnp.zeros_like(o_ref)
            xd, xsum = _xd(x_ref)

            def body(scratch):
                specs, _ = _codes_tile_bf16(w_ref[0], BIT, SB, T, G, BN,
                                            scratch)
                yp = jnp.zeros((T, BN), jnp.float32)
                for base, total, weight in specs:
                    yp += weight * jnp.dot(
                        xd, scratch[base:base + total, :],
                        preferred_element_type=jnp.float32)
                _finish(o_ref, yp, xsum, s_ref, z_ref)

            @pl.when(k % 2 == 0)
            def _():
                body(sc0)

            @pl.when(k % 2 == 1)
            def _():
                body(sc1)
        return kern, 2

    def kern(idx_ref, x_ref, w_ref, s_ref, z_ref, o_ref, scratch):
        k = pl.program_id(1)

        @pl.when(k == 0)
        def _():
            o_ref[:] = jnp.zeros_like(o_ref)
        xd, xsum = _xd(x_ref)
        if mode == "S2":
            codes = jnp.concatenate(_combined_chunks(w_ref[0]), axis=0)
            yp = jnp.dot(xd, codes, preferred_element_type=jnp.float32)
        else:
            specs, _ = _codes_tile_bf16(w_ref[0], BIT, SB, T, G, BN, scratch)
            yp = jnp.zeros((T, BN), jnp.float32)
            for base, total, weight in specs:
                yp += weight * jnp.dot(xd, scratch[base:base + total, :],
                                       preferred_element_type=jnp.float32)
        _finish(o_ref, yp, xsum, s_ref, z_ref)
    return kern, 1


def runner(mode):
    kern, n_scratch = make_kernel(mode)
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
        scratch_shapes=[pltpu.VMEM((SB, BN), jnp.bfloat16)] * n_scratch,
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
    return lambda P, S4, Z4: (lambda n: run(P, S4, Z4, n))


def main():
    log(f"devices: {jax.devices()}")
    k0 = jax.random.PRNGKey(0)
    packed = jax.random.randint(k0, (L, ROWS, N), 0, 2**31 - 1,
                                jnp.int32).astype(jnp.uint32)
    scale4 = jnp.ones((L, K // SB, T, N), jnp.float32) * 0.01
    zero4 = jnp.zeros((L, K // SB, T, N), jnp.float32)
    jax.block_until_ready(packed)
    mb = (ROWS * N * 4 + 2 * (K // G) * N * 4) / 1e6

    for mode in ("S1", "S2", "S3"):
        f = runner(mode)(packed, scale4, zero4)
        t = timed(f, 32, 224)
        log(f"{mode}: {t*1e6:7.1f} us ({mb/t/1e3:4.0f} GB/s)")


if __name__ == "__main__":
    main()
