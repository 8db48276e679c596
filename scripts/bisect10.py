"""Bisect stage 10: does the chunk CONCATENATE in _gemv_blockdiag cost
real VPU time, vs feeding the dot per-chunk (one dot per extraction
chunk, x column-sliced to match)?

2-bit layers are VPU-extraction-bound (54% of their byte roofline,
profile_decode at 32 layers); the concat materializes a [sb, bn] bf16
copy (2M values) per grid step.  Probe on an isolated 2-bit
gateup-shaped chain (N=22528, K=4096), L=8 layers scanned.
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
from amq_tpu.ops import quant_matmul as qm

L, N, K, G, SB, NBITS = 8, 22528, 4096, 128, 1024, 2


def log(m):
    print(m, file=sys.stderr, flush=True)


def make_variant(per_chunk: bool):
    def _gemv(x, w_blk, s_blk, z_blk, T, bn):
        bm, sb = x.shape
        m_eff = 1
        while (T * m_eff) % 8 and m_eff < bm:
            m_eff += 1
        xb = x[:m_eff].astype(jnp.bfloat16)
        xf = xb.astype(jnp.float32)
        xsum = jnp.sum(xf.reshape(m_eff, T, G), axis=2)
        k_ids = jax.lax.broadcasted_iota(jnp.int32, (T, 1, sb), 2) // G
        g_ids = jax.lax.broadcasted_iota(jnp.int32, (T, 1, sb), 0)
        xd = jnp.where(k_ids == g_ids, xb[None],
                       jnp.zeros((), jnp.bfloat16)).reshape(T * m_eff, sb)
        chunks, splits, zoff = qm._codes_chunks_bf16(w_blk, NBITS, sb)
        yp = jnp.zeros((T * m_eff, bn), jnp.float32)
        if per_chunk:
            rows = chunks[0].shape[0]
            for ci, c in enumerate(chunks):
                yp += jnp.dot(xd[:, ci * rows:(ci + 1) * rows], c,
                              preferred_element_type=jnp.float32)
        else:
            codes = jnp.concatenate(chunks, axis=0)
            yp += jnp.dot(xd, codes, preferred_element_type=jnp.float32)
        yp = yp.reshape(T, m_eff, bn)
        s = s_blk.reshape(T, 1, bn).astype(jnp.float32)
        z = z_blk.reshape(T, 1, bn).astype(jnp.float32)
        y = jnp.sum(s * yp - xsum.T[:, :, None] * ((z + zoff) * s), axis=0)
        return jnp.concatenate(
            [y, jnp.zeros((bm - m_eff, bn), y.dtype)], axis=0) \
            if m_eff < bm else y

    def kern(idx_ref, x_ref, w_ref, s_ref, z_ref, o_ref, *, T, bn):
        k = pl.program_id(1)

        @pl.when(k == 0)
        def _():
            o_ref[:] = jnp.zeros_like(o_ref)

        o_ref[:] += _gemv(x_ref[:], w_ref[0], s_ref[0, 0], z_ref[0, 0],
                          T, bn).astype(o_ref.dtype)

    @functools.partial(jax.jit, static_argnames=())
    def run(x, packed, scale, zero, li):
        bn = 2048
        T = SB // G
        rpt = packed_rows(SB, NBITS)
        grid = (N // bn, K // SB, 1)
        s4 = scale.reshape(L, K // SB, T, N)
        z4 = zero.reshape(L, K // SB, T, N)
        idx = jnp.asarray(li, jnp.int32).reshape(1)
        gs = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=grid,
            in_specs=[
                pl.BlockSpec((8, SB), lambda n, k, m, i: (m, k)),
                pl.BlockSpec((1, rpt, bn), lambda n, k, m, i: (i[0], k, n)),
                pl.BlockSpec((1, 1, T, bn),
                             lambda n, k, m, i: (i[0], k, 0, n)),
                pl.BlockSpec((1, 1, T, bn),
                             lambda n, k, m, i: (i[0], k, 0, n)),
            ],
            out_specs=pl.BlockSpec((8, bn), lambda n, k, m, i: (m, n)),
        )
        return pl.pallas_call(
            functools.partial(kern, T=T, bn=bn), grid_spec=gs,
            out_shape=jax.ShapeDtypeStruct((8, N), jnp.bfloat16),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "arbitrary", "arbitrary")),
        )(idx, x, packed, s4, z4)

    return run


def main():
    log(f"devices: {jax.devices()}")
    rng = jax.random.PRNGKey(0)
    k1, k2, k3, k4 = jax.random.split(rng, 4)
    packed = jax.random.bits(k1, (L, K * NBITS // 32, N), jnp.uint32)
    scale = (jax.random.uniform(k2, (L, K // G, N)) * 0.02
             ).astype(jnp.bfloat16)
    zero = (jax.random.uniform(k3, (L, K // G, N)) * 3).astype(jnp.bfloat16)
    x = jax.random.normal(k4, (8, K), jnp.bfloat16)
    jax.block_until_ready(packed)

    for name, per_chunk in (("concat", False), ("per-chunk", True)):
        run = make_variant(per_chunk)

        REPS = 32   # amortize the ~25 ms tunnel dispatch

        @jax.jit
        def chain(x, packed, scale, zero):
            def rep(c, _):
                def body(c, i):
                    y = run(c[:, :K], packed, scale, zero, i)
                    return y[:, :K], None
                out, _ = jax.lax.scan(body, c,
                                      jnp.arange(L, dtype=jnp.int32))
                return out, None
            out, _ = jax.lax.scan(rep, x, None, length=REPS)
            return out

        out = chain(x, packed, scale, zero)
        np.asarray(out)
        best = np.inf
        for _ in range(5):
            t0 = time.time()
            np.asarray(chain(x, packed, scale, zero))
            best = min(best, time.time() - t0)
        best /= REPS
        per_layer = best / L * 1e6
        byts = (K * NBITS / 8) * N + (K // G) * N * 2 * 2
        log(f"{name}: {per_layer:.1f} us/layer "
            f"({byts / (best / L) / 1e9:.0f} GB/s)")


if __name__ == "__main__":
    main()
