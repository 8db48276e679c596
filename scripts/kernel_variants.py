"""Microbench: grouped-matmul GEMV variants vs the fma dequant kernel.

The fma-style kernel pays ~2 VPU ops/value for dequantization after the
~1.5 ops/value pair extraction.  The grouped formulation removes the
per-value arithmetic entirely by matmul-ing the raw ``128 + c`` bf16
codes and correcting per group on the [bm, bn] partial sums:

    y = sum_g s_g * (x_g @ (c_g + 128)) - (s_g * (z_g + 128)) * sum(x_g)

Variants (decode GEMV, single m-tile):
  A  integrated kernel (quant_matmul_indexed; pair-extract + fma)
  B  grouped, one matmul per extraction round
  C  grouped, rounds concatenated to group chunks, one matmul per group

Prints marginal us/iter and effective packed GB/s; asserts numeric
parity vs the XLA reference on the first layer.
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

from amq_tpu.core.bitpack import packed_rows, pick_superblock
from amq_tpu.core import quantize as q
from amq_tpu.ops.quant_matmul import (_extract_pairs_bf16,
                                      quant_matmul_indexed,
                                      quant_matmul_reference)

GROUP = 128
N, K = 4096, 4096
L = 4


def log(m):
    print(m, file=sys.stderr, flush=True)


# --------------------------------------------------------------------------
# grouped kernel

def _grouped_kernel(idx_ref, x_ref, w_ref, s_ref, z_ref, o_ref,
                    *, nbits, group_size, T, bn, concat_to_group):
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)

    sb = T * group_size
    x = x_ref[:].astype(jnp.bfloat16)             # [bm, sb]
    s = s_ref[0, 0].astype(jnp.float32)           # [T, bn]
    z = z_ref[0, 0].astype(jnp.float32)

    w = w_ref[0]
    if nbits == 3:
        hi_rows = packed_rows(sb, 2)
        hi = _extract_pairs_bf16(w[:hi_rows], 2, range(0, 16, 2))
        lo = _extract_pairs_bf16(w[hi_rows:], 1, range(16))
        planes = [(2.0, hi), (1.0, lo)]
        zoff = 384.0
    else:
        P = 16 // nbits
        planes = [(1.0, _extract_pairs_bf16(
            w, nbits, [nbits * p for p in range(P)]))]
        zoff = 128.0

    acc = jnp.zeros_like(o_ref, dtype=jnp.float32)
    # per-group x sums for the offset/zero correction
    xs = x.astype(jnp.float32).reshape(x.shape[0], T, group_size)
    xsum = jnp.sum(xs, axis=-1)                   # [bm, T]

    for g in range(T):
        yg = jnp.zeros_like(acc)
        for weight_mult, chunks in planes:
            rows = chunks[0].shape[0]
            # chunk p covers K rows [p*rows, (p+1)*rows)
            per_g = group_size // rows            # rounds per group
            if concat_to_group and per_g > 1:
                cat = jnp.concatenate(
                    chunks[g * per_g:(g + 1) * per_g], axis=0)
                yg += weight_mult * jnp.dot(
                    x[:, g * group_size:(g + 1) * group_size], cat,
                    preferred_element_type=jnp.float32)
            else:
                for j in range(per_g):
                    p = g * per_g + j
                    yg += weight_mult * jnp.dot(
                        x[:, p * rows:(p + 1) * rows], chunks[p],
                        preferred_element_type=jnp.float32)
        corr = (z[g] + zoff) * s[g]               # [bn]
        acc += s[g][None, :] * yg - xsum[:, g][:, None] * corr[None, :]
    o_ref[:] += acc.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=(
    "nbits", "shape", "superblock", "block_n", "concat_to_group"))
def grouped_gemv(x, packed_stack, scale_stack, zero_stack, layer, *,
                 nbits, shape, superblock, block_n=512,
                 concat_to_group=False):
    Nn, Kk = shape
    Ll = packed_stack.shape[0]
    M = x.shape[0]
    bk = superblock
    bn = block_n
    T = bk // GROUP
    rows_per_tile = packed_rows(bk, nbits)
    m_pad = -M % 8
    if m_pad:
        x = jnp.pad(x, ((0, m_pad), (0, 0)))
    bm = x.shape[0]
    grid = (Nn // bn, Kk // bk)

    kernel = functools.partial(
        _grouped_kernel, nbits=nbits, group_size=GROUP, T=T, bn=bn,
        concat_to_group=concat_to_group)
    scale4 = scale_stack.reshape(Ll, Kk // bk, T, Nn)
    zero4 = zero_stack.reshape(Ll, Kk // bk, T, Nn)
    idx = jnp.asarray(layer, jnp.int32).reshape(1)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, bk), lambda n, k, idx: (0, k)),
            pl.BlockSpec((1, rows_per_tile, bn),
                         lambda n, k, idx: (idx[0], k, n)),
            pl.BlockSpec((1, 1, T, bn), lambda n, k, idx: (idx[0], k, 0, n)),
            pl.BlockSpec((1, 1, T, bn), lambda n, k, idx: (idx[0], k, 0, n)),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda n, k, idx: (0, n)),
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((bm, Nn), jnp.bfloat16),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * M * Nn * Kk,
            bytes_accessed=(Kk * nbits // 8) * Nn + M * Kk * 2 + M * Nn * 4,
            transcendentals=0,
        ),
    )(idx, x, packed_stack, scale4, zero4)
    return out[:M]


def timed(fn, x, n1, n2, reps=3):
    r = fn(x, n1); np.asarray(r)
    r = fn(x, n2); np.asarray(r)
    best = np.inf
    for _ in range(reps):
        t0 = time.time(); np.asarray(fn(x, n1)); t1 = time.time()
        np.asarray(fn(x, n2)); t2 = time.time()
        best = min(best, ((t2 - t1) - (t1 - t0)) / (n2 - n1))
    return best


def main():
    log(f"devices: {jax.devices()}")
    rng = np.random.default_rng(0)
    sb = pick_superblock(K, GROUP)
    x0 = jnp.asarray(rng.normal(size=(1, K)) * 0.1, jnp.bfloat16)

    for nbits in (4, 3, 2):
        qts = [q.quantize(jnp.asarray(
            rng.normal(size=(N, K)).astype(np.float32)), nbits=nbits)
            for _ in range(L)]
        packed = jnp.stack([t.packed for t in qts])
        scale = jnp.stack([t.scale for t in qts])
        zero = jnp.stack([t.zero for t in qts])
        jax.block_until_ready(packed)
        mb = (K * N * nbits / 8 + K // GROUP * N * 8) / 1e6

        ref = quant_matmul_reference(x0.astype(jnp.float32), qts[0])

        variants = {
            "D_blockdiag": lambda xx, i: quant_matmul_indexed(
                xx, packed, scale, zero, i, nbits=nbits, group_size=GROUP,
                shape=(N, K), superblock=sb, acc_dtype=jnp.bfloat16,
                out_dtype=jnp.bfloat16),
        }
        for name, f in variants.items():
            got = np.asarray(f(x0, jnp.int32(0)), np.float32)
            err = np.abs(got - np.asarray(ref)).max() / (
                np.abs(np.asarray(ref)).max() + 1e-9)
            @functools.partial(jax.jit, static_argnames="n")
            def run(xx, n, f=f):
                def body(c, li):
                    return f(c, li % L) * 0.001, None
                y, _ = jax.lax.scan(body, xx,
                                    jnp.arange(n, dtype=jnp.int32))
                return y
            t = timed(run, x0, 64, 512)
            log(f"{nbits}-bit {name}: {t*1e6:6.1f} us/iter "
                f"({mb/t/1e3:4.0f} GB/s)  rel_err={err:.4f}")


if __name__ == "__main__":
    main()
