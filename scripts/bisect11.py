"""Probe: per-grid-step DMA count. Variants on the 2-bit/4-bit chain:
A = normal (w + scale + zero + x DMAs per step)
B = scale/zero frozen at block 0 (wrong results; isolates meta DMA cost)
C = x frozen too (only the weight DMA moves)
"""
import os, sys, time, functools
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.cache/jax_comp"))
import numpy as np, jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
sys.path.insert(0, '/root/repo')
from amq_tpu.core.bitpack import packed_rows
from amq_tpu.ops import quant_matmul as qm

L, N, K, G, SB = 8, 22528, 4096, 128, 1024
NBITS = int(os.environ.get("NB", "4"))

def log(m): print(m, file=sys.stderr, flush=True)

def make(freeze_meta, freeze_x):
    def kern(idx_ref, x_ref, w_ref, s_ref, z_ref, o_ref, *, T, bn):
        k = pl.program_id(1)
        @pl.when(k == 0)
        def _():
            o_ref[:] = jnp.zeros_like(o_ref)
        y = qm._gemv_blockdiag(x_ref[:], w_ref[0], s_ref[0, 0], z_ref[0, 0],
                               NBITS, G, T, bn, acc_dtype=jnp.bfloat16, m_real=1)
        o_ref[:] += y.astype(o_ref.dtype)

    def run(x, packed, s4, z4, li):
        bn, T = 2048, SB // G
        rpt = packed_rows(SB, NBITS)
        grid = (N // bn, K // SB, 1)
        idx = jnp.asarray(li, jnp.int32).reshape(1)
        meta_map = ((lambda n, k, m, i: (i[0], 0, 0, 0)) if freeze_meta
                    else (lambda n, k, m, i: (i[0], k, 0, n)))
        x_map = ((lambda n, k, m, i: (m, 0)) if freeze_x
                 else (lambda n, k, m, i: (m, k)))
        gs = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=grid,
            in_specs=[
                pl.BlockSpec((8, SB), x_map),
                pl.BlockSpec((1, rpt, bn), lambda n, k, m, i: (i[0], k, n)),
                pl.BlockSpec((1, 1, T, bn), meta_map),
                pl.BlockSpec((1, 1, T, bn), meta_map),
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

rng = jax.random.PRNGKey(0)
k1, k2, k3, k4 = jax.random.split(rng, 4)
packed = jax.random.bits(k1, (L, K * NBITS // 32, N), jnp.uint32)
s4 = (jax.random.uniform(k2, (L, K // SB, SB // G, N)) * 0.02).astype(jnp.bfloat16)
z4 = (jax.random.uniform(k3, (L, K // SB, SB // G, N)) * 3).astype(jnp.bfloat16)
x = jax.random.normal(k4, (8, K), jnp.bfloat16)
jax.block_until_ready(packed)
log(f"devices: {jax.devices()} nbits={NBITS}")

for name, fm, fx in (("A normal", False, False), ("B meta frozen", True, False),
                     ("C meta+x frozen", True, True)):
    run = make(fm, fx)
    REPS = 32
    @jax.jit
    def chain(x, packed, s4, z4):
        def rep(c, _):
            def body(c, i):
                y = run(c[:, :K], packed, s4, z4, i)
                return y[:, :K], None
            out, _ = jax.lax.scan(body, c, jnp.arange(L, dtype=jnp.int32))
            return out, None
        out, _ = jax.lax.scan(rep, x, None, length=REPS)
        return out
    np.asarray(chain(x, packed, s4, z4))
    best = np.inf
    for _ in range(5):
        t0 = time.time(); np.asarray(chain(x, packed, s4, z4))
        best = min(best, time.time() - t0)
    log(f"{name}: {best/REPS/L*1e6:.1f} us/layer")
