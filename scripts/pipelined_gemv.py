"""Software-pipelined decode GEMV experiment: extract(k+1) vs dot(k).

The production kernel's per-grid-step body serializes plane extraction
(VPU) against the block-diagonal dot (MXU): step time ~= ext + dot while
the DMA hides underneath.  This prototype turns the k dimension into an
in-kernel fori over manually double-buffered DMA slabs, with the codes of
slab k+1 extracted into a revolving VMEM scratch while slab k's codes are
on the MXU — if Mosaic co-issues the independent VPU/MXU programs, the
step cost drops toward max(ext, dot) and the 2-bit layers stop being
extraction-bound (VERDICT r2 missing #1 / weak #1).

Chain-differenced timing like scripts/kernel_attrib.py (tunnel dispatch
~25 ms swamps single calls).

Run: python scripts/pipelined_gemv.py [site] [nbits...]
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

from amq_tpu.core.bitpack import packed_rows
from amq_tpu.ops import quant_matmul as qm

SITES = {
    "o": (4096, 4096),
    "qkv": (12288, 4096),
    "gu": (22528, 4096),
    "down": (4096, 11264),
    "tiny": (256, 2048),      # CPU interpret-mode parity (PIPE_TINY=1)
}
GROUP = 128
SB = 1024
BN = int(os.environ.get("PIPE_BN", "2048"))
INTERPRET = os.environ.get("PIPE_INTERPRET", "0") == "1"


def _correct(yp, s_blk, z_blk, xsum, T, bn, zoff):
    s = s_blk.reshape(T, 1, bn).astype(jnp.float32)
    z = z_blk.reshape(T, 1, bn).astype(jnp.float32)
    corr = (z + zoff) * s
    return jnp.sum(s * yp.reshape(T, 1, bn)
                   - xsum.T[:, :, None] * corr, axis=0)


def _pipe_kernel(x_ref, s_ref, z_ref, w_hbm, o_ref, wbuf, cbuf, sem,
                 *, nbits, Kt):
    """grid (n,); per n-tile an in-kernel fori over the Kt superblocks with
    double-buffered packed DMA and extract-ahead codes."""
    n = pl.program_id(0)
    bn = o_ref.shape[1]
    T = SB // GROUP
    rpt = packed_rows(SB, nbits)

    def dma(slot, k):
        return pltpu.make_async_copy(
            w_hbm.at[pl.ds(k * rpt, rpt), pl.ds(n * bn, bn)],
            wbuf.at[slot], sem.at[slot])

    def extract_into(slot, k_slot):
        chunks, splits, zoff = qm._codes_chunks_bf16(wbuf[k_slot], nbits, SB)
        cbuf[slot] = jnp.concatenate(chunks, axis=0)
        return zoff

    def xd_xsum(k):
        xb = x_ref[:1, pl.ds(k * SB, SB)].astype(jnp.bfloat16)
        xf = xb.astype(jnp.float32)
        xsum = jnp.sum(xf.reshape(1, T, GROUP), axis=2)
        k_ids = jax.lax.broadcasted_iota(jnp.int32, (T, 1, SB), 2) // GROUP
        g_ids = jax.lax.broadcasted_iota(jnp.int32, (T, 1, SB), 0)
        xd = jnp.where(k_ids == g_ids, xb[None],
                       jnp.zeros((), jnp.bfloat16)).reshape(T, SB)
        return xd, xsum

    dma(0, 0).start()
    dma(0, 0).wait()
    zoff = extract_into(0, 0)
    dma(1, 1).start()

    acc = jnp.zeros((1, bn), jnp.float32)
    # static unroll: Kt is 4 (K=4096) or 11 (K=11264)
    for k in range(Kt):
        nxt = (k + 1) % 2
        cur = k % 2
        if k + 2 <= Kt - 1:
            # slab k+2 reuses slot cur (same parity as k): wbuf[cur] was
            # consumed by slab k's extraction at the END of iteration k-1
            # (dma into nxt here would clobber slab k+1 in flight)
            dma(cur, k + 2).start()
        # dot slab k (MXU) -- independent of the slab-(k+1) extraction
        xd, xsum = xd_xsum(k)
        codes = cbuf[cur]
        yp = jnp.dot(xd, codes, preferred_element_type=jnp.float32)
        s_blk = s_ref[pl.ds(k * T, T), :]
        z_blk = z_ref[pl.ds(k * T, T), :]
        acc = acc + _correct(yp, s_blk, z_blk, xsum, T, bn, zoff)
        # extract slab k+1 (VPU)
        if k + 1 <= Kt - 1:
            dma(nxt, k + 1).wait()
            extract_into(nxt, nxt)
    o_ref[:] = jnp.concatenate(
        [acc, jnp.zeros((7, bn), jnp.float32)], axis=0).astype(o_ref.dtype)


def build_pipe(site, nbits, n_layers):
    N, K = SITES[site]
    Kt = K // SB
    rpt = packed_rows(SB, nbits)
    rng = jax.random.PRNGKey(0)
    packed = jax.random.bits(rng, (n_layers, K * nbits // 32, N), jnp.uint32)
    scale = jnp.full((n_layers, K // GROUP, N), 0.01, jnp.bfloat16)
    zero = jnp.full((n_layers, K // GROUP, N), 3.0, jnp.bfloat16)
    x = jnp.ones((8, K), jnp.bfloat16)

    kern = functools.partial(_pipe_kernel, nbits=nbits, Kt=Kt)

    def one(i, x):
        return pl.pallas_call(
            kern,
            grid=(N // BN,),
            in_specs=[
                pl.BlockSpec((8, K), lambda n: (0, 0)),
                pl.BlockSpec((K // GROUP, BN), lambda n: (0, n)),
                pl.BlockSpec((K // GROUP, BN), lambda n: (0, n)),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec((8, BN), lambda n: (0, n)),
            out_shape=jax.ShapeDtypeStruct((8, N), jnp.bfloat16),
            scratch_shapes=[
                pltpu.VMEM((2, rpt, BN), jnp.uint32),
                pltpu.VMEM((2, SB, BN), jnp.bfloat16),
                pltpu.SemaphoreType.DMA((2,)),
            ],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",)),
        )(x, scale[i], zero[i], packed[i])

    @jax.jit
    def chain(x):
        c = jnp.float32(0)
        for step in range(n_layers):
            y = one(step, x + c.astype(x.dtype) * 0)
            c = c + y[0, 0].astype(jnp.float32)
        return c

    return chain, x


def build_prod(site, nbits, n_layers):
    """Chain of the production indexed GEMV for the same site."""
    N, K = SITES[site]
    rng = jax.random.PRNGKey(0)
    packed = jax.random.bits(rng, (n_layers, K * nbits // 32, N), jnp.uint32)
    scale = jnp.full((n_layers, K // GROUP, N), 0.01, jnp.bfloat16)
    zero = jnp.full((n_layers, K // GROUP, N), 3.0, jnp.bfloat16)
    x = jnp.ones((1, K), jnp.bfloat16)

    @jax.jit
    def chain(x):
        c = jnp.float32(0)
        for step in range(n_layers):
            y = qm.quant_matmul_indexed(
                x + c.astype(x.dtype) * 0, packed, scale, zero,
                jnp.int32(step), nbits=nbits, group_size=GROUP,
                shape=(N, K), superblock=SB, acc_dtype=jnp.bfloat16)
            c = c + y[0, 0].astype(jnp.float32)
        return c

    return chain, x


def measure(builder, site, nbits, lens=(8, 40), reps=100):
    """Per-layer µs via chain differencing.  Reps are queued async and
    blocked ONCE: a per-rep block pays the ~25 ms axon round trip each
    call, which at 5 reps swamped the µs-scale slope (negative
    'production' slopes in the first chip run)."""
    outs = []
    for n in lens:
        chain, x = builder(site, nbits, n)
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
    return (outs[1] - outs[0]) / (lens[1] - lens[0])


def check_parity(site, nbits):
    """pipelined kernel vs the XLA dequant reference on real quantized
    weights (tiny shapes are covered by tests; this is the big shape)."""
    from amq_tpu.core import quantize as q
    N, K = SITES[site]
    rng = np.random.default_rng(0)
    W = jnp.asarray(rng.normal(size=(N, K)).astype(np.float32) * 0.02)
    qt = q.quantize(W, nbits=nbits, group_size=GROUP)
    x = jnp.asarray(rng.normal(size=(8, K)).astype(np.float32)
                    ).astype(jnp.bfloat16)
    kern = functools.partial(_pipe_kernel, nbits=nbits, Kt=K // SB)
    rpt = packed_rows(SB, nbits)
    got = pl.pallas_call(
        kern,
        grid=(N // BN,),
        in_specs=[
            pl.BlockSpec((8, K), lambda n: (0, 0)),
            pl.BlockSpec((K // GROUP, BN), lambda n: (0, n)),
            pl.BlockSpec((K // GROUP, BN), lambda n: (0, n)),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((8, BN), lambda n: (0, n)),
        out_shape=jax.ShapeDtypeStruct((8, N), jnp.bfloat16),
        scratch_shapes=[
            pltpu.VMEM((2, rpt, BN), jnp.uint32),
            pltpu.VMEM((2, SB, BN), jnp.bfloat16),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=INTERPRET,
    )(x, qt.scale.astype(jnp.bfloat16), qt.zero.astype(jnp.bfloat16),
      qt.packed)
    want = qm.quant_matmul_reference(x[:1], qt, out_dtype=jnp.float32)
    got1 = np.asarray(got[:1], np.float32)
    scale = float(jnp.abs(want).max())
    err = np.abs(got1 / scale - np.asarray(want) / scale).max()
    print(f"parity {site} {nbits}-bit: max rel err {err:.4f}")
    assert err < 2e-2, err


def main():
    site = sys.argv[1] if len(sys.argv) > 1 else "o"
    bits = [int(b) for b in sys.argv[2:]] or [2, 4]
    N, K = SITES[site]
    for nb in bits:
        if os.environ.get("PIPE_SKIP_PARITY", "0") != "1":
            check_parity(site, nb)
        byte_ideal = (K * N * nb / 8 + K // GROUP * N * 4) / 819e9
        t_pipe = measure(build_pipe, site, nb)
        t_prod = measure(build_prod, site, nb)
        print(f"site={site} nbits={nb}: pipelined={t_pipe*1e6:.1f}us "
              f"production={t_prod*1e6:.1f}us "
              f"byte_roofline={byte_ideal*1e6:.1f}us")


if __name__ == "__main__":
    main()
