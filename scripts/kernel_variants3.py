"""Prototype: int8-quad byte-planar extraction for the decode GEMV.

Current pair-planar extraction costs 3 VPU ops per 2 values (shift, and,
or-const; bf16-mantissa trick).  The quad scheme puts 4 codes in the 4
bytes of each uint32 lane: one shift+and yields 4 int8 codes, a single
hardware convert lifts the whole tile to bf16 exactly (no +128 offset),
and 3-bit recombines hi/lo planes with cheap int8 adds.

Variants (o_proj chain: L=32 calls, N=K=4096, sb=1024, bn=2048, scan):
  P2/P3/P4  current pair-planar production kernel at nbits=2/3/4
  Q2        quad 2-bit:  4 x (shift+and) -> int8, concat, 1 convert
  Q4        quad 4-bit:  2 x (shift+and) -> int8, concat, 1 convert
  Q3        quad native 3-bit: hi quads + lo quads, int8 combine
  Q3N       3-bit codes in 4-bit containers (Q4 path, 4 bits streamed)

Each variant checks numeric parity vs an fp32 dequant reference first.
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

L, N, K, SB, G = 32, 4096, 4096, 1024, 128
BN = 2048
T = SB // G

#: int8 row r' <- word row r, byte b:  r' = 4*r + b (probe_bitcast8)
BYTE_MAJOR = False


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


# ---------------------------------------------------------------- packing

def pack_quad(codes: np.ndarray, field_bits: int) -> np.ndarray:
    """codes [L, K, N] (values < 2**field_bits) -> [L, R, N] uint32 per
    superblock, byte-planar quad layout:

        k_local = chunk * 4*R_sb + 4*r + b    (word row r, byte b)
        word[r] |= code << (8*b + field_bits*chunk)

    where R_sb = SB*field_bits//32 rows per superblock and chunk indexes
    the sub-byte position (8//field_bits chunks).
    """
    Lc, Kc, Nc = codes.shape
    per_byte = 8 // field_bits
    R_sb = SB * field_bits // 32
    n_sb = Kc // SB
    # k_local = chunk*4R + 4r + b  ->  [n_sb, chunk, r, b] view, then
    # word[r] = sum_{chunk, b} code << (8b + fb*chunk)   (vectorized)
    c = codes.astype(np.uint32).reshape(Lc, n_sb, per_byte, R_sb, 4, Nc)
    shifts = (8 * np.arange(4)[None, :]
              + field_bits * np.arange(per_byte)[:, None])  # [chunk, b]
    words = (c << shifts[None, None, :, None, :, None]).sum(
        axis=(2, 4), dtype=np.uint32)                       # [L, n_sb, R, N]
    return words.reshape(Lc, n_sb * R_sb, Nc)


# ---------------------------------------------------------------- kernels

def _xd_xsum(x_ref):
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
    y = jnp.sum(s * yp - xsum.T[:, :, None] * (z * s), axis=0)
    o_ref[:] += jnp.concatenate(
        [y, jnp.zeros((7, BN), y.dtype)], axis=0).astype(o_ref.dtype)


def quad_codes_bf16(w, nbits):
    """Extract one superblock's int8 quad chunks -> bf16 [SB, BN] codes."""
    if nbits == 3:
        hi_rows = SB * 2 // 32
        hw, lw = w[:hi_rows], w[hi_rows:]
        hq = [pltpu.bitcast((hw >> jnp.uint32(2 * c)) & jnp.uint32(0x03030303),
                            jnp.int8) for c in range(4)]          # [4*64, BN]
        lq = [pltpu.bitcast((lw >> jnp.uint32(c)) & jnp.uint32(0x01010101),
                            jnp.int8) for c in range(8)]          # [4*32, BN]
        pieces = []
        for j, h in enumerate(hq):
            pieces.append((h[:128] + h[:128]) + lq[2 * j])
            pieces.append((h[128:] + h[128:]) + lq[2 * j + 1])
        return jnp.concatenate(pieces, axis=0).astype(jnp.bfloat16)
    mask = {2: 0x03030303, 4: 0x0F0F0F0F}[nbits]
    per_byte = 8 // nbits
    chunks = [pltpu.bitcast((w >> jnp.uint32(nbits * c)) & jnp.uint32(mask),
                            jnp.int8) for c in range(per_byte)]
    return jnp.concatenate(chunks, axis=0).astype(jnp.bfloat16)


def make_quad_runner(nbits, rows_total):
    RPT = SB * nbits // 32 if nbits != 3 else SB * 3 // 32

    def kern(idx_ref, x_ref, w_ref, s_ref, z_ref, o_ref):
        k = pl.program_id(1)

        @pl.when(k == 0)
        def _():
            o_ref[:] = jnp.zeros_like(o_ref)
        xd, xsum = _xd_xsum(x_ref)
        codes = quad_codes_bf16(w_ref[0], nbits)
        yp = jnp.dot(xd, codes, preferred_element_type=jnp.float32)
        _finish(o_ref, yp, xsum, s_ref, z_ref)

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
    )

    def call(x, P, S4, Z4, li):
        return pl.pallas_call(
            kern, grid_spec=gs,
            out_shape=jax.ShapeDtypeStruct((8, N), jnp.bfloat16),
        )(jnp.asarray(li, jnp.int32).reshape(1), x, P, S4, Z4)
    return call


def chain(callfn, P, S4, Z4):
    x0 = jnp.ones((8, K), jnp.bfloat16) * 0.01

    @functools.partial(jax.jit, static_argnames="n")
    def run(P, S4, Z4, n):
        def step(x, i):
            y = callfn(x, P, S4, Z4, i % L)
            return y * 0.001, None
        x, _ = jax.lax.scan(step, x0, jnp.arange(n, dtype=jnp.int32))
        return x
    return lambda n: run(P, S4, Z4, n)


def main():
    log(f"devices: {jax.devices()}")
    rng = np.random.default_rng(0)

    for nbits, tag in ((2, "Q2"), (4, "Q4"), (3, "Q3"), (3, "Q3N")):
        container = 4 if tag == "Q3N" else nbits
        codes = rng.integers(0, 2 ** nbits, (L, K, N)).astype(np.uint8)
        scale = (rng.random((L, K // G, N)) * 0.01 + 0.005).astype(np.float32)
        zero = (rng.random((L, K // G, N)) * (2 ** nbits - 1)
                ).astype(np.float32)
        packed = jnp.asarray(pack_quad(codes, container))
        S4 = jnp.asarray(scale.reshape(L, K // SB, T, N))
        Z4 = jnp.asarray(zero.reshape(L, K // SB, T, N))
        jax.block_until_ready(packed)

        callfn = make_quad_runner(container, packed.shape[1] // (K // SB))
        # parity on layer 0
        x = (rng.random((8, K)) * 0.1).astype(np.float32)
        x[1:] = 0
        xb = jnp.asarray(x, jnp.bfloat16)
        y = np.asarray(callfn(xb, packed, S4, Z4, 0), np.float32)[0]
        W = (codes[0].astype(np.float32)
             - np.repeat(zero[0], G, axis=0)) * np.repeat(scale[0], G, axis=0)
        ref = np.asarray(xb[0], np.float32) @ W
        err = np.abs(y - ref).max() / (np.abs(ref).max() + 1e-9)
        ok = "ok " if err < 3e-2 else "FAIL"
        log(f"{tag} parity: {ok} rel-err {err:.2e}")

        mb = (packed.shape[1] // (K // SB)) * (K // SB) * N * 4 / 1e6
        t = timed(chain(callfn, packed, S4, Z4), 32, 224)
        log(f"{tag}: {t*1e6:7.1f} us/call ({mb/t/1e3:4.0f} GB/s packed)")

    # current production kernels for comparison
    from amq_tpu.core.bitpack import pack as prod_pack
    for nbits in (2, 3, 4):
        codes = rng.integers(0, 2 ** nbits, (L, K, N)).astype(np.uint8)
        scale = (rng.random((L, K // G, N)) * 0.01 + 0.005).astype(np.float32)
        zero = (rng.random((L, K // G, N)) * (2 ** nbits - 1)
                ).astype(np.float32)
        packed = jnp.stack([
            jnp.asarray(prod_pack(jnp.asarray(codes[i]), nbits,
                                  superblock=SB)) for i in range(L)])
        Sb = jnp.asarray(scale, jnp.bfloat16)
        Zb = jnp.asarray(zero, jnp.bfloat16)
        jax.block_until_ready(packed)
        mb = packed.shape[1] * N * 4 / 1e6

        def callp(x, P, S, Z, li, nbits=nbits):
            return quant_matmul_indexed(
                x, P, S, Z, li, nbits=nbits, group_size=G, shape=(N, K),
                superblock=SB, block_n=BN, acc_dtype=jnp.bfloat16,
                out_dtype=jnp.bfloat16)
        t = timed(chain(callp, packed, Sb, Zb), 32, 224)
        log(f"P{nbits}: {t*1e6:7.1f} us/call ({mb/t/1e3:4.0f} GB/s packed)")


if __name__ == "__main__":
    main()
