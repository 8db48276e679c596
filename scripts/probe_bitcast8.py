"""Probe Mosaic's uint32->int8 bitcast layout on the axon v5e backend.

The int8-quad extraction plan puts FOUR codes in the four bytes of each
uint32 lane ((w >> s) & 0x03030303), bitcasts to int8 ([R, C] uint32 ->
[4R, C] int8), and converts to bf16 — 2 VPU ops per 4 values instead of
3 per 2.  The packing layout needs the row mapping: which int8 row r'
holds byte b of word row r?

Each word encodes its (row, byte): word[r, c] = sum_b (r*4 + b) << (8*b),
so int8 out[r', c] == r*4 + b identifies the mapping (values < 128).
"""
import os, sys
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax_comp"))
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])


def kernel(in_ref, out_ref):
    out_ref[:] = pltpu.bitcast(in_ref[:], jnp.int8)


def main():
    R, C = 8, 128
    words = np.zeros((R, C), np.uint32)
    for r in range(R):
        for b in range(4):
            words[r] += np.uint32(r * 4 + b) << np.uint32(8 * b)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((4 * R, C), jnp.int8),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(jnp.asarray(words))
    host = np.asarray(out)
    col0 = host[:, 0]
    print("int8 row -> (word row, byte):")
    for rp in range(4 * R):
        v = int(col0[rp])
        print(f"  {rp:3d} <- word {v // 4}, byte {v % 4}")
    # uniformity check across columns
    assert (host == host[:, :1]).all(), "mapping differs across lanes!"


if __name__ == "__main__":
    main()
