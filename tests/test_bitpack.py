"""Property tests: pack -> unpack is the identity for all widths/shapes.

Mirrors the coverage of the reference's hqq tests/test_bitpack.py:25-60
(exact pack/unpack equality for every nbits x shape) on our TPU layout.
"""

import numpy as np
import pytest
import jax.numpy as jnp

from amq_tpu.core import bitpack


@pytest.mark.parametrize("nbits", bitpack.SUPPORTED_BITS)
@pytest.mark.parametrize("shape", [(128, 8), (256, 128), (384, 256), (1024, 16)])
def test_roundtrip(nbits, shape):
    rng = np.random.default_rng(0)
    codes = rng.integers(0, 2**nbits, size=shape, dtype=np.uint32)
    packed = bitpack.pack(jnp.asarray(codes), nbits, group_size=128)
    assert packed.dtype == jnp.uint32
    assert packed.shape == (shape[0] * nbits // 32, shape[1])
    out = np.asarray(bitpack.unpack(packed, nbits, group_size=128))
    np.testing.assert_array_equal(out, codes)


@pytest.mark.parametrize("nbits", [2, 3, 4])
@pytest.mark.parametrize("group_size", [64, 128, 256])
def test_roundtrip_group_sizes(nbits, group_size):
    rng = np.random.default_rng(1)
    codes = rng.integers(0, 2**nbits, size=(group_size * 3, 64), dtype=np.uint32)
    packed = bitpack.pack(jnp.asarray(codes), nbits, group_size=group_size)
    out = np.asarray(bitpack.unpack(packed, nbits, group_size=group_size))
    np.testing.assert_array_equal(out, codes)


def test_exact_bits_per_weight():
    # storage must be exactly nbits/weight — including 3-bit, where the
    # reference wastes 2 bits per int32 (hqq bitpack.py:69-110)
    for nbits in (1, 2, 3, 4, 8):
        rows = bitpack.packed_rows(128, nbits)
        assert rows * 32 == 128 * nbits
