"""Native C++ host runtime: pack/unpack parity with the jnp reference,
scheduler behavior."""

import numpy as np
import pytest
import jax.numpy as jnp

from amq_tpu import native
from amq_tpu.core import bitpack

pytestmark = pytest.mark.skipif(native.get_lib() is None,
                                reason="native library unavailable")


@pytest.mark.parametrize("nbits", [1, 2, 3, 4, 8])
def test_native_pack_matches_jnp(nbits):
    rng = np.random.default_rng(0)
    codes = rng.integers(0, 2**nbits, size=(384, 64), dtype=np.uint32)
    want = np.asarray(bitpack.pack(jnp.asarray(codes), nbits, 128))
    got = native.pack_native(codes, nbits, 128)
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("nbits", [2, 3, 4])
def test_native_unpack_roundtrip(nbits):
    rng = np.random.default_rng(1)
    codes = rng.integers(0, 2**nbits, size=(256, 128), dtype=np.uint32)
    packed = native.pack_native(codes, nbits, 128)
    out = native.unpack_native(packed, nbits, K=256, group_size=128)
    np.testing.assert_array_equal(out, codes)


def test_native_scheduler():
    s = native.NativeScheduler(n_slots=2)
    for uid in range(5):
        s.submit(uid, max_new_tokens=3)
    assert s.pending == 5
    filled = s.fill()
    assert [f[0] for f in filled] == [0, 1]
    total_retired = 0
    for _ in range(20):
        retired = s.step()
        total_retired += len(retired)
        s.fill()
        if not retired and s.active == 0 and s.pending == 0:
            break
    assert total_retired == 5
    assert s.active == 0 and s.pending == 0


def test_native_batcher_matches_python():
    """ContinuousBatcher with the native C++ scheduler core must make
    exactly the decisions of the pure-Python path (FCFS fill order, slot
    reuse, retirement timing incl. the prefill token and
    max_new_tokens == 1 requests)."""
    import numpy as np
    from amq_tpu.serving.engine import ContinuousBatcher, Request

    def drive(use_native):
        b = ContinuousBatcher(n_slots=2, max_len=64, use_native=use_native)
        if use_native:
            assert b._native is not None
        lens = [3, 1, 2, 4, 1, 2]
        for uid, n in enumerate(lens):
            b.submit(Request(uid=uid, prompt=np.zeros(4, np.int32),
                             max_new_tokens=n))
        log, results, t = [], {}, 0
        while b.has_work() and t < 100:
            for slot, req in b.fill_slots():
                log.append(("fill", slot, req.uid))
                fin = b.prefill_bookkeeping(slot, 100 + t)
                if fin is not None:
                    results[fin.uid] = fin.generated
            active = [s is not None for s in b.slots]
            if not any(active):
                break
            toks = np.arange(len(active)) + t * 10
            for req in b.step_bookkeeping(toks):
                results[req.uid] = req.generated
                log.append(("done", req.uid))
            t += 1
        return log, results

    log_py, res_py = drive(False)
    log_nat, res_nat = drive(True)
    assert log_py == log_nat
    assert res_py == res_nat
    assert set(res_py) == set(range(6))
    for uid, n in enumerate([3, 1, 2, 4, 1, 2]):
        assert len(res_py[uid]) == n
