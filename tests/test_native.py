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


def _drive_sched(use_native, submits, n_slots=2, prefill_budget=0,
                 preempt_at=None):
    """Drive a batcher over scripted submissions; returns the event log.

    ``submits``: {step: [(uid, max_new, priority, prompt_len)]}.
    ``preempt_at``: steps at which preempt() is invoked (None = every step).
    """
    from amq_tpu.serving.engine import ContinuousBatcher, Request

    b = ContinuousBatcher(n_slots=n_slots, max_len=64, use_native=use_native,
                          prefill_budget=prefill_budget)
    log = []
    for t in range(40):
        for uid, max_new, pri, plen in submits.get(t, []):
            b.submit(Request(uid=uid, prompt=np.zeros(plen, np.int32),
                             max_new_tokens=max_new, priority=pri))
        if preempt_at is None or t in preempt_at:
            for slot, req in b.preempt():
                log.append(("evict", t, slot, req.uid, len(req.generated)))
        for slot, req in b.fill_slots():
            log.append(("fill", t, slot, req.uid))
            fin = b.prefill_bookkeeping(slot, 100)
            if fin is not None:
                log.append(("done", t, fin.uid))
        active = [s is not None for s in b.slots]
        if any(active):
            toks = np.arange(len(active))
            for req in b.step_bookkeeping(toks):
                log.append(("done", t, req.uid))
        if not b.has_work():
            break
    assert not b.has_work(), log
    return log


@pytest.mark.parametrize("use_native", [False, True])
def test_scheduler_priority_order(use_native):
    # uid 0 (pri 0) fills first; uids 1-3 queued: pri 5 (uid 2) must be
    # admitted before pri 0 (uid 1) despite later submission
    log = _drive_sched(use_native, {
        0: [(0, 6, 0, 4), (1, 2, 0, 4)],
        1: [(2, 2, 5, 4), (3, 2, 5, 4)],
    }, n_slots=1, preempt_at=())
    fills = [e[3] for e in log if e[0] == "fill"]
    assert fills == [0, 2, 3, 1]


@pytest.mark.parametrize("use_native", [False, True])
def test_scheduler_prefill_budget(use_native):
    # 3 slots free, 3 requests of prompt 32 each, budget 64 -> the third
    # admission must wait for the next fill call
    from amq_tpu.serving.engine import ContinuousBatcher, Request

    b = ContinuousBatcher(n_slots=3, max_len=64, use_native=use_native,
                          prefill_budget=64)
    for uid in range(3):
        b.submit(Request(uid=uid, prompt=np.zeros(32, np.int32),
                         max_new_tokens=4))
    first = [uid for _, req in b.fill_slots() for uid in [req.uid]]
    assert first == [0, 1]
    second = [req.uid for _, req in b.fill_slots()]
    assert second == [2]

    # a single over-budget prompt is still admitted (no starvation)
    b2 = ContinuousBatcher(n_slots=3, max_len=256, use_native=use_native,
                           prefill_budget=64)
    b2.submit(Request(uid=9, prompt=np.zeros(128, np.int32),
                      max_new_tokens=4))
    assert [req.uid for _, req in b2.fill_slots()] == [9]


@pytest.mark.parametrize("use_native", [False, True])
def test_scheduler_preemption(use_native):
    # slots full of pri-0 work; a pri-9 arrival evicts the most recently
    # admitted victim, runs to completion, then the victim resumes with
    # its generated count preserved
    log = _drive_sched(use_native, {
        0: [(0, 10, 0, 4), (1, 10, 0, 4)],
        2: [(2, 2, 9, 4)],
    }, n_slots=2)
    evicts = [e for e in log if e[0] == "evict"]
    assert len(evicts) == 1
    _, t, slot, uid, gen_at_evict = evicts[0]
    assert uid == 1 and gen_at_evict > 0           # latest admission evicted
    fills = [(e[1], e[3]) for e in log if e[0] == "fill"]
    # the preemptor fills the freed slot at the eviction step; the victim
    # is re-admitted later and completes
    assert (t, 2) in fills
    assert any(tt > t and u == 1 for tt, u in fills)
    done = [e[2] for e in log if e[0] == "done"]
    assert set(done) == {0, 1, 2}


@pytest.mark.parametrize("use_native", [False, True])
def test_scheduler_v2_parity(use_native):
    """Native and Python paths must produce identical event logs under a
    mixed priority/budget/preemption workload."""
    submits = {
        0: [(0, 5, 0, 8), (1, 3, 1, 16), (2, 4, 0, 8)],
        1: [(3, 2, 7, 8)],
        3: [(4, 1, 3, 32), (5, 6, 0, 8)],
    }
    kw = dict(n_slots=2, prefill_budget=24)
    log_py = _drive_sched(False, submits, **kw)
    log_nat = _drive_sched(True, submits, **kw)
    assert log_py == log_nat
