"""Search stack: NSGA-II machinery properties + end-to-end tiny search."""

import json

import numpy as np
import pytest

from amq_tpu.search import nsga2
from amq_tpu.search.space import SearchSpace
from amq_tpu.models import get_config
from amq_tpu.models.config import LINEAR_NAMES


# ---------------------------------------------------------------------------
# nsga2 toolkit

def test_non_dominated_front():
    F = np.array([[1, 5], [2, 4], [3, 3], [2, 6], [4, 4]])
    front = nsga2.non_dominated_front(F)
    assert set(front) == {0, 1, 2}


def test_non_dominated_sort_ranks():
    F = np.array([[1, 1], [2, 2], [3, 3]])
    assert nsga2.non_dominated_sort(F).tolist() == [0, 1, 2]


def test_hypervolume_2d():
    F = np.array([[1.0, 2.0], [2.0, 1.0]])
    ref = np.array([3.0, 3.0])
    # two rectangles: (3-1)(3-2) + (3-2)(2-1) = 2 + 1 = 3
    assert nsga2.hypervolume_2d(F, ref) == pytest.approx(3.0)
    # dominated point contributes nothing
    F2 = np.vstack([F, [2.5, 2.5]])
    assert nsga2.hypervolume_2d(F2, ref) == pytest.approx(3.0)


def test_nsga2_on_toy_biobjective():
    # min (x0, 5 - x0) over ints 0..5: whole diagonal is the Pareto set
    rng = np.random.default_rng(0)

    def evaluate(X):
        F = np.column_stack([X[:, 0].astype(float),
                             5.0 - X[:, 0].astype(float)])
        return F, None

    X, F = nsga2.nsga2(evaluate, initial_X=np.zeros((1, 1), int),
                       xl=np.array([0]), xu=np.array([5]),
                       pop_size=8, n_gen=10, rng=rng)
    assert set(X[:, 0].tolist()) == {0, 1, 2, 3, 4, 5}


def test_nsga2_respects_constraints():
    rng = np.random.default_rng(1)

    def evaluate(X):
        x = X[:, 0].astype(float)
        F = np.column_stack([x, 10.0 - x])
        G = np.column_stack([2.0 - x])  # x >= 2
        return F, G

    X, _ = nsga2.nsga2(evaluate, initial_X=np.full((1, 1), 5, int),
                       xl=np.array([0]), xu=np.array([10]),
                       pop_size=8, n_gen=15, rng=rng)
    assert (X[:, 0] >= 2).all()


def test_subset_ga_cardinality():
    rng = np.random.default_rng(2)
    vals = np.arange(20, dtype=float)

    def fitness(mask):
        if mask.sum() != 5:
            return 1e9
        return float(np.std(np.diff(np.sort(vals[mask]))))

    best = nsga2.subset_ga(fitness, n_var=20, n_max=5, pop_size=16,
                           n_gen=30, rng=rng)
    assert best.sum() == 5


# ---------------------------------------------------------------------------
# search space

@pytest.fixture(scope="module")
def space():
    cfg = get_config("tiny-llama")
    return SearchSpace(cfg.topology(), pass_linear_list=["0.self_attn.q_proj"],
                       rng=np.random.default_rng(0))


def test_encode_decode_roundtrip(space):
    archs = space.sample(3)
    for arch in archs:
        x = space.encode(arch)
        assert x.size == space.n_linear * space.n_block
        assert space.decode(x) == arch


def test_sample_respects_pass_layers_and_window(space):
    for arch in space.sample(5):
        assert arch["linear"]["self_attn.q_proj"][0] == 4
        from amq_tpu.evaluation.metrics import get_bits_usage
        usage = get_bits_usage(arch, space.config, space.group_size)
        assert 2 + 0.25 <= usage + 1e-9
        assert usage <= 4 + 0.25 + 1e-9


def test_initialize_seeds_uniform_archs(space):
    data = space.initialize(6)
    assert len(data) == 6
    # first three archs are all-2, all-3, all-4 (modulo pinned layers)
    for arch, bit in zip(data[:3], (2, 3, 4)):
        vals = [b for l in LINEAR_NAMES for i, b in enumerate(arch["linear"][l])
                if f"{i}.{l}" not in space.pass_linear_list]
        assert set(vals) == {bit}


def test_encode_predictor_removes_pass(space):
    arch = space.sample(1)[0]
    full = space.encode(arch)
    red = space.encode_predictor(arch)
    assert red.size == full.size - 1
    # decode_encode_predictor on batch
    X = np.stack([full, full])
    assert space.decode_encode_predictor(X).shape == (2, full.size - 1)


# ---------------------------------------------------------------------------
# end-to-end tiny search (fake evaluator: analytic metric)

class FakeEvaluator:
    """Metric = mean inverse bits + noise-free layer weighting (lower bits
    -> higher loss), so the search has a real Pareto tradeoff."""

    def __init__(self, topology):
        self.topology = topology

    def eval(self, arch):
        from amq_tpu.evaluation.metrics import get_bits_usage
        bits = np.concatenate([np.asarray(v, float)
                               for v in arch["linear"].values()])
        metric = float(np.mean(1.0 / bits))
        return {"synthetic": metric}, get_bits_usage(arch, self.topology, 128)


def test_search_end_to_end(tmp_path):
    from amq_tpu.search import Search

    cfg = get_config("tiny-llama")
    top = cfg.topology()
    space = SearchSpace(top, rng=np.random.default_rng(0))
    ev = FakeEvaluator(top)
    search = Search(ev, space, dataset="synthetic", iterations=2, n_doe=16,
                    n_iter=4, save_iter=1, ga_pop_size=16, subset_pop_size=8,
                    save_path=str(tmp_path), verbose=False)
    archive = search.search()
    assert len(archive) == 16 + 2 * 4
    # checkpoints written with the reference schema
    blob = json.load(open(tmp_path / "iter_2.stats"))
    assert set(blob) == {"archive", "candidates", "hv", "surrogate", "iteration"}
    assert blob["iteration"] == 2
    assert 0 < blob["hv"] <= 1.0
    # archive + candidates partition the full archive exactly (no
    # duplication on resume, unlike the reference's archive[-n_iter:])
    assert len(blob["archive"]) + len(blob["candidates"]) == len(archive)
    recon = [tuple(x) for x in blob["archive"] + blob["candidates"]]
    assert recon == [(a, m, b) for a, m, b in archive]

    # resume from checkpoint continues
    search2 = Search(ev, space, dataset="synthetic", iterations=3, n_iter=4,
                     ga_pop_size=16, subset_pop_size=8,
                     resume_path=str(tmp_path / "iter_2.stats"), verbose=False)
    archive2 = search2.search()
    assert len(archive2) >= len(archive)
    # the resumed archive starts from exactly the checkpointed state
    assert [(a, m, b) for a, m, b in archive2[:len(archive)]] == \
        [(json.loads(json.dumps(a)), m, b) for a, m, b in archive]

    # the search should find better low-bit configs than random DOE:
    # hypervolume grows over iterations
    b1 = json.load(open(tmp_path / "iter_1.stats"))
    assert blob["hv"] >= b1["hv"] - 1e-9


def test_checkpoint_short_final_batch(tmp_path):
    """Dedup can shrink the evaluated batch below n_iter; the checkpoint
    must record the actual batch, and resume must re-ingest it exactly."""
    from amq_tpu.search import Search

    cfg = get_config("tiny-llama")
    top = cfg.topology()
    space = SearchSpace(top, rng=np.random.default_rng(3))
    ev = FakeEvaluator(top)
    search = Search(ev, space, dataset="synthetic", iterations=1, n_doe=8,
                    n_iter=4, save_iter=1, ga_pop_size=8, subset_pop_size=8,
                    save_path=str(tmp_path), verbose=False)
    # force a short batch: evaluate 2 candidates, checkpoint claims n_cand=2
    doe = space.initialize(8)
    m, b = search._evaluate(doe)
    archive = list(zip(doe, m, b))
    cand = space.sample(2)
    cm, cb = search._evaluate(cand)
    archive.extend(zip(cand, cm, cb))

    class P:
        name = "rbf"
    search._checkpoint(1, archive, len(cand), 0.5, P(), {"rmse": 0.0})
    blob = json.load(open(tmp_path / "iter_1.stats"))
    assert len(blob["candidates"]) == 2
    assert len(blob["archive"]) == 8
    search.resume_path = str(tmp_path / "iter_1.stats")
    resumed, start_it = search._resume()
    assert len(resumed) == len(archive)
    assert start_it == 2


# ---------------------------------------------------------------------------
# decision making: high-tradeoff (knee) point selection


def test_high_tradeoff_points_finds_knee():
    from amq_tpu.search.decision import high_tradeoff_points
    # convex front with one sharp knee at (0.2, 0.25)
    F = np.array([
        [1.00, 0.00], [0.60, 0.05], [0.35, 0.12], [0.20, 0.25],
        [0.17, 0.55], [0.15, 0.80], [0.14, 1.00],
    ])
    idx = high_tradeoff_points(F)
    assert 3 in idx.tolist()
    top1 = high_tradeoff_points(F, n_survive=1)
    assert top1.tolist() == [3]


def test_select_candidates_high_tradeoff():
    from amq_tpu.cli.quantize import select_candidates
    archive = []
    # synthetic archive: loss falls off steeply then flattens vs bits
    for i, (loss, bits) in enumerate([(5.0, 2.8), (2.0, 2.9), (0.9, 3.0),
                                      (0.75, 3.1), (0.7, 3.2)]):
        archive.append(({"arch": i}, loss, bits))
    knee = select_candidates(archive, target_bits=3.0, offset=0.3, n=1,
                             method="gptq", high_tradeoff=True)
    assert len(knee) == 1
    # the knee of this front is (0.9, 3.0)
    assert knee[0][0] == {"arch": 2}
    # default ASF pick still selects the lowest-bits in-window arch
    asf = select_candidates(archive, target_bits=3.0, offset=0.3, n=1,
                            method="gptq")
    assert asf[0][0] == {"arch": 0}
