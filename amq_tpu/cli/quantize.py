"""Stage 4 — realize searched architectures with real PTQ + evaluate PPL.

Mirror of amq/amq_quantization.py:57-141: load a search archive
(``iter_N.stats``), filter to the target-bits window, ASF-select
candidates (weights [0, target] -> lowest bits usage in window,
amq_quantization.py:89-90), quantize with AWQ/GPTQ/OWQ at the selected
per-layer assignment, and report WikiText-2/C4 perplexity.  OWQ bit
bookkeeping adds +0.1 avg bits (amq_quantization.py:75-76).
"""

from __future__ import annotations

import json

import numpy as np

from .common import (apply_eval_cache_args, base_parser, compute_dtype,
                     data_mesh, dump_json,
                     load_model, load_tokens, setup_jax)


def select_candidates(archive, target_bits: float, offset: float, n: int,
                      method: str, high_tradeoff: bool = False):
    """Window filter + ASF pick (amq_quantization.py:70-90); with
    ``high_tradeoff`` the knee points of the in-window front are selected
    instead (HighTradeoffPoints, amq_quantization.py:15-54)."""
    archs = [v[0] for v in archive]
    metric = np.array([float(v[1]) for v in archive])
    bits = np.array([float(v[2]) for v in archive])
    if method == "owq":
        bits = bits + 0.1
    order = np.argsort(metric, kind="stable")
    metric, bits = metric[order], bits[order]
    archs = [archs[i] for i in order]
    in_win = (bits > target_bits - offset) & (bits < target_bits + offset)
    idx = np.where(in_win)[0]
    if idx.size == 0:
        raise SystemExit(f"no archs within {target_bits}+-{offset}")
    if high_tradeoff:
        from ..search.decision import high_tradeoff_points
        F = np.column_stack([metric[idx], bits[idx]])
        knees = high_tradeoff_points(F, n_survive=min(n, idx.size))
        pick = idx[np.asarray(knees, int)]
    else:
        # pymoo ASF with weights [0, target]: rank by bits usage alone
        asf = np.column_stack([metric[idx] * 0.0,
                               bits[idx] * target_bits]).max(1)
        pick = idx[np.argsort(asf, kind="stable")[:n]]
    return [(archs[i], metric[i], bits[i]) for i in pick]


def main(argv=None):
    p = base_parser(__doc__)
    p.add_argument("--load", type=str, required=True,
                   help="iter_N.stats archive from the search stage")
    p.add_argument("--method", type=str, default="gptq",
                   choices=["fp16", "awq", "gptq", "owq", "hqq"])
    p.add_argument("--target_bits", type=float, default=3.0)
    p.add_argument("--target_bits_offset", type=float, default=0.05)
    p.add_argument("--num_of_candidates", type=int, default=1)
    p.add_argument("--high_tradeoff", action="store_true",
                   help="select knee points of the in-window front "
                        "(HighTradeoffPoints) instead of the ASF pick")
    p.add_argument("--eval_dataset", type=str, nargs="+",
                   default=["wikitext2", "c4"])
    p.add_argument("--save_path", type=str, default="quantize_out")
    args = p.parse_args(argv)
    setup_jax(args)

    from ..evaluation import Evaluator
    from ..quantization import get_quantized_params

    with open(args.load) as f:
        blob = json.load(f)
    archive = blob["archive"] + blob["candidates"]

    cfg, params = load_model(args)
    datasets = {}
    for d in args.eval_dataset:
        a2 = argparse_clone(args, dataset=d)
        datasets[d] = load_tokens(a2, cfg, train=False)

    selected = select_candidates(archive, args.target_bits,
                                 args.target_bits_offset,
                                 args.num_of_candidates, args.method,
                                 high_tradeoff=args.high_tradeoff)
    for arch, metric, bits in selected:
        print(f"selected arch: loss={metric:.4f} bits={bits:.4f}")

    # local:<file> runs calibrate from the same local corpus (train split
    # semantics); hub datasets keep the reference's per-method calib sets
    calib_tokens = None
    if args.dataset.startswith("local:"):
        calib_tokens = load_tokens(args, cfg, train=True)

    def quantize_fn(p, c, arch, method):
        if method == "fp16":
            return p
        from ..evaluation.metrics import get_bits_usage
        avg = get_bits_usage(arch, c.topology(), args.group_size)
        return get_quantized_params(
            p, c, method, arch, avg_bits=avg, group_size=args.group_size,
            calib_tokens=calib_tokens,
            synthetic_calib=args.synthetic, n_samples=args.n_sample)

    ev = Evaluator(cfg, dense_params=params, datasets=datasets, search=False,
                   group_size=args.group_size, batch_size=args.batch_size,
                   mesh=data_mesh(args), quantize_fn=quantize_fn,
                   compute_dtype=compute_dtype(args))
    apply_eval_cache_args(ev, args)

    results = []
    for arch, metric, bits in selected:
        metrics, usage = ev.eval(arch, method=args.method)
        print(f"bits={usage:.4f} ppl={metrics}")
        results.append({"arch": arch, "method": args.method,
                        "bits": usage, "ppl": metrics})
    dump_json(results, f"{args.save_path}/{args.method}_results.json")


def argparse_clone(args, **over):
    import copy
    a = copy.copy(args)
    for k, v in over.items():
        setattr(a, k, v)
    return a


if __name__ == "__main__":
    main()
