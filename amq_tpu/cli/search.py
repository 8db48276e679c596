"""Stage 3 — NSGA-II mixed-precision search.

Mirror of amq/amq_search.py:18-64 (defaults from scripts/amq_search.sh:
threshold 2.0, rbf surrogate, 200 iters, DOE 250, 50/iter, pops 100/200,
crossover 0.9, mutation 0.1).  Requires a sensitivity JSON, like the
reference (amq_search.py:55-59).
"""

from __future__ import annotations

import json
import os

from .common import (apply_eval_cache_args, base_parser, compute_dtype,
                     data_mesh, load_model,
                     load_tokens, setup_jax)


def main(argv=None):
    p = base_parser(__doc__)
    p.add_argument("--sensitivity_json", type=str, required=True)
    p.add_argument("--sensitivity_threshold", type=float, default=2.0)
    p.add_argument("--proxy_path", type=str, default="")
    p.add_argument("--predictor", type=str, default="rbf",
                   choices=["rbf", "mlp"])
    p.add_argument("--iterations", type=int, default=200)
    p.add_argument("--n_doe", type=int, default=250)
    p.add_argument("--n_iter", type=int, default=50)
    p.add_argument("--save_iter", type=int, default=10)
    p.add_argument("--ga_pop_size", type=int, default=200)
    p.add_argument("--subset_pop_size", type=int, default=100)
    p.add_argument("--crossover_prob", type=float, default=0.9)
    p.add_argument("--mut_prob", type=float, default=0.1)
    p.add_argument("--max_value", type=float, default=10.0)
    p.add_argument("--save_path", type=str, default="search_out")
    p.add_argument("--resume_path", type=str, default="")
    args = p.parse_args(argv)
    setup_jax(args)

    import numpy as np

    from ..evaluation import Evaluator
    from ..search import Search, SearchSpace, prune_by_sensitivity
    from ..utils.checkpoint import load_quantized

    with open(args.sensitivity_json) as f:
        sensitivity = json.load(f)

    cfg, params = load_model(args)
    tokens = load_tokens(args, cfg, train=True)

    proxies = None
    if args.proxy_path:
        # factories: built + freed one per-bit proxy at a time inside
        # stack_proxies (7B memory staging)
        proxies = [
            (lambda b=b: load_quantized(os.path.join(
                args.proxy_path,
                f"{cfg.name}_{b}bit_{args.group_size}gs_1axis"))[0])
            for b in (2, 3, 4)]

    pass_list = prune_by_sensitivity(sensitivity, args.sensitivity_threshold)
    print(f"pass_linear_list ({len(pass_list)}): {pass_list}")

    ev = Evaluator(cfg, dense_params=params, proxies=proxies,
                   datasets={args.dataset: tokens},
                   group_size=args.group_size, batch_size=args.batch_size,
                   mesh=data_mesh(args), compute_dtype=compute_dtype(args))
    params = None          # 13.5 GB host pytree at 7B — consumed above
    apply_eval_cache_args(ev, args)
    space = SearchSpace(cfg.topology(), group_size=args.group_size,
                        pass_linear_list=pass_list,
                        rng=np.random.default_rng(args.seed))
    search = Search(
        ev, space, dataset=args.dataset, iterations=args.iterations,
        n_doe=args.n_doe, n_iter=args.n_iter, save_iter=args.save_iter,
        predictor=args.predictor, ga_pop_size=args.ga_pop_size,
        subset_pop_size=args.subset_pop_size,
        crossover_prob=args.crossover_prob, mut_prob=args.mut_prob,
        max_value=args.max_value, save_path=args.save_path,
        resume_path=args.resume_path or None, seed=args.seed)
    search.search()


if __name__ == "__main__":
    main()
