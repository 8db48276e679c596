"""Stage 2 — layer-wise sensitivity table for space pruning.

Mirror of amq/amq_sensitivity.py:16-81; writes the same JSON schema:
``{model}_dataset_{d}_n_sample_{n}_seqlen_{s}.json`` with a
``loss["{block}.{linear}"]`` table.
"""

from __future__ import annotations

import os

from .common import (apply_eval_cache_args, base_parser, compute_dtype,
                     data_mesh, dump_json,
                     load_model, load_tokens, setup_jax)


def main(argv=None):
    p = base_parser(__doc__)
    p.add_argument("--proxy_path", type=str, default="",
                   help="dir with per-bit proxies (else quantize in-process)")
    p.add_argument("--save_path", type=str, default="sensitivity")
    args = p.parse_args(argv)
    setup_jax(args)

    from ..evaluation import Evaluator
    from ..evaluation.sensitivity import linear_sensitivity
    from ..utils.checkpoint import load_quantized

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

    ev = Evaluator(cfg, dense_params=params, proxies=proxies,
                   datasets={args.dataset: tokens},
                   group_size=args.group_size, batch_size=args.batch_size,
                   mesh=data_mesh(args), compute_dtype=compute_dtype(args))
    # the dense pytree is consumed (logit cache + proxies); at 7B it is
    # 13.5 GB of host RAM this frame would otherwise pin for the run
    params = None
    apply_eval_cache_args(ev, args)
    table = linear_sensitivity(ev, args.dataset, progress=True)
    # local:<path> datasets carry slashes; keep the filename flat
    ds_tag = os.path.basename(args.dataset.replace("local:", ""))
    out = os.path.join(
        args.save_path,
        f"{cfg.name}_dataset_{ds_tag}_n_sample_{args.n_sample}"
        f"_seqlen_{args.seqlen}.json")
    dump_json(table, out)


if __name__ == "__main__":
    main()
