"""Stage 1 — build uniform-bit HQQ quantization proxies.

Mirror of amq/amq_quantization_proxy.py:26-42: quantize every decoder
linear at a uniform bit-width (group 128) and save the packed model.

    python -m amq_tpu.cli.proxy --model_name tiny-llama --synthetic \
        --nbits 4 --save_path /tmp/proxies
"""

from __future__ import annotations

import os

from .common import base_parser, load_model, setup_jax


def main(argv=None):
    p = base_parser(__doc__)
    p.add_argument("--nbits", type=int, nargs="+", default=[2, 3, 4])
    p.add_argument("--save_path", type=str, required=True)
    p.add_argument("--no_optimize", action="store_true",
                   help="skip the proximal zero-point solver")
    p.add_argument("--meta_dtype", type=str, default="bfloat16",
                   choices=["float32", "bfloat16"],
                   help="scale/zero storage dtype; bfloat16 mirrors the "
                        "reference's fp16 HQQ meta and halves the serving "
                        "metadata stream")
    args = p.parse_args(argv)
    setup_jax(args)
    import jax.numpy as jnp

    from ..models import quantize_model
    from ..utils.checkpoint import save_quantized

    import jax
    cfg, params = load_model(args)
    for b in args.nbits:
        # stage weights on the accelerator (host-committed params would
        # pin the proximal solver to the CPU backend)
        q = quantize_model(params, cfg, b, group_size=args.group_size,
                           optimize=not args.no_optimize,
                           meta_dtype=getattr(jnp, args.meta_dtype),
                           device=jax.devices()[0])
        # path schema mirrors {model}_{n}bit_128gs_1axis (reference scripts)
        out = os.path.join(args.save_path,
                           f"{cfg.name}_{b}bit_{args.group_size}gs_1axis")
        save_quantized(q, cfg, out, extra_meta={"nbits": b})
        print(f"saved {out}")


if __name__ == "__main__":
    main()
