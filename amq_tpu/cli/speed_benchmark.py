"""Stage 5 — mixed-bit serving speed benchmark.

Mirror of amq/amq_speed_benchmark.py:99-293: assemble a mixed-bit model
from per-bit proxies according to an architecture (or a uniform/cycled
default), and measure TPS / GEMM / GEMV / TTFT / peak memory.  The
"stitching" is selector vectors on a stacked scan model; the kernels are
the fused Pallas dequant-matmuls.
"""

from __future__ import annotations

import json
import os

from .common import base_parser, dump_json, load_model, setup_jax


def main(argv=None):
    p = base_parser(__doc__)
    p.add_argument("--arch_json", type=str, default="",
                   help="architecture dict JSON (else cycle 2/3/4)")
    p.add_argument("--method", type=str, default="hqq",
                   choices=["hqq", "owq"],
                   help="serving realization: 'hqq' = stacked per-bit "
                        "proxies through the container kernels (default); "
                        "'owq' = OWQ packed serving (fused dequant-GEMV "
                        "over non-outlier columns + dense fp outlier tail "
                        "per linear — the QEFT kernel contract the "
                        "reference ships uncompiled)")
    p.add_argument("--target_bits", type=float, default=3.0,
                   help="avg-bits target for the OWQ outlier budget")
    p.add_argument("--proxy_path", type=str, default="")
    p.add_argument("--prompt_len", type=int, default=64)
    p.add_argument("--gen_len", type=int, default=128)
    p.add_argument("--modes", type=str, nargs="+",
                   default=["TPS", "GEMV", "GEMM", "TTFT"],
                   help="also: CONTINUOUS (slot-batched throughput)")
    p.add_argument("--n_slots", type=int, default=4)
    p.add_argument("--n_requests", type=int, default=16)
    p.add_argument("--no_pallas", action="store_true")
    p.add_argument("--native_pack", action="store_true",
                   help="capacity-optimal native bit packing (default "
                        "serves 3-bit codes via the faster 4-bit "
                        "container path, +1/3 streamed bytes)")
    p.add_argument("--head_bits", type=int, default=8,
                   help="lm_head serving width (packed, group 128); "
                        "0 keeps the dense bf16 head (the reference's "
                        "fp16-head configuration)")
    p.add_argument("--save_path", type=str, default="speed_out")
    # serving benchmark batch matches the reference default (batch 1,
    # amq_speed_benchmark.py:107-109); the shared default of 8 is for the
    # evaluation stages
    p.set_defaults(batch_size=1)
    args = p.parse_args(argv)
    jax = setup_jax(args)
    import jax.numpy as jnp

    from ..models import quantize_model
    from ..models.stacked import SERVE_CONTAINERS, stack_proxies
    from ..serving import Engine
    from ..serving.benchmark import PeakMemTracker, benchmark_speed
    from ..utils.checkpoint import load_quantized

    cfg, params = load_model(args)
    bits_range = [2, 3, 4]

    if args.method == "owq":
        _owq_speed(args, cfg, params, jnp)
        return
    # factories: stack_proxies builds + frees one per-bit proxy at a time
    # (three materialized 7B proxies + their stacked copies overflow a
    # 16 GB chip)
    if args.proxy_path:
        proxies = [
            (lambda b=b: load_quantized(os.path.join(
                args.proxy_path,
                f"{cfg.name}_{b}bit_{args.group_size}gs_1axis"))[0])
            for b in bits_range]
    else:
        proxies = [
            (lambda b=b: quantize_model(params, cfg, b,
                                        group_size=args.group_size,
                                        device=jax.devices()[0]))
            for b in bits_range]

    if args.arch_json:
        with open(args.arch_json) as f:
            arch = json.load(f)
    else:
        from ..models.config import cycled_arch
        arch = cycled_arch(cfg.num_layers, bits_range)

    model = stack_proxies(
        proxies, bits_range, arch,
        container_bits=None if args.native_pack else SERVE_CONTAINERS,
        head_bits=args.head_bits or None)
    if model.uniform_select:
        # compact per-container stacks: identical-width branches collapse
        # (~1 ms/token on 7B decode) and device memory drops from all
        # three full proxies to exactly the arch's container bits
        from ..models.stacked import merge_containers
        model = merge_containers(model)
    eng = Engine(model, cfg, batch_size=args.batch_size,
                 max_len=args.prompt_len + args.gen_len + 8,
                 compute_dtype=jnp.bfloat16, use_pallas=not args.no_pallas)

    from ..serving.benchmark import benchmark_continuous

    results = {}
    mem = PeakMemTracker()
    mem.sample()                # post-setup resident set (model + engine)
    for mode in args.modes:
        if mode == "CONTINUOUS":
            results[mode] = benchmark_continuous(
                model, cfg, n_slots=args.n_slots,
                n_requests=args.n_requests, prompt_len=args.prompt_len,
                gen_len=args.gen_len,
                max_len=args.prompt_len + args.gen_len + 8,
                use_pallas=not args.no_pallas)
            mem.sample()
        else:
            results[mode] = benchmark_speed(eng, mode,
                                            prompt_len=args.prompt_len,
                                            gen_len=args.gen_len, mem=mem)
        print(f"{mode}: {results[mode]}")
    peak, kind = mem.result()
    results["peak_mem_gib"] = peak
    # 'live_high_water' = max live device-array bytes sampled at every
    # dispatch boundary (true allocator peaks need memory_stats, which
    # axon does not expose — serving/benchmark.PeakMemTracker)
    results["peak_mem_kind"] = kind
    dump_json(results, f"{args.save_path}/{cfg.name}_speed.json")


def _owq_speed(args, cfg, params, jnp):
    """OWQ packed-serving benchmark: realize the arch with
    ``owq_quantize_model(packed=True)`` (synthetic calibration in hub-less
    environments) and serve through the unrolled forward — each layer's
    OWQLinear applies the fused dequant-GEMV + outlier tail."""
    import json as _json

    from ..quantization import get_quantized_params
    from ..serving import Engine
    from ..serving.benchmark import PeakMemTracker, benchmark_speed
    from .common import dump_json

    if args.arch_json:
        with open(args.arch_json) as f:
            arch = _json.load(f)
    else:
        from ..models.config import cycled_arch
        arch = cycled_arch(cfg.num_layers)

    qparams = get_quantized_params(
        params, cfg, "owq", arch, avg_bits=args.target_bits,
        group_size=args.group_size, synthetic_calib=args.synthetic,
        n_samples=args.n_sample, packed=True)
    # the PTQ pipeline parks quantized layers on host (committed arrays,
    # calib.layer_to_host) — commit them to the serving device or the jit
    # runs wherever the params are (i.e. CPU)
    import jax
    qparams = jax.device_put(qparams, jax.devices()[0])
    eng = Engine(qparams, cfg, batch_size=args.batch_size,
                 max_len=args.prompt_len + args.gen_len + 8,
                 compute_dtype=jnp.bfloat16, use_pallas=not args.no_pallas)

    results = {"method": "owq", "target_bits": args.target_bits}
    mem = PeakMemTracker()
    mem.sample()
    for mode in args.modes:
        if mode == "CONTINUOUS":
            continue                      # stacked-model path only
        results[mode] = benchmark_speed(eng, mode,
                                        prompt_len=args.prompt_len,
                                        gen_len=args.gen_len, mem=mem)
        print(f"{mode}: {results[mode]}")
    peak, kind = mem.result()
    results["peak_mem_gib"] = peak
    results["peak_mem_kind"] = kind
    dump_json(results, f"{args.save_path}/{cfg.name}_owq_speed.json")


if __name__ == "__main__":
    main()
