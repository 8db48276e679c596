#!/usr/bin/env bash
# End-to-end pipeline smoke on a tiny synthetic model (mirrors the
# reference's scripts/amq_*.sh stage sequence; runs anywhere, no hub).
set -euo pipefail
cd "$(dirname "$0")/.."
export JAX_PLATFORM_NAME=${JAX_PLATFORM_NAME:-cpu}
OUT=${OUT:-/tmp/amq_tpu_pipeline}
MODEL=${MODEL:-tiny-llama}
COMMON="--model_name $MODEL --synthetic --platform cpu --dataset synthetic \
        --n_sample 2 --seqlen 32 --batch_size 2"

rm -rf "$OUT" && mkdir -p "$OUT"

echo "== stage 1: quantization proxies =="
python -m amq_tpu.cli.proxy $COMMON --nbits 2 3 4 --save_path "$OUT/proxies"

echo "== stage 2: sensitivity =="
python -m amq_tpu.cli.sensitivity $COMMON --proxy_path "$OUT/proxies" \
    --save_path "$OUT/sens"
SENS="$OUT/sens/${MODEL}_dataset_synthetic_n_sample_2_seqlen_32.json"

echo "== stage 3: search =="
python -m amq_tpu.cli.search $COMMON --proxy_path "$OUT/proxies" \
    --sensitivity_json "$SENS" --iterations 2 --n_doe 10 --n_iter 4 \
    --save_iter 1 --ga_pop_size 16 --subset_pop_size 8 \
    --save_path "$OUT/search"

echo "== stage 4: realize + eval =="
python -m amq_tpu.cli.quantize $COMMON --load "$OUT/search/iter_2.stats" \
    --method gptq --target_bits 3.25 --target_bits_offset 1.2 \
    --eval_dataset synthetic --save_path "$OUT/quant"

echo "== stage 5: speed benchmark =="
python -m amq_tpu.cli.speed_benchmark --model_name $MODEL --synthetic \
    --platform cpu --no_pallas --proxy_path "$OUT/proxies" \
    --prompt_len 8 --gen_len 16 --modes TPS TTFT --save_path "$OUT/speed"

echo "pipeline ok: $(ls "$OUT")"
