#!/usr/bin/env bash
# Stages 4+5 of the 7B pipeline on the searched archive (VERDICT r5 item 2):
#   stage 4 — realize a searched arch near avg 3.0 bits with GPTQ
#             (knee-point selection), evaluate PPL  (cli/quantize mirror of
#             amq/amq_quantization.py:57-141)
#   stage 5 — speed-benchmark the SEARCHED arch (not the cycled default)
#             through the packed serving engine (cli/speed_benchmark mirror
#             of amq/amq_speed_benchmark.py:99-293)
# Weights/tokens are synthetic (hub-less environment); the same commands
# run on real checkpoints via --model_path.
set -euo pipefail
cd "$(dirname "$0")/.."

ARCHIVE=${ARCHIVE:-$(ls benchmarks/search_7b/iter_*.stats | sort -V | tail -1)}
OUT=${OUT:-benchmarks/search_7b}
MODEL=${MODEL:-Llama-2-7b-hf}
CALIB_N=${CALIB_N:-128}

echo "== stage 4: GPTQ realization + eval on $ARCHIVE =="
python -m amq_tpu.cli.quantize \
  --model_name "$MODEL" --synthetic --dataset synthetic \
  --eval_dataset synthetic --n_sample "$CALIB_N" \
  --load "$ARCHIVE" --method gptq \
  --target_bits 3.0 --target_bits_offset 0.1 --num_of_candidates 1 \
  --high_tradeoff \
  --save_path "$OUT"

echo "== stage 5: speed benchmark of the searched arch =="
python - <<EOF
import json, sys
blob = json.load(open("$OUT/gptq_results.json"))
json.dump(blob[0]["arch"], open("$OUT/searched_arch.json", "w"))
print("searched arch bits:", blob[0]["bits"])
EOF
python -m amq_tpu.cli.speed_benchmark \
  --model_name "$MODEL" --synthetic \
  --arch_json "$OUT/searched_arch.json" \
  --modes TPS GEMV GEMM TTFT \
  --save_path "$OUT"
