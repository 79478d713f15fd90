#!/bin/bash
# 24B generation on a multi-chip TPU slice (ref: example/24B/run.sh).
# No torchrun: one process drives the whole mesh; cp/tp sizes come from
# engine_config in the JSON (cp4 Ulysses by default).
set -e
# VARIANT=distill or VARIANT=distill_quant selects the distilled /
# distilled+quantized (fp8_quant -> int8-on-MXU) example configs.
cd "$(dirname "$0")/../.."

export PAD_HQ=true
export PAD_DURATION=true
export JAX_COMPILATION_CACHE_DIR=${JAX_COMPILATION_CACHE_DIR:-/tmp/magi_tpu_jit_cache}

MODE=${1:-t2v}
PROMPT=${2:-"Good Boy"}
OUTPUT=${3:-output_24B.mp4}

CONFIG=${CONFIG:-example/24B/24B_${VARIANT:-base}_config.json}

python -m magi_tpu.pipeline.entry \
    --config_file "$CONFIG" \
    --mode "$MODE" \
    --prompt "$PROMPT" \
    --output_path "$OUTPUT"
