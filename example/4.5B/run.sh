#!/bin/bash
# 4.5B generation on a single TPU chip (ref: example/4.5B/run.sh)
set -e
# VARIANT=distill or VARIANT=distill_quant selects the distilled /
# distilled+quantized (fp8_quant -> int8-on-MXU) example configs.
cd "$(dirname "$0")/../.."

export PAD_HQ=true
export PAD_DURATION=true
export JAX_COMPILATION_CACHE_DIR=${JAX_COMPILATION_CACHE_DIR:-/tmp/magi_tpu_jit_cache}

MODE=${1:-t2v}
PROMPT=${2:-"Good Boy"}
OUTPUT=${3:-output_4_5B.mp4}

CONFIG=${CONFIG:-example/4.5B/4.5B_${VARIANT:-base}_config.json}

python -m magi_tpu.pipeline.entry \
    --config_file "$CONFIG" \
    --mode "$MODE" \
    --prompt "$PROMPT" \
    --output_path "$OUTPUT"
