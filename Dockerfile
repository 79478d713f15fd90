# MAGI-TPU serving image (ref: Dockerfile).  Build on a TPU VM base; the
# native IO runtime compiles at build time.
FROM python:3.12-slim

RUN apt-get update && apt-get install -y --no-install-recommends \
        g++ make libzstd-dev ffmpeg && \
    rm -rf /var/lib/apt/lists/*

RUN pip install --no-cache-dir \
        "jax[tpu]" -f https://storage.googleapis.com/jax-releases/libtpu_releases.html \
        flax optax safetensors zstandard numpy \
        opencv-python-headless pillow transformers sentencepiece requests

WORKDIR /workspace/MAGI-TPU
COPY . .

RUN make -C runtime

ENV OUT_DIR=/tmp/magi_outputs \
    MAGI_MODEL_SIZE=4.5B \
    MAGI_GPUS=1 \
    JAX_COMPILATION_CACHE_DIR=/tmp/magi_tpu_jit_cache \
    PAD_HQ=true \
    PAD_DURATION=true

EXPOSE 8002
CMD ["python", "-m", "magi_tpu.serve.service", "--port", "8002"]
