"""A/B the 4.5B quantized step vs bf16 at fast-schedule shapes (round 2
found int8 ~parity end-to-end; round 3 swapped the int8 matmul to the
XLA-native dot at +12% and confirmed the scan context costs nothing —
re-measure the end-to-end verdict).

Usage: python scripts/ab_int8.py   (TPU; bf16 walk is jit-cache warm from
bench.py, int8 walk compiles fresh ~10 min cold)
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/magi_tpu_jit_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/magi_tpu_jit_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np  # noqa: E402

from __graft_entry__ import _flagship_config  # noqa: E402
from bench import _build  # noqa: E402
from magi_tpu.models.dit.model import init_dit_params  # noqa: E402
from magi_tpu.ops.quant import quantize_params_int4, quantize_params_int8  # noqa: E402
from magi_tpu.sampling.transport import ArdfSampler  # noqa: E402


def walk_time(config, params, tag):
    inp = _build(config, 4, 8, 2)
    s = ArdfSampler(config, params, inp, jax.random.PRNGKey(9))
    s.warm_step_variants()
    np.asarray(s.xs.ravel()[:1])
    t0 = time.perf_counter()
    n = sum(1 for _ in s.walk())
    np.asarray(s.xs.ravel()[:1])
    dt = time.perf_counter() - t0
    steps = s.total_forward_steps()
    print(json.dumps({
        "variant": tag, "wall_s": round(dt, 1), "sec_per_step": round(dt / steps, 3),
        "chunks": n,
    }))
    del s
    return dt / steps


def main() -> None:
    config = _flagship_config()
    params = init_dit_params(jax.random.PRNGKey(0), config, zeros=True)
    t_bf16 = walk_time(config, params, "bf16")
    qp = quantize_params_int8(params)
    del params
    cfg2 = _flagship_config()  # separate jit-cache entry
    t_i8 = walk_time(cfg2, qp, "w8a8_xla_dot")
    print(json.dumps({"speedup_int8_vs_bf16": round(t_bf16 / t_i8, 3)}))


if __name__ == "__main__":
    main()
