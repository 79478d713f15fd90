"""A/B pack_uncond at fast-schedule shapes: pack=True folds the uncond CFG
branch into the text forward (2 jit launches/step instead of 3, shared
embed/prologue, one bigger attention grid) at the cost of peak activation
memory.  Round 1 left it off by default for memory; the honest-workload
activations at 480p leave room — measure whether it pays.

Usage: python scripts/ab_pack.py   (TPU)
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
from magi_tpu.sampling.transport import ArdfSampler  # noqa: E402


def walk_time(pack: bool):
    config = _flagship_config()
    config.engine_config.pack_uncond = pack
    params = init_dit_params(jax.random.PRNGKey(0), config, zeros=True)
    inp = _build(config, 4, 8, 2)
    s = ArdfSampler(config, params, inp, jax.random.PRNGKey(9))
    s.warm_step_variants()
    np.asarray(s.xs.ravel()[:1])
    t0 = time.perf_counter()
    n = sum(1 for _ in s.walk())
    np.asarray(s.xs.ravel()[:1])
    dt = time.perf_counter() - t0
    steps = s.total_forward_steps()
    print(json.dumps({"pack_uncond": pack, "wall_s": round(dt, 1),
                      "sec_per_step": round(dt / steps, 3), "chunks": n}))
    return dt / steps


def main() -> None:
    t_unpacked = walk_time(False)
    t_packed = walk_time(True)
    print(json.dumps({"speedup_pack_vs_unpack": round(t_unpacked / t_packed, 3)}))


if __name__ == "__main__":
    main()
