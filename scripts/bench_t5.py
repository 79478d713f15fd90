"""Measure T5-XXL text-encode cost at the reference caption length
(L=800) — VERDICT r2 #9: the prompt encoder runs dense on host CPU by
default (`t5_device: cpu`) and its cost was never measured.

Random weights (timing is weight-value independent), no tokenizer needed:
times `t5_encoder_forward` directly.

Usage: python scripts/bench_t5.py [cpu|tpu]   (default cpu)
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import jax

    target = sys.argv[1] if len(sys.argv) > 1 else "cpu"
    if target == "cpu":
        jax.config.update("jax_platforms", "cpu")
    else:
        jax.config.update("jax_compilation_cache_dir", "/tmp/magi_tpu_jit_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp
    import numpy as np

    from magi_tpu.models.t5.model import T5Config, init_t5_params, t5_encoder_forward

    # T5-v1.1-XXL geometry (the reference's encoder, t5_model.py:129-150)
    cfg = T5Config.xxl()
    params = init_t5_params(cfg, seed=0, dtype=jnp.bfloat16)
    n_params = sum(int(np.prod(v.shape)) for v in jax.tree_util.tree_leaves(params))

    L = 800
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(0, 32000, (1, L)), jnp.int32)
    mask = jnp.ones((1, L), jnp.int32)
    fwd = jax.jit(lambda p, i, m: t5_encoder_forward(p, cfg, i, m))

    t0 = time.time()
    out = fwd(params, ids, mask)
    np.asarray(out.ravel()[:1])
    first = time.time() - t0
    t0 = time.time()
    out = fwd(params, ids, mask)
    np.asarray(out.ravel()[:1])
    warm = time.time() - t0
    print(json.dumps({
        "metric": f"T5-XXL encode, L={L}, batch 1",
        "backend": jax.default_backend(),
        "params_B": round(n_params / 1e9, 2),
        "first_call_s": round(first, 1),
        "warm_call_s": round(warm, 2),
    }))


if __name__ == "__main__":
    main()
