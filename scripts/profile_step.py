"""Profile one steady-state denoise step on the real chip and print where
the time goes, grouped by op category (dot / pallas attention / pallas qmm
/ copies / converts / other fusions).

Parses the xplane proto directly — the tensorboard converter is broken in
this image (protobuf mismatch).  '%while'/'%cond' wrapper events contain
their bodies and are excluded from the aggregation.

Usage: python scripts/profile_step.py [bf16|int8|int4]   (TPU; ~5 min warm;
default bf16)
"""

import glob
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/magi_tpu_jit_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/magi_tpu_jit_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from __graft_entry__ import _flagship_config  # noqa: E402
from bench import _build  # noqa: E402
from magi_tpu.models.dit.model import init_dit_params  # noqa: E402
from magi_tpu.ops.quant import quantize_params_int4, quantize_params_int8  # noqa: E402
from magi_tpu.sampling.transport import ArdfSampler  # noqa: E402


def categorize(name: str) -> str:
    n = name.lower()
    if "seg_attn" in n or "attn_kernel" in n or "two_source" in n:
        return "pallas_attention"
    if "qmm" in n:
        return "pallas_qmm"
    if n.startswith("%copy") or ".copy" in n or "copy-start" in n or "copy." in n:
        return "copy"
    # matmuls fused with an output convert are named e.g.
    # %convolution_convert_fusion — classify by the dominant op (the dot),
    # not the epilogue, or fc2 shows up as "convert" (round-3 docs bug).
    # NOTE: the broad 'convolution' match also bins REAL convolutions as
    # "dot" — intentional for the DiT step trace (its only conv-named ops
    # are dot fusions), but on a trace with genuine convs (the VAE's
    # patch-embed Conv3d) those land here too.
    if "convolution" in n or n.startswith("%dot") or "dot." in n or n.startswith("dot"):
        return "dot"
    if "convert" in n:
        return "convert"
    if "custom-call" in n or "custom_call" in n:
        return "custom_call"
    if "fusion" in n:
        return "fusion"
    if "dynamic-update" in n or "dynamic_update" in n:
        return "dus"
    if "all-to-all" in n or "all-gather" in n or "all-reduce" in n or "collective" in n:
        return "collective"
    return "other"


def main() -> None:
    config = _flagship_config()
    rc = config.runtime_config
    params = init_dit_params(jax.random.PRNGKey(0), config, zeros=True)
    mode = sys.argv[1] if len(sys.argv) > 1 else "bf16"
    if mode == "int8":
        params = quantize_params_int8(params)
    elif mode == "int4":
        params = quantize_params_int4(params)

    inp = _build(config, 4, 8, 2)  # bench fast-schedule shapes (warm jit cache)
    s = ArdfSampler(config, params, inp, jax.random.PRNGKey(7))
    gen = iter(s.walk())
    next(gen)  # reach steady state (first chunk out)
    np.asarray(s.xs.ravel()[:1])
    outdir = "/tmp/xprof_step"
    os.system(f"rm -rf {outdir}")
    with jax.profiler.trace(outdir):
        try:
            next(gen)
        except StopIteration:
            pass
        np.asarray(s.xs.ravel()[:1])
    print("trace done", file=sys.stderr)

    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    totals: dict = {}
    examples: dict = {}
    for f in glob.glob(outdir + "/**/*.xplane.pb", recursive=True):
        xs_ = xplane_pb2.XSpace()
        xs_.ParseFromString(open(f, "rb").read())
        for plane in xs_.planes:
            if "TPU" not in plane.name or "device" not in plane.name.lower():
                continue
            ev_names = plane.event_metadata
            for line in plane.lines:
                if line.name != "XLA Ops":
                    continue
                for ev in line.events:
                    name = ev_names[ev.metadata_id].name
                    if name.startswith("%while") or name.startswith("%cond") or name.startswith("%conditional"):
                        continue
                    cat = categorize(name)
                    dur = ev.duration_ps / 1e12
                    totals[cat] = totals.get(cat, 0.0) + dur
                    ex = examples.setdefault(cat, {})
                    ex[name] = ex.get(name, 0.0) + dur

    grand = sum(totals.values())
    print(f"mode={mode}  total device op time: {grand:.3f}s")
    for cat, t in sorted(totals.items(), key=lambda kv: -kv[1]):
        print(f"  {cat:18s} {t:8.3f}s  {100*t/grand:5.1f}%")
        top = sorted(examples[cat].items(), key=lambda kv: -kv[1])[:4]
        for n, tt in top:
            print(f"      {tt:7.3f}s  {n[:110]}")


if __name__ == "__main__":
    main()
