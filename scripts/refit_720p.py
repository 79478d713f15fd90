"""Merge per-step points from one or more bench_24b.py runs and refit the
3-term step-time model (overhead + per-token + per-attended-pair), then
evaluate the reference-default 720x1280 32-step window-4 schedule — the
single defensible north-star #2 number once REAL 720p step points exist
(VERDICT r3 #2: collapse the fit-vs-kernel-calibrated 2x band).

Usage: python scripts/refit_720p.py run1.json [run2.json ...]
Each file: the final JSON line of a bench_24b.py run (stdout).
"""

import json
import sys

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def main() -> None:
    pts = []
    by_size = {}
    for path in sys.argv[1:]:
        with open(path) as f:
            txt = f.read().strip()
        rec = json.loads(txt.splitlines()[-1])
        for r in rec["measured"]:
            by_size.setdefault(str(r["size"]), []).extend(r["step_points"])
            pts.extend(r["step_points"])
    if len({(p[0], p[1]) for p in pts}) < 3:
        sys.exit("need >=3 distinct (tokens, pairs) points")

    A = np.array([[1.0, p[0], p[1]] for p in pts], np.float64)
    y = np.array([p[2] for p in pts], np.float64)
    col = A.max(axis=0)
    coeffs = np.linalg.lstsq(A / col, y, rcond=None)[0] / col
    resid = y - A @ coeffs

    from magi_tpu.core.config import MagiConfig
    from scripts.bench_24b import _project_720p

    rc = MagiConfig.from_json("example/24B/24B_base_config.json").runtime_config
    proj = _project_720p(rc, coeffs)
    has_720p = any("720" in s for s in by_size)
    out = {
        "sizes_merged": {s: len(v) for s, v in by_size.items()},
        "n_points": len(pts),
        "fit_rms_resid_s": round(float(np.sqrt(np.mean(resid ** 2))), 3),
        "includes_real_720p_points": has_720p,
        **proj,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
