"""Mosaic compile-time probe for the fused kernel (VERDICT r3 task 3).

Round 3 lost multiple A/B experiments to pathological Mosaic compiles
(deferred commit ~27 min, vpu gather >40 min, B=256 >25 min) with no
root cause. This probe measures ONE configuration's trace+compile wall
time (a 1-iteration run at the requested shape) and prints a JSON line,
so a matrix of env knobs can be swept from a driver shell loop:

  for u in 16 8 4 2 1; do
    MH_FUSED_UNROLL=$u timeout 2400 python benchmarks/mosaic_compile_probe.py
  done

Knobs of interest: MH_FUSED_UNROLL (inner draw-block unroll = single-
basic-block size), MH_FUSED_BLOCK (vreg footprint per op),
MH_FUSED_THIN / MH_FUSED_SLABW (tile shapes; the DEFER/GATHER knobs the
round-3 sweep also probed were deleted in round 5 after losing every
measurement). Confirmed hypothesis: compile time scales with (unrolled
block length) x (live vreg set), i.e. register-allocation search, not
with op count per se.

A fresh process per probe is required — the in-process runner cache and
the jit cache would otherwise hide the compile. The persistent JAX
compilation cache is DISABLED here for the same reason.
"""

from __future__ import annotations

# script-launch robustness: make the repo root importable even when the
# dev .pth is absent (fresh environments)
import os as _os, sys as _sys
_ROOT = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
if _ROOT not in _sys.path:
    _sys.path.insert(0, _ROOT)

import json
import os
import sys
import time


def main() -> None:
    from mh_tpu.utils.axon_boot import ensure_robust_tpu

    ensure_robust_tpu()

    import jax  # noqa: F401 — backend up

    import numpy as np

    from mh_tpu.config import SamplerConfig
    from mh_tpu.kernels.fused_mh import run_chains_fused
    from mh_tpu.models.scene import demo_scene

    n_objs = int(os.environ.get("PROBE_OBJS", "100"))
    n_chains = int(os.environ.get("PROBE_CHAINS", "1024"))
    spec = demo_scene(n_objs)
    scene = spec.build()
    cfg = SamplerConfig()
    pose0 = spec.initial_pose()

    t0 = time.perf_counter()
    pose, _, _, _ = run_chains_fused(0, pose0, scene, cfg, n_chains, 1)
    np.asarray(pose)
    compile_s = time.perf_counter() - t0

    print(json.dumps({
        "compile_s": round(compile_s, 1),
        "objs": n_objs,
        "chains": n_chains,
        "unroll": os.environ.get("MH_FUSED_UNROLL", "(default)"),
        "block": os.environ.get("MH_FUSED_BLOCK", "auto"),
        "thin": os.environ.get("MH_FUSED_THIN", "1"),
        "slabw": os.environ.get("MH_FUSED_SLABW", "8"),
        "skip": os.environ.get("MH_FUSED_SKIP", ""),
    }))


if __name__ == "__main__":
    # fresh compile every run: no persistent cache
    os.environ.pop("JAX_COMPILATION_CACHE_DIR", None)
    sys.exit(main())
