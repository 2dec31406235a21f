"""Fused-kernel ablation profiler: per-step linfit under MH_FUSED_SKIP.

Each invocation measures ONE configuration (the skip set is baked in at
import time of fused_mh) and prints a JSON line. Drive a sweep with:

    for s in "" sym rel clr rng "sym,rel,clr,rng"; do
        MH_FUSED_SKIP=$s python benchmarks/profile_fused.py; done

Uses the same 3-length linearity fit as bench.py (the only estimator that
survives the axon tunnel's time-correlated per-call noise — see
docs/PERFORMANCE.md methodology corrections).
"""

from __future__ import annotations

# script-launch robustness: make the repo root importable even when the
# dev .pth is absent (fresh environments)
import os as _os, sys as _sys
_ROOT = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
if _ROOT not in _sys.path:
    _sys.path.insert(0, _ROOT)

import argparse
import json
import math
import os
import sys
import time

import numpy as np

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/mh_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


def per_step_linfit(run, lengths, repeats: int = 6) -> float:
    mins = {}
    for it in lengths:
        run(it)  # compile/warm
        mins[it] = math.inf
    for _ in range(repeats):
        for it in lengths:
            t0 = time.perf_counter()
            run(it)
            mins[it] = min(mins[it], time.perf_counter() - t0)
    xs = np.array(lengths, float)
    ys = np.array([mins[it] for it in lengths])
    return max(float(np.polyfit(xs, ys, 1)[0]), 1e-9)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--objects", type=int, default=100)
    ap.add_argument("--chains", type=int, default=1024)
    ap.add_argument("--moves", type=int, default=1)
    ap.add_argument("--repeats", type=int, default=6)
    ap.add_argument("--lengths", type=str, default="10,1010,2010")
    args = ap.parse_args()

    from mh_tpu.config import SamplerConfig
    from mh_tpu.kernels.fused_mh import run_chains_fused
    from mh_tpu.models.scene import demo_scene

    spec = demo_scene(args.objects)
    scene = spec.build()
    cfg = SamplerConfig(n_moves_per_step=args.moves)
    pose0 = spec.initial_pose()

    def run(iters):
        pose, *_ = run_chains_fused(
            0, pose0, scene, cfg, args.chains, iters
        )
        np.asarray(pose)  # force completion through the tunnel

    lengths = tuple(int(x) for x in args.lengths.split(","))
    per_step = per_step_linfit(run, lengths, repeats=args.repeats)
    print(
        json.dumps(
            {
                "skip": os.environ.get("MH_FUSED_SKIP", ""),
                "incremental": os.environ.get("MH_FUSED_INCREMENTAL", "1"),
                "block": os.environ.get("MH_FUSED_BLOCK", ""),
                "vmem": os.environ.get("MH_FUSED_VMEM", ""),
                "objects": args.objects,
                "chains": args.chains,
                "per_step_ms": round(per_step * 1e3, 5),
                "proposals_per_s": round(args.chains * args.moves / per_step, 1),
            }
        )
    )


if __name__ == "__main__":
    from mh_tpu.utils.axon_boot import ensure_robust_tpu

    ensure_robust_tpu()
    main()
