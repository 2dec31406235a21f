"""A/B sweep of MH_FUSED_STREAMS (interleaved independent chain streams).

One process (tunnel throughput is bimodal per process); per-step time by
the 3-length linearity fit (docs/PERFORMANCE.md measurement rules). Run on
the real TPU:

    python benchmarks/streams_sweep.py [n_objs] [n_chains] [streams,...]
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from mh_tpu.utils.axon_boot import ensure_robust_tpu  # noqa: E402

ensure_robust_tpu()

import numpy as np  # noqa: E402
import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/tmp/mh_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from mh_tpu.config import SamplerConfig  # noqa: E402
from mh_tpu.kernels.fused_mh import run_chains_fused  # noqa: E402
from mh_tpu.models.scene import demo_scene  # noqa: E402
from mh_tpu.sampler.mh import compile_chains  # noqa: E402

LENGTHS = (10, 2010, 10010)


def per_step_linfit(run, repeats=6):
    mins = {}
    for it in LENGTHS:
        run(it)  # compile/warm
        mins[it] = math.inf
    for _ in range(repeats):
        for it in LENGTHS:
            t0 = time.perf_counter()
            run(it)
            mins[it] = min(mins[it], time.perf_counter() - t0)
    xs = np.array(LENGTHS, float)
    ys = np.array([mins[it] for it in LENGTHS])
    return max(float(np.polyfit(xs, ys, 1)[0]), 1e-9)


def main():
    n_objs = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    n_chains = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
    streams = (
        [int(v) for v in sys.argv[3].split(",")] if len(sys.argv) > 3
        else [1, 2, 4]
    )
    spec = demo_scene(n_objs)
    scene = spec.build()
    pose0 = spec.initial_pose()
    cfg = SamplerConfig()

    runners = {
        i: compile_chains(scene, SamplerConfig(iterations=i, n_chains=n_chains))
        for i in LENGTHS
    }

    def run_xla(iters):
        out = runners[iters](jax.random.key(0), pose0)
        st = out[0] if isinstance(out, tuple) else out
        np.asarray(st.pose)

    per = per_step_linfit(run_xla)
    print(json.dumps({"engine": "xla", "per_step_ms": round(per * 1e3, 4),
                      "proposals_per_s": round(n_chains / per, 1)}), flush=True)

    # restore the caller's MH_FUSED_STREAMS afterwards: main() may be
    # driven programmatically from another harness, and leaking the last
    # sweep setting would multiply fused-runner compiles there (the
    # runner cache key includes the env knob)
    prev_streams = os.environ.get("MH_FUSED_STREAMS")
    try:
        for g in streams:
            if g > 1:
                os.environ["MH_FUSED_STREAMS"] = str(g)
            else:
                os.environ.pop("MH_FUSED_STREAMS", None)

            def run_fused(iters):
                pose, _, _, _ = run_chains_fused(
                    0, pose0, scene, cfg, n_chains, iters
                )
                np.asarray(pose)

            t0 = time.perf_counter()
            run_fused(1)
            compile_s = time.perf_counter() - t0
            per = per_step_linfit(run_fused)
            print(json.dumps({"engine": "fused", "streams": g,
                              "compile_s": round(compile_s, 1),
                              "per_step_ms": round(per * 1e3, 4),
                              "proposals_per_s": round(n_chains / per, 1)}),
                  flush=True)
    finally:
        if prev_streams is None:
            os.environ.pop("MH_FUSED_STREAMS", None)
        else:
            os.environ["MH_FUSED_STREAMS"] = prev_streams


if __name__ == "__main__":
    main()
