"""In-process A/B of the thin engine vs the wide layout vs the XLA scan.

One process, one TPU session (tunnel throughput is bimodal per process) —
MH_FUSED_THIN is read per _get_runner call, so both fused variants and the
XLA specialized scan measure under identical session conditions with the
3-length linearity fit.

    python benchmarks/thin_ab.py [n_objs] [n_chains] [mode]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mh_tpu.utils.axon_boot import ensure_robust_tpu  # noqa: E402

ensure_robust_tpu()

import jax  # noqa: E402
import numpy as np  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/tmp/mh_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from bench import _per_step_linfit  # noqa: E402
from mh_tpu.config import CostMode, SamplerConfig  # noqa: E402
from mh_tpu.kernels.fused_mh import run_chains_fused  # noqa: E402
from mh_tpu.models.scene import demo_scene  # noqa: E402
from mh_tpu.sampler.mh import compile_chains  # noqa: E402


def main() -> None:
    n_objs = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    n_chains = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
    mode = CostMode[sys.argv[3]] if len(sys.argv) > 3 else CostMode.PARITY
    spec = demo_scene(n_objs)
    scene = spec.build()
    pose0 = spec.initial_pose()
    cfg = SamplerConfig(mode=mode)
    lengths = (10, 1010, 2010)

    def fused_run(iters):
        pose, _, _, _ = run_chains_fused(0, pose0, scene, cfg, n_chains, iters)
        np.asarray(pose)

    # restore the caller's MH_FUSED_THIN even on a mid-sweep failure
    # (leaking a sweep knob into a caller multiplies runner compiles —
    # advisor r4 finding class)
    prev_thin = os.environ.get("MH_FUSED_THIN")
    try:
        for thin in ("1", "0"):
            os.environ["MH_FUSED_THIN"] = thin
            t0 = time.perf_counter()
            fused_run(1)
            compile_s = time.perf_counter() - t0
            per = _per_step_linfit(fused_run, lengths)
            print(json.dumps({
                "engine": "fused", "thin": thin, "mode": mode.name,
                "compile_s": round(compile_s, 1),
                "per_step_ms": round(per * 1e3, 4),
                "proposals_per_s": round(n_chains / per, 1),
            }), flush=True)
    finally:
        if prev_thin is None:
            os.environ.pop("MH_FUSED_THIN", None)
        else:
            os.environ["MH_FUSED_THIN"] = prev_thin

    runner = compile_chains(scene, SamplerConfig(
        iterations=2010, n_chains=n_chains, mode=mode))
    key = jax.random.key(0)

    def xla_run(iters):
        states, _ = runner(key, pose0, iterations=iters)
        np.asarray(states.pose)

    per = _per_step_linfit(xla_run, lengths)
    print(json.dumps({
        "engine": "xla_specialized", "mode": mode.name,
        "per_step_ms": round(per * 1e3, 4),
        "proposals_per_s": round(n_chains / per, 1),
    }), flush=True)


if __name__ == "__main__":
    main()
