"""One-process sweep of the fused kernel's chain-block size (MH_FUSED_BLOCK).

Tunnel throughput is bimodal *per process* (docs/PERFORMANCE.md), so block
variants must be compared within a single process; the XLA engine is timed
in the same process as an anchor. Run on the real TPU:

    python benchmarks/fused_block_sweep.py [n_objs] [n_chains]
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


def per_step(run, short=10, long_=1010, repeats=6):
    t_s = t_l = math.inf
    for _ in range(repeats):
        t0 = time.perf_counter()
        run(short)
        t1 = time.perf_counter()
        run(long_)
        t2 = time.perf_counter()
        t_s = min(t_s, t1 - t0)
        t_l = min(t_l, t2 - t1)
    return max((t_l - t_s) / (long_ - short), 1e-9)


def main():
    n_objs = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    n_chains = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
    spec = demo_scene(n_objs)
    scene = spec.build()
    pose0 = spec.initial_pose()
    cfg = SamplerConfig()

    # XLA-engine anchor in the same process
    runners = {
        i: compile_chains(scene, SamplerConfig(iterations=i, n_chains=n_chains))
        for i in (10, 1010)
    }

    def run_xla(iters):
        out = runners[iters](jax.random.key(0), pose0)
        st = out[0] if isinstance(out, tuple) else out
        np.asarray(st.pose)

    per = per_step(run_xla)
    print(json.dumps({"engine": "xla", "per_step_ms": round(per * 1e3, 4),
                      "proposals_per_s": round(n_chains / per, 1)}), flush=True)

    blocks = (
        [int(v) for v in sys.argv[3].split(",")] if len(sys.argv) > 3
        else [8, 16, 32, 64]
    )
    vmem_mb = int(sys.argv[4]) if len(sys.argv) > 4 else 0
    for b in blocks:
        os.environ["MH_FUSED_BLOCK"] = str(b)
        if vmem_mb > 0:
            os.environ["MH_FUSED_VMEM"] = str(vmem_mb << 20)
        elif vmem_mb == -1:
            os.environ.pop("MH_FUSED_VMEM", None)
        elif b >= 64:
            os.environ["MH_FUSED_VMEM"] = str(64 << 20)

        def run_fused(iters):
            pose, _, _, _ = run_chains_fused(0, pose0, scene, cfg, n_chains, iters)
            np.asarray(pose)

        per = per_step(run_fused)
        print(json.dumps({"engine": "fused", "block": b,
                          "per_step_ms": round(per * 1e3, 4),
                          "proposals_per_s": round(n_chains / per, 1)}),
              flush=True)


if __name__ == "__main__":
    main()
