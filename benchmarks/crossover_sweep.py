"""Engine-crossover sweep: thin fused kernel vs XLA specialized scan.

One process, linearity fits, several object counts — refreshes the
``FUSED_CROSSOVER`` auto-engine threshold in mh_tpu/api.py after kernel
changes.

    python benchmarks/crossover_sweep.py [chains] [objs,objs,...]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mh_tpu.utils.axon_boot import ensure_robust_tpu  # noqa: E402

ensure_robust_tpu()

import jax  # noqa: E402
import numpy as np  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/tmp/mh_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from bench import _per_step_linfit  # noqa: E402
from mh_tpu.config import SamplerConfig  # noqa: E402
from mh_tpu.kernels.fused_mh import run_chains_fused  # noqa: E402
from mh_tpu.models.scene import demo_scene  # noqa: E402
from mh_tpu.sampler.mh import compile_chains  # noqa: E402


def main() -> None:
    n_chains = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    objs = (
        [int(v) for v in sys.argv[2].split(",")]
        if len(sys.argv) > 2 else [32, 64, 100]
    )
    lengths = (10, 1010, 2010)
    for n_objs in objs:
        spec = demo_scene(n_objs)
        scene = spec.build()
        pose0 = spec.initial_pose()
        cfg = SamplerConfig()

        def fused_run(iters):
            pose, _, _, _ = run_chains_fused(
                0, pose0, scene, cfg, n_chains, iters)
            np.asarray(pose)

        fused_run(1)
        per_f = _per_step_linfit(fused_run, lengths)

        runner = compile_chains(scene, SamplerConfig(
            iterations=2010, n_chains=n_chains))
        key = jax.random.key(0)

        def xla_run(iters):
            states, _ = runner(key, pose0, iterations=iters)
            np.asarray(states.pose)

        per_x = _per_step_linfit(xla_run, lengths)
        print(json.dumps({
            "objects": n_objs,
            "fused_ms": round(per_f * 1e3, 4),
            "xla_ms": round(per_x * 1e3, 4),
            "fused_speedup": round(per_x / per_f, 2),
        }), flush=True)


if __name__ == "__main__":
    main()
