"""Huge-scene layout sampling: shard the O(N^2) objective across devices.

The reference's own README flags quadratic cost growth as its scaling
limit (``/root/reference/Readme.md:6`` — the symmetry and off-limits terms
build N x N matrices, ``Kernel.cu:283-318,485-514``). The TPU answer is a
2-D (chains x objs) device mesh: chains stay data-parallel on one axis
while each chain's N x N cost rows are sharded over the other and
psum-reduced over ICI every step.

Run on any multi-device platform — e.g. the 8-virtual-device CPU mesh:

    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python examples/huge_scene.py --objects 2048 --objs-devices 4

(In this container also unset PALLAS_AXON_POOL_IPS, or the pinned single
TPU chip wins: ``env -u PALLAS_AXON_POOL_IPS ...``.)
"""

from __future__ import annotations

# script-launch robustness: make the repo root importable even when the
# dev .pth is absent (fresh environments)
import os as _os, sys as _sys
_ROOT = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
if _ROOT not in _sys.path:
    _sys.path.insert(0, _ROOT)

import argparse
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--objects", type=int, default=2048)
    ap.add_argument("--chains", type=int, default=2)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--objs-devices", type=int, default=4)
    args = ap.parse_args()

    import jax

    from mh_tpu.api import suggest_layouts
    from mh_tpu.config import SamplerConfig
    from mh_tpu.models.scene import demo_scene

    n_dev = jax.device_count()
    if n_dev % args.objs_devices:
        # degrade gracefully on fewer devices (e.g. the single pinned TPU
        # chip in this container) instead of crashing: shard over what
        # exists — with 1 device that is an unsharded run of the same
        # program, still a valid demonstration of the API
        largest = 1
        for k in range(1, n_dev + 1):
            if n_dev % k == 0 and k <= args.objs_devices:
                largest = k
        print(f"requested --objs-devices {args.objs_devices} does not "
              f"divide the {n_dev} visible devices; using {largest} "
              f"(run under XLA_FLAGS=--xla_force_host_platform_device_count=8 "
              f"JAX_PLATFORMS=cpu for a real mesh)")
        args.objs_devices = largest
    print(f"{n_dev} {jax.devices()[0].platform} devices; "
          f"{args.objects}-object scene, objective rows sharded over "
          f"{args.objs_devices} of them")

    spec = demo_scene(args.objects)
    cfg = SamplerConfig(iterations=args.iters, n_chains=args.chains)
    t0 = time.time()
    res = suggest_layouts(spec, cfg, key=0, objs_devices=args.objs_devices)
    dt = time.time() - t0
    for c in range(args.chains):
        print(f"chain {c}: total={res.costs[c, 0]:.2f} "
              f"accept_rate={res.accept_rate[c]:.2f}")
    print(f"{args.chains * args.iters} proposals over a "
          f"{args.objects}x{args.objects} objective in {dt:.1f}s "
          f"(incl. compile)")


if __name__ == "__main__":
    main()
