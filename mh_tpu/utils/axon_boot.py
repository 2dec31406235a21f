"""Robust TPU bring-up for entry-point scripts on axon-tunneled containers.

The container's sitecustomize auto-registers the axon TPU plugin for every
interpreter using the pool-redirect claim path, which can wedge
indefinitely (observed: the redirect/claim leg hangs while a manually
registered direct-provider session on the same terminal works fine). For
scripts that must not hang — the benchmark harness, the driver entry
hooks — ``ensure_robust_tpu()`` re-execs the process once with the
auto-registration env removed and registers the backend directly with a
bounded claim timeout. No-op on machines without the axon env.

Must be called before jax is imported by the application (the re-exec
replaces the process).
"""

from __future__ import annotations

import os
import sys

_BOOT_FLAG = "MH_TPU_MANUAL_AXON"


def ensure_robust_tpu(claim_timeout_s: int = 60) -> None:
    # respect an explicit CPU pin (e.g. the driver's virtual-device dryrun)
    if os.environ.get("JAX_PLATFORMS", "").startswith("cpu"):
        return
    pool_ips = os.environ.get("PALLAS_AXON_POOL_IPS")
    if pool_ips and os.environ.get(_BOOT_FLAG) != "1":
        env = dict(os.environ)
        env.pop("PALLAS_AXON_POOL_IPS", None)
        env[_BOOT_FLAG] = "1"
        # mirror what sitecustomize would have set up for the relay
        env.setdefault("AXON_POOL_SVC_OVERRIDE", "127.0.0.1")
        env.setdefault("AXON_LOOPBACK_RELAY", "1")
        env.setdefault("TPU_WORKER_HOSTNAMES", "localhost")
        os.execve(sys.executable, [sys.executable] + sys.argv, env)

    if os.environ.get(_BOOT_FLAG) != "1":
        return  # no axon env at all: nothing to do

    import uuid

    gen = os.environ.get("PALLAS_AXON_TPU_GEN", "v5e")
    try:
        from axon.register import register

        register(
            None,
            f"{gen}:1x1x1",
            so_path="/opt/axon/libaxon_pjrt.so",
            session_id=str(uuid.uuid4()),
            remote_compile=os.environ.get("PALLAS_AXON_REMOTE_COMPILE") == "1",
            claim_timeout_s=claim_timeout_s,
        )
    except Exception as e:  # pragma: no cover - defensive
        print(f"[mh_tpu] manual axon registration failed: {e}", file=sys.stderr)
