"""Benchmark harness — prints ONE JSON line for the driver.

Headline metric (BASELINE.md config 3/4): MH proposals/s/chip on the
100-object layout scene, 1024 chains batched per chip, full vectorized cost
matrix per proposal.

Architecture (round 4 — "the benchmark must be un-killable"):

  parent (this process)          never initializes a JAX backend; it only
    |                            orchestrates and prints the final line
    +-- preflight  subprocess    fresh TPU claim + tiny jitted op
    +-- engine     subprocess    fresh TPU claim + ONE measurement, result
    |                            on a protocol line '@MHBENCH {json}'
    +-- retry loop               transient backend failures (wedged claim,
                                 FAILED_PRECONDITION, hang->timeout) are
                                 retried with backoff; each retry gets a
                                 brand-new process and backend session

Rounds 2 and 3 both lost their scoreboard number to single-process
failure modes: r02 a fused-kernel VMEM OOM aborted the whole run, r03 a
transiently wedged backend (FAILED_PRECONDITION on every engine) that
cleared ~20 min later. Engine isolation (r03's `_guarded`) is not enough
when every engine shares one wedged backend in one process — hence
process-per-measurement with re-registration between attempts.

``vs_baseline``: the reference publishes no numbers (BASELINE.md), so the
anchor is the *reference-math single-core baseline* — the same objective +
MH loop executed by the straight-Python/NumPy oracle (tests/oracle.py, a
faithful loop-for-loop implementation of Kernel.cu's math). The divisor is
a PINNED calibration constant (below): a live 30-iteration timing swung
1.9x between rounds with machine load, which made vs_baseline noise. A
live re-measurement still runs (CPU subprocess) and is printed to stderr
as a sanity check against calibration rot.

Usage:
  python bench.py                # headline + secondaries + BASELINE
                                 # configs 1-5, one JSON line to stdout
  python bench.py --all          # additionally run the XLA pi estimator
                                 # and the K=64 block-proposal config
  python bench.py --engine NAME  # child mode: one measurement (internal)

Testing the retry machinery: MH_BENCH_POISON=N makes the parent poison the
first N child invocations (the child dies with a synthetic
FAILED_PRECONDITION); tests/test_bench_harness.py asserts the JSON line
still appears. MH_BENCH_SLEEPS overrides the backoff schedule.
"""

from __future__ import annotations

import argparse
import json
import math
import os
import subprocess
import sys
import time

# ---------------------------------------------------------------------------
# Pinned oracle baseline (proposals/s, single-core NumPy, 100 objects).
# Calibration: fixed seed, 200 iterations, median of 5 runs on this
# machine's CPU, idle (2026-08-21: 24.3, 25.2, 22.2, 20.9 across four
# idle measurements -> 23). Re-calibrate by running
# `python bench.py --engine oracle` on an idle machine and updating this
# constant; the live stderr value drifting >2x from it signals rot.
ORACLE_BASELINE_PROPOSALS_PER_S = 23.0

# ---------------------------------------------------------------------------
# Speed-of-light accounting for the headline shape (100 objs -> 128 padded
# lanes, 1024 chains, PARITY). Useful-flop counts per chain-step from the
# roofline table in docs/PERFORMANCE.md ("MFU / roofline accounting"):
# the XLA engine recomputes the full objective (~219K flops), the fused
# kernel carries incremental O(N) symmetry state (~46K flops). v5e VPU
# peak ~3.85 Tf32op/s/chip. The scoreboard reports
#   useful_flops_fraction = flops/chain-step * chains / (per_step_s * peak)
# for the winning engine, plus the gap to the best-known ALGORITHM's
# speed of light (incremental flops at peak) so the BASELINE "fused kernel
# at speed-of-light per chip" gate is a tracked number, not prose.
VPU_PEAK_F32 = 3.85e12
USEFUL_FLOPS_PER_CHAIN_STEP = {"xla": 219e3, "fused": 46e3}
ALGO_SOL_FLOPS = 46e3  # best-known algorithm (incremental symmetry)

_PROTO = "@MHBENCH "

# error signatures that mean "the backend/environment hiccuped, try a fresh
# process + claim" rather than "the code is wrong"
_TRANSIENT_PAT = (
    "FAILED_PRECONDITION",
    "UNAVAILABLE",
    "DEADLINE_EXCEEDED",
    "RESOURCE_EXHAUSTED",
    "INTERNAL:",
    "claim",
    "timed out",
    "timeout",
    "Socket closed",
    "transport",
    "connection",
    "TPU backend error",
    "tunnel",
)


def _is_transient(text: str) -> bool:
    low = text.lower()
    return any(p.lower() in low for p in _TRANSIENT_PAT)


# ---------------------------------------------------------------------------
# measurement helpers (run in CHILD processes only)


def _time_best(fn, repeats: int = 4) -> float:
    best = math.inf
    for _ in range(repeats):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def _per_step_linfit(run, lengths, repeats: int = 6) -> float:
    """Per-step seconds as the slope of min wall time over scan lengths.

    Strictly dominates two-point differencing under the tunnel's
    time-correlated per-call noise: three+ lengths expose any intercept
    misestimate as a residual instead of folding it into the slope
    (docs/PERFORMANCE.md, measurement-methodology corrections).
    """
    import numpy as np

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
    # floor guards the downstream division against a <= 0 slope in a
    # noise-dominated fit; it must sit far BELOW any real slope — the pi
    # kernel's per-SAMPLE slope is ~8e-12 s (an earlier 1e-9 floor
    # silently clamped it to a fake 1.0 Gsamples/s)
    return max(float(np.polyfit(xs, ys, 1)[0]), 1e-15)


def bench_oracle(n_objs: int = 100, iters: int = 200, repeats: int = 5) -> dict:
    """Reference-math MH loop (NumPy oracle) single-core proposals/s.

    Median of ``repeats`` timed runs (fixed seed) — the live counterpart
    of the pinned calibration constant.
    """
    import numpy as np

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "tests"))
    import oracle  # noqa: PLC0415

    from mh_tpu.models.scene import demo_scene  # noqa: PLC0415

    spec = demo_scene(n_objs)

    def one() -> float:
        pose = np.asarray(spec.positions, np.float64).copy()
        rng = np.random.default_rng(0)
        cur = oracle.breakdown(spec, pose, parity=True)["total"]
        t0 = time.perf_counter()
        for _ in range(iters):
            star = pose.copy()
            i = rng.integers(n_objs)
            star[i, 0:2] += rng.normal(size=2) * 10 / 16
            s = oracle.breakdown(spec, star, parity=True)["total"]
            if rng.random() < min(1.0, math.exp(min(2.0 * (s - cur), 0.0))):
                pose, cur = star, s
        return iters / (time.perf_counter() - t0)

    vals = sorted(one() for _ in range(repeats))
    return {
        "proposals_per_s": vals[len(vals) // 2],
        "pinned": ORACLE_BASELINE_PROPOSALS_PER_S,
    }


def bench_layout(n_objs: int, n_chains: int, iterations: int, n_moves: int = 1) -> dict:
    """Steady-state MH throughput (XLA engine) via a 3-length linearity fit."""
    import jax
    import numpy as np

    from mh_tpu.config import SamplerConfig  # noqa: PLC0415
    from mh_tpu.models.scene import demo_scene  # noqa: PLC0415
    from mh_tpu.sampler.mh import compile_chains  # noqa: PLC0415

    spec = demo_scene(n_objs)
    scene = spec.build()
    key = jax.random.key(0)
    pose0 = spec.initial_pose()
    # scene-specialized runner (production path for a fixed scene); the
    # iteration count is a runtime value, so one compile serves all three
    # linearity-fit lengths
    runner = compile_chains(
        scene,
        SamplerConfig(iterations=iterations, n_chains=n_chains,
                      n_moves_per_step=n_moves),
    )

    def run(iters):
        states, _ = runner(key, pose0, iterations=iters)
        # host pull forces real completion on axon (its block_until_ready
        # does not reliably block)
        np.asarray(states.pose)
        return states

    short = max(iterations // 10, 1)
    mid = max(iterations // 2, 2)
    per_step = _per_step_linfit(run, (short, mid, iterations))
    states = run(iterations)
    accept_rate = float(np.mean(np.asarray(states.accept_rate)))
    return {
        "proposals_per_s": n_moves * n_chains / per_step,
        "accepted_per_s": n_chains * accept_rate / per_step,
        "accept_rate": accept_rate,
        "per_step_ms": per_step * 1e3,
    }


def bench_fused(n_objs: int, n_chains: int, iterations: int = 2010,
                mode: str = "") -> dict:
    """Fused Pallas MH kernel throughput, 3-length linearity fit."""
    import numpy as np

    from mh_tpu.config import CostMode, SamplerConfig  # noqa: PLC0415
    from mh_tpu.kernels.fused_mh import run_chains_fused  # noqa: PLC0415
    from mh_tpu.models.scene import demo_scene  # noqa: PLC0415

    spec = demo_scene(n_objs)
    scene = spec.build()
    cfg = SamplerConfig(mode=CostMode[mode]) if mode else SamplerConfig()
    pose0 = spec.initial_pose()

    def run(iters):
        pose, _, acc, _ = run_chains_fused(0, pose0, scene, cfg, n_chains, iters)
        np.asarray(pose)
        return acc

    lengths = (10, iterations // 2 + 5, iterations)
    per_step = _per_step_linfit(run, lengths)
    acc = np.asarray(run(iterations))
    return {
        "proposals_per_s": n_chains / per_step,
        "per_step_ms": per_step * 1e3,
        "accepted_per_s": float(acc.mean()) / iterations * n_chains / per_step,
    }


def bench_pi(n_samples: int = 1 << 24) -> dict:
    import jax

    from mh_tpu.models.pi import estimate_pi  # noqa: PLC0415

    key = jax.random.key(0)

    def run():
        return float(estimate_pi(key, n_samples=n_samples))

    est = run()
    dt = _time_best(run)
    return {"samples_per_s": n_samples / dt, "pi_estimate": est, "wall_s": dt}


def bench_pi_fused(n_samples: int = 1 << 30) -> dict:
    """Fused pi kernel throughput as a linearity-fit slope over sample
    counts — the single-point wall-clock version swung 6x between rounds
    on the tunnel's per-call dispatch noise (2.5 vs 15.5 Gsamples/s for
    the same kernel); the slope cancels the fixed per-call overhead. One
    executable serves all lengths (runtime draw count)."""
    from mh_tpu.kernels.pi_kernel import estimate_pi_fused  # noqa: PLC0415

    def run(n):
        e, _ = estimate_pi_fused(0, n)
        return float(e)

    # fit lengths must rise ABOVE the dispatch noise: the kernel runs
    # ~130 Gsamples/s (direct timing r5: 2^33 in 0.090 s, 2^34 in
    # 0.156 s), so anything below ~2^32 is pure per-call jitter and the
    # slope degenerates to the 1e-9 floor. 2^34 is also the per-block
    # int32 hit-budget ceiling (grid * 2^31 total hits).
    lengths = (1 << 32, 1 << 33, 1 << 34)
    est = run(n_samples)
    per_sample = _per_step_linfit(run, lengths, repeats=6)
    return {
        "samples_per_s": 1.0 / per_sample,
        "pi_estimate": est,
        "fit_lengths": list(lengths),
    }


def bench_collective(n_objs: int, n_chains: int) -> dict:
    """Config 4: chains + collective psum acceptance adaptation (1 mesh)."""
    import jax
    import numpy as np

    from mh_tpu.config import SamplerConfig  # noqa: PLC0415
    from mh_tpu.models.scene import demo_scene  # noqa: PLC0415
    from mh_tpu.parallel.mesh import chain_mesh  # noqa: PLC0415
    from mh_tpu.parallel.sharded import run_chains_collective  # noqa: PLC0415

    spec = demo_scene(n_objs)
    scene = spec.build()
    pose0 = spec.initial_pose()
    key = jax.random.key(0)
    mesh = chain_mesh()
    cfg = SamplerConfig(iterations=0, n_chains=n_chains, adapt_rate=0.1)

    def run(rounds):
        states, rates, _ = run_chains_collective(
            key, pose0, scene, cfg, mesh, rounds=rounds, steps_per_round=10
        )
        np.asarray(states.pose)
        return rates

    rates = run(12)
    per_step = _per_step_linfit(run, (2, 7, 12), repeats=5) / 10.0
    return {
        "proposals_per_s": n_chains / per_step,
        "final_accept_rate": float(np.asarray(rates)[-1]),
    }


def bench_tempering_smc(n_objs: int = 32, n_replicas: int = 64) -> dict:
    """Config 5: parallel tempering + annealed SMC on the ambient mesh.

    On a single chip the mesh has one device (the boundary ppermute is a
    self-loop); the multi-device behavior is covered by the CPU virtual-mesh
    tests (tests/test_parallel.py) and scales over ICI unchanged.
    """
    import jax
    import numpy as np

    from mh_tpu.config import SamplerConfig  # noqa: PLC0415
    from mh_tpu.models.scene import demo_scene  # noqa: PLC0415
    from mh_tpu.parallel.mesh import chain_mesh  # noqa: PLC0415
    from mh_tpu.sampler.smc import run_smc  # noqa: PLC0415
    from mh_tpu.sampler.tempering import run_tempered  # noqa: PLC0415

    spec = demo_scene(n_objs)
    scene = spec.build()
    pose0 = spec.initial_pose()
    key = jax.random.key(0)
    mesh = chain_mesh()
    cfg = SamplerConfig()

    def run_t(rounds):
        states, swaps = run_tempered(
            key, pose0, scene, cfg, mesh, n_replicas,
            exchange_every=5, rounds=rounds,
        )
        np.asarray(states.pose)
        return swaps

    swaps = np.asarray(run_t(24))
    per_step = _per_step_linfit(run_t, (4, 14, 24), repeats=5) / 5.0

    def run_s():
        states, diag = run_smc(
            key, pose0, scene, cfg, mesh, n_replicas, n_stages=8, mutate_steps=5
        )
        np.asarray(states.pose)
        return diag

    diag = run_s()
    t_smc = _time_best(lambda: run_s(), repeats=2)
    return {
        "tempering_sweeps_per_s": n_replicas / per_step,
        "mean_swap_rate": float(swaps.mean()),
        "smc_wall_s": t_smc,
        "smc_log_evidence": float(np.asarray(diag["log_evidence"])),
    }


def bench_preflight() -> dict:
    """Tiny jitted op — proves the claim, compile path, and execution."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    t0 = time.perf_counter()
    x = jnp.full((128, 128), 2.0)
    y = jax.jit(lambda a: (a @ a).sum())(x)
    val = float(np.asarray(y))
    assert val == 128 * 128 * 128 * 4.0, val
    return {
        "platform": jax.devices()[0].platform,
        "devices": len(jax.devices()),
        "wall_s": time.perf_counter() - t0,
    }


# ---------------------------------------------------------------------------
# child entry


def _run_child(engine: str, args) -> None:
    """Run one measurement and print its result on a protocol line."""
    if os.environ.get("MH_BENCH_POISON_CHILD") == "1":
        raise RuntimeError(
            "FAILED_PRECONDITION: TPU backend error (poisoned for retry test)"
        )
    if engine == "oracle":
        # pure-NumPy measurement: never claim a TPU backend (both the env
        # var AND the config update are required — CLAUDE.md gotcha)
        os.environ["JAX_PLATFORMS"] = "cpu"
        import jax

        jax.config.update("jax_platforms", "cpu")
    else:
        # robust bring-up: fresh direct-provider claim with a bounded
        # timeout (no-op on CPU / non-axon machines)
        from mh_tpu.utils.axon_boot import ensure_robust_tpu

        ensure_robust_tpu()
        import jax

        jax.config.update("jax_compilation_cache_dir", "/tmp/mh_tpu_jax_cache")
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    if engine == "preflight":
        out = bench_preflight()
    elif engine == "oracle":
        out = bench_oracle(args.objects)
    elif engine == "xla_headline":
        out = bench_layout(args.objects, args.chains, args.iters)
    elif engine == "fused_headline":
        out = bench_fused(args.objects, args.chains)
    elif engine == "fused_256":
        out = bench_fused(256, args.chains, iterations=1010)
    elif engine == "fused_fixed":
        # FIXED semantics on the demo scene (w_offlimits == 0 — the
        # reference leaves it uninitialized, so this is the harness
        # scene's FIXED cost; a weighted-off-limits scene runs ~1.5x)
        out = bench_fused(args.objects, args.chains, mode="FIXED")
    elif engine == "pi":
        out = bench_pi()
    elif engine == "pi_fused":
        out = bench_pi_fused()
    elif engine == "layout_small":
        out = bench_layout(10, 1, 2000)
    elif engine == "layout_block":
        out = bench_layout(args.objects, min(args.chains, 256), 500, n_moves=64)
    elif engine == "collective":
        out = bench_collective(args.objects, 1024)
    elif engine == "tempering_smc":
        out = bench_tempering_smc()
    else:
        raise SystemExit(f"unknown engine {engine!r}")
    print(_PROTO + json.dumps(out), flush=True)


# ---------------------------------------------------------------------------
# parent orchestration


def _child_env() -> dict:
    """Environment for a child: manual (robust) axon bring-up, no pool
    redirect — each child claims its own fresh backend session."""
    env = dict(os.environ)
    if env.get("PALLAS_AXON_POOL_IPS"):
        env.pop("PALLAS_AXON_POOL_IPS", None)
        env["MH_TPU_MANUAL_AXON"] = "1"
        env.setdefault("AXON_POOL_SVC_OVERRIDE", "127.0.0.1")
        env.setdefault("AXON_LOOPBACK_RELAY", "1")
        env.setdefault("TPU_WORKER_HOSTNAMES", "localhost")
    env.pop("MH_BENCH_POISON", None)
    env.pop("MH_BENCH_POISON_CHILD", None)
    return env


class _Orchestrator:
    def __init__(self, args):
        self.args = args
        self.poison_left = int(os.environ.get("MH_BENCH_POISON", "0"))
        sleeps = os.environ.get("MH_BENCH_SLEEPS", "120,600")
        self.sleeps = [float(s) for s in sleeps.split(",") if s.strip()]
        self.deadline = time.monotonic() + float(
            os.environ.get("MH_BENCH_DEADLINE_S", "4200")
        )
        self.attempt_log: dict[str, int] = {}
        self.preflight_ok = False

    def _spawn(self, engine: str, timeout_s: float):
        env = _child_env()
        if self.poison_left > 0:
            self.poison_left -= 1
            env["MH_BENCH_POISON_CHILD"] = "1"
        cmd = [
            sys.executable, os.path.abspath(__file__), "--engine", engine,
            "--objects", str(self.args.objects),
            "--chains", str(self.args.chains),
            "--iters", str(self.args.iters),
        ]
        try:
            proc = subprocess.run(
                cmd, env=env, timeout=timeout_s,
                stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            )
        except subprocess.TimeoutExpired as e:
            return None, (
                f"timeout after {timeout_s:.0f}s"
                + (f"; stderr tail: {(e.stderr or '')[-300:]}" if e.stderr else "")
            )
        tail = "\n".join((proc.stderr or "").splitlines()[-8:])
        if proc.returncode != 0:
            return None, f"rc={proc.returncode}; stderr tail: {tail[-900:]}"
        for line in (proc.stdout or "").splitlines():
            if line.startswith(_PROTO):
                try:
                    return json.loads(line[len(_PROTO):]), None
                except json.JSONDecodeError as e:
                    return None, f"bad protocol line: {e}"
        return None, f"no protocol line; stderr tail: {tail[-900:]}"

    def _heal(self, attempt: int) -> None:
        """Backoff, then gate on a preflight before the next attempt.

        The r03 wedge cleared in ~20 min on its own; a fresh subprocess +
        fresh claim session is the re-registration half of self-healing,
        the sleep is the other half.
        """
        idx = min(attempt, len(self.sleeps) - 1)
        delay = self.sleeps[idx] if self.sleeps else 0.0
        remaining = self.deadline - time.monotonic()
        delay = max(0.0, min(delay, remaining - 60.0))
        if delay:
            print(f"# healing: sleeping {delay:.0f}s before retry", file=sys.stderr)
            time.sleep(delay)
        out, err = self._spawn("preflight", 420)
        if out is not None:
            print(f"# preflight after heal: {json.dumps(out)}", file=sys.stderr)
        else:
            print(f"# preflight after heal FAILED: {err}", file=sys.stderr)

    def run_engine(self, engine: str, timeout_s: float = 1500,
                   attempts: int = 3):
        """Measure one engine, retrying transient failures in fresh
        processes. Returns the result dict or None."""
        for attempt in range(attempts):
            self.attempt_log[engine] = attempt + 1
            out, err = self._spawn(engine, timeout_s)
            if out is not None:
                print(f"# {engine}: {json.dumps(out)}", file=sys.stderr)
                return out
            print(f"# {engine} attempt {attempt + 1} FAILED: {err}",
                  file=sys.stderr)
            if time.monotonic() > self.deadline:
                print(f"# {engine}: deadline exhausted, giving up",
                      file=sys.stderr)
                return None
            if not _is_transient(err):
                print(f"# {engine}: failure looks like a code bug, one "
                      f"immediate retry only", file=sys.stderr)
                if attempt >= 1:
                    return None
                continue
            if attempt < attempts - 1:
                self._heal(attempt)
        return None


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--all", action="store_true", help="run all BASELINE configs")
    ap.add_argument("--engine", help="child mode: run ONE measurement")
    ap.add_argument("--fused-probe", action="store_true",
                    help="measure only the fused kernel; one JSON line to stdout")
    ap.add_argument("--objects", type=int, default=100)
    ap.add_argument("--chains", type=int, default=1024)
    ap.add_argument("--iters", type=int, default=1000)
    args = ap.parse_args()

    if args.engine:
        _run_child(args.engine, args)
        return

    if args.fused_probe:
        # legacy probe: direct in-process measurement (A/B experimentation)
        from mh_tpu.utils.axon_boot import ensure_robust_tpu

        ensure_robust_tpu()
        print(json.dumps(bench_fused(args.objects, args.chains)))
        return

    orch = _Orchestrator(args)
    on_cpu = os.environ.get("JAX_PLATFORMS", "").startswith("cpu")

    pre = orch.run_engine("preflight", timeout_s=420)
    if pre is None:
        print("# preflight never passed; attempting measurements anyway",
              file=sys.stderr)

    if args.all:
        # configs 2/4/5 (layout_small, collective, tempering_smc) and the
        # fused pi kernel run on the DEFAULT path below (round-5); --all
        # only adds the XLA pi estimator and the K=64 block-proposal run
        for eng in ("pi", "layout_block"):
            orch.run_engine(eng)

    head = orch.run_engine("xla_headline")
    extras: dict = {}
    if not on_cpu:
        fused = orch.run_engine("fused_headline")
        if fused:
            extras["fused_proposals_per_s"] = round(fused["proposals_per_s"], 1)
            if head:
                extras["xla_proposals_per_s"] = round(head["proposals_per_s"], 1)
            if head is None or fused["proposals_per_s"] > head["proposals_per_s"]:
                head = dict(head or {}, **fused, engine="fused")
            else:
                head = dict(head, engine="xla")
        elif head:
            head = dict(head, engine="xla")
        # secondary metrics: the fused kernel's large-N advantage and the
        # pi kernel — visible on the driver scoreboard, not only RESULTS.md
        f256 = orch.run_engine("fused_256")
        if f256:
            extras["fused_256obj_proposals_per_s"] = round(
                f256["proposals_per_s"], 1
            )
        ffx = orch.run_engine("fused_fixed")
        if ffx:
            extras["fused_fixed_proposals_per_s"] = round(
                ffx["proposals_per_s"], 1
            )
        pif = orch.run_engine("pi_fused", timeout_s=900)
        if pif:
            extras["pi_fused_samples_per_s"] = round(pif["samples_per_s"], 0)
    elif head:
        head = dict(head, engine="xla")

    # BASELINE measurement configs 2, 4 and 5 — on the default scoreboard
    # path (round-5; BENCH_r01-r04 carried configs 1+3 only because these
    # ran under --all alone). Bounded timeouts, 2 attempts each; failures
    # cost their keys, never the headline.
    small = orch.run_engine("layout_small", timeout_s=900, attempts=2)
    if small:
        extras["single_chain_10obj_proposals_per_s"] = round(
            small["proposals_per_s"], 1
        )
    coll = orch.run_engine("collective", timeout_s=1200, attempts=2)
    if coll:
        extras["collective_1024_proposals_per_s"] = round(
            coll["proposals_per_s"], 1
        )
        extras["collective_final_accept_rate"] = round(
            coll["final_accept_rate"], 4
        )
    tsmc = orch.run_engine("tempering_smc", timeout_s=1200, attempts=2)
    if tsmc:
        extras["tempering_smc_sweeps_per_s"] = round(
            tsmc["tempering_sweeps_per_s"], 1
        )
        extras["tempering_mean_swap_rate"] = round(tsmc["mean_swap_rate"], 4)

    if head is None:
        raise SystemExit("no engine produced a headline measurement")

    # live oracle sanity check (CPU subprocess; non-fatal)
    base = ORACLE_BASELINE_PROPOSALS_PER_S
    live = orch.run_engine("oracle", timeout_s=420, attempts=1)
    if live:
        drift = live["proposals_per_s"] / base
        print(
            f"# oracle live: {live['proposals_per_s']:.1f} proposals/s "
            f"(pinned {base}, drift x{drift:.2f})", file=sys.stderr,
        )

    # speed-of-light accounting (headline shape only — the flop constants
    # are per-chain-step at 128 padded lanes; see module docstring consts)
    sol: dict = {}
    if args.objects == 100 and head.get("per_step_ms"):
        eng = head.get("engine", "xla")
        per_step_s = head["per_step_ms"] / 1e3
        flops = USEFUL_FLOPS_PER_CHAIN_STEP.get(eng)
        if flops:
            sol["useful_flops_fraction"] = round(
                flops * args.chains / (per_step_s * VPU_PEAK_F32), 4
            )
        algo_sol_ms = ALGO_SOL_FLOPS * args.chains / VPU_PEAK_F32 * 1e3
        sol["algo_sol_per_step_ms"] = round(algo_sol_ms, 4)
        sol["vs_algo_sol"] = round(head["per_step_ms"] / algo_sol_ms, 2)

    result = {
        "metric": f"mh_proposals_per_s_per_chip_{args.objects}obj_{args.chains}chains",
        "value": round(head["proposals_per_s"], 1),
        "unit": "proposals/s",
        "vs_baseline": round(head["proposals_per_s"] / base, 2),
        "engine": head.get("engine", "xla"),
        "per_step_ms": round(head.get("per_step_ms", 0.0), 4),
        "accepted_per_s": round(head.get("accepted_per_s", 0.0), 1),
        **sol,
        **extras,
        "attempts": orch.attempt_log,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
