"""The benchmark orchestrator must survive transient backend failures.

Rounds 2 and 3 both produced `parsed=null` driver benches because a single
in-process failure (VMEM OOM, wedged backend) erased every measurement.
The round-4 harness runs each measurement in a fresh subprocess and
retries transient failures; these tests poison the first child invocations
(`MH_BENCH_POISON`) and assert the final JSON line still appears.

Runs fully on CPU (children inherit ``JAX_PLATFORMS=cpu``), tiny shapes.
"""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BENCH = os.path.join(REPO, "bench.py")


def _run_bench(extra_env, args=()):
    env = dict(os.environ)
    env.update(
        {
            "JAX_PLATFORMS": "cpu",
            "MH_BENCH_SLEEPS": "0",
            "MH_BENCH_DEADLINE_S": "600",
        }
    )
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env.update(extra_env)
    return subprocess.run(
        [sys.executable, BENCH, "--objects", "8", "--chains", "8",
         "--iters", "30", *args],
        env=env, timeout=900, text=True,
        stdout=subprocess.PIPE, stderr=subprocess.PIPE,
    )


def _final_json(proc):
    lines = [l for l in proc.stdout.splitlines() if l.startswith("{")]
    assert lines, f"no JSON line.\nstdout={proc.stdout}\nstderr={proc.stderr}"
    return json.loads(lines[-1])


def test_bench_emits_json_despite_poisoned_first_attempts():
    """Poison the first two child spawns (synthetic FAILED_PRECONDITION):
    the retry loop must re-spawn and the driver line must still appear."""
    proc = _run_bench({"MH_BENCH_POISON": "2"})
    assert proc.returncode == 0, proc.stderr[-2000:]
    out = _final_json(proc)
    assert out["metric"] == "mh_proposals_per_s_per_chip_8obj_8chains"
    assert out["value"] > 0
    assert out["unit"] == "proposals/s"
    assert out["vs_baseline"] > 0
    # the poisoned preflight must have consumed at least one retry
    assert out["attempts"]["preflight"] >= 2
    assert "FAILED_PRECONDITION" in proc.stderr


def test_bench_clean_run_single_attempts():
    proc = _run_bench({})
    assert proc.returncode == 0, proc.stderr[-2000:]
    out = _final_json(proc)
    assert out["value"] > 0
    assert out["attempts"]["xla_headline"] == 1
    assert out["engine"] == "xla"


def test_transient_classifier():
    sys.path.insert(0, REPO)
    import bench

    assert bench._is_transient("FAILED_PRECONDITION: TPU backend error")
    assert bench._is_transient("timeout after 1500s")
    assert bench._is_transient("the claim path is wedged")
    assert not bench._is_transient("TypeError: got an unexpected keyword")
