"""Structured run-logging subsystem (SURVEY.md §5 observability).

The reference's only instrumentation is commented-out printf; the round-3
verdict asked for a machine-parseable JSONL event stream wired into the
API and CLI. Pinned here: event shapes, CLI wiring, and the bitwise
identity of the chunked (per-round-logged) run with the one-shot run.
"""

import io
import json

import numpy as np

from mh_tpu.api import suggest_layouts
from mh_tpu.config import SamplerConfig
from mh_tpu.models.scene import demo_scene
from mh_tpu.utils.runlog import RunLogger


def _events(path):
    with open(path) as f:
        return [json.loads(line) for line in f if line.strip()]


def test_cli_demo_log_jsonl(tmp_path, capsys):
    from mh_tpu.cli import main

    log = tmp_path / "run.jsonl"
    rc = main([
        "demo", "--objects", "8", "--chains", "4", "--iters", "20",
        "--log", str(log),
    ])
    assert rc == 0
    evs = _events(log)
    kinds = [e["event"] for e in evs]
    assert kinds[0] == "run_config"
    assert kinds[-1] == "result"
    rounds = [e for e in evs if e["event"] == "round"]
    assert len(rounds) == 10  # iters/10 default cadence -> 10 rounds of 2
    assert [r["step"] for r in rounds] == [2 * (i + 1) for i in range(10)]
    for r in rounds:
        assert 0.0 <= r["accept_rate"]["min"] <= r["accept_rate"]["max"] <= 1.0
        assert r["cost_total"]["p10"] <= r["cost_total"]["p50"] <= r["cost_total"]["p90"]
    cfg = evs[0]
    assert cfg["n_objs"] == 8 and cfg["n_chains"] == 4
    assert cfg["config"]["iterations"] == 20
    assert all("ts" in e for e in evs)


def test_chunked_logged_run_bitwise_equals_one_shot(tmp_path):
    spec = demo_scene(8)
    cfg = SamplerConfig(iterations=30, n_chains=4)
    plain = suggest_layouts(spec, cfg, key=3, engine="xla")
    log = tmp_path / "r.jsonl"
    logged = suggest_layouts(
        spec, cfg, key=3, engine="xla", log=str(log), log_every=7
    )
    np.testing.assert_array_equal(plain.points, logged.points)
    np.testing.assert_array_equal(plain.costs, logged.costs)
    rounds = [e for e in _events(log) if e["event"] == "round"]
    assert [r["step"] for r in rounds] == [7, 14, 21, 28, 30]


def test_logger_accepts_file_like_and_closes_only_owned():
    buf = io.StringIO()
    lg = RunLogger(buf)
    lg.event("run_config", engine="xla")
    lg.close()
    assert json.loads(buf.getvalue())["engine"] == "xla"  # not closed

    spec = demo_scene(8)
    cfg = SamplerConfig(iterations=4, n_chains=2)
    suggest_layouts(spec, cfg, log=lg)  # RunLogger passed in: caller owns
    lines = buf.getvalue().splitlines()
    assert json.loads(lines[-1])["event"] == "result"


def test_checkpoint_events(tmp_path):
    import jax

    from mh_tpu.sampler.mh import run_chains
    from mh_tpu.utils.checkpoint import restore_state, save_state

    spec = demo_scene(8)
    scene = spec.build()
    cfg = SamplerConfig(iterations=5, n_chains=2)
    states, _ = run_chains(jax.random.key(0), spec.initial_pose(), scene, cfg)
    buf = io.StringIO()
    lg = RunLogger(buf)
    ckpt = str(tmp_path / "ck")
    save_state(ckpt, states, log=lg)
    restore_state(ckpt, states, log=lg)
    evs = [json.loads(l) for l in buf.getvalue().splitlines()]
    assert [e["op"] for e in evs] == ["save", "restore"]
    assert evs[0]["step"] == 5
