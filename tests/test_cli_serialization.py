"""Scene JSON round-trip + CLI commands end-to-end (in-process)."""

import json

import numpy as np

from mh_tpu.cli import main
from mh_tpu.config import CostMode
from mh_tpu.models.scene import demo_scene
from mh_tpu.ops.costs import cost_terms
from mh_tpu.utils.serialization import (
    load_scene,
    sampler_config_from_dict,
    save_scene,
    scene_from_dict,
    scene_to_dict,
)


def test_scene_json_roundtrip(tmp_path):
    spec = demo_scene(12)
    path = str(tmp_path / "scene.json")
    save_scene(path, spec)
    back = load_scene(path)
    # identical costs <=> identical scene semantics
    a = cost_terms(spec.initial_pose(), spec.build(), CostMode.PARITY)
    b = cost_terms(back.initial_pose(), back.build(), CostMode.PARITY)
    np.testing.assert_allclose(np.asarray(a.as_vector()), np.asarray(b.as_vector()))


def test_scene_dict_rejects_bad_schema():
    d = scene_to_dict(demo_scene(4))
    d["schema_version"] = 99
    try:
        scene_from_dict(d)
        raise AssertionError("expected ValueError")
    except ValueError:
        pass


def test_sampler_config_from_dict():
    cfg = sampler_config_from_dict({"iterations": 7, "n_chains": 3, "mode": "fixed"})
    assert cfg.iterations == 7
    assert cfg.n_chains == 3
    assert cfg.mode is CostMode.FIXED


def test_cli_suggest_writes_results(tmp_path, capsys):
    out = str(tmp_path / "res.json")
    rc = main(
        ["suggest", "--objects", "8", "--chains", "2", "--iters", "10", "--out", out]
    )
    assert rc == 0
    data = json.loads(open(out).read())
    assert np.asarray(data["points"]).shape == (2, 8, 6)
    assert len(data["costs"]["total"]) == 2
    assert all(r > 0 for r in data["accept_rate"])


def test_cli_suggest_from_scene_file(tmp_path):
    scene_path = str(tmp_path / "scene.json")
    save_scene(scene_path, demo_scene(6))
    out = str(tmp_path / "res.json")
    rc = main(
        ["suggest", "--scene", scene_path, "--chains", "1", "--iters", "5",
         "--out", out, "--mode", "fixed"]
    )
    assert rc == 0
    assert np.asarray(json.loads(open(out).read())["points"]).shape == (1, 6, 6)


def test_cli_pi_and_devices(capsys):
    assert main(["pi", "--samples", str(1 << 16)]) == 0
    assert "pi ~=" in capsys.readouterr().out
    assert main(["devices"]) == 0
    assert "devices" in capsys.readouterr().out


def test_cli_temper_and_smc(capsys):
    import json as _json

    rc = main([
        "temper", "--objects", "6", "--replicas", "8", "--rounds", "4",
        "--iters", "0", "--adapt-ladder",
    ])
    assert rc == 0
    out = _json.loads(capsys.readouterr().out)
    assert len(out["swap_rates"]) == 4
    assert len(out["betas"]) == 8
    assert out["betas"][-1] == 2.0

    rc = main([
        "smc", "--objects", "6", "--particles", "8", "--stages", "3",
        "--mutate-steps", "1", "--adaptive", "--init", "prior",
        "--iters", "0",
    ])
    assert rc == 0
    out = _json.loads(capsys.readouterr().out)
    assert len(out["betas"]) == 3
    assert all(r in (0, 1) for r in out["resampled"])
