"""Python side of the native C ABI (see wire.h / kernel_wrapper.cpp).

Decodes the 8-byte-aligned wire structs with NumPy structured dtypes,
builds a :class:`SceneSpec`, runs the sampler, and returns one flat f64
byte buffer: points | cost breakdowns | accept rates.
"""

from __future__ import annotations

import numpy as np

POSE_DT = np.dtype(
    [
        ("x", "<f8"), ("y", "<f8"), ("z", "<f8"),
        ("rot_x", "<f8"), ("rot_y", "<f8"), ("rot_z", "<f8"),
        ("length", "<f8"), ("width", "<f8"),
        ("frozen", "<i8"),
    ]
)
REL_DT = np.dtype(
    [
        ("range_start", "<f8"), ("range_end", "<f8"),
        ("degrees_of_attraction", "<f8"),
        ("source_index", "<i8"), ("target_index", "<i8"),
    ]
)
ANG_DT = np.dtype(
    [
        ("angle_min", "<f8"), ("angle_max", "<f8"),
        ("source_index", "<i8"), ("target_index", "<i8"),
    ]
)
RECT_DT = np.dtype([("quad", "<f8", (8,)), ("source_index", "<i8")])
SURFACE_DT = np.dtype(
    [
        ("n_objs", "<i8"), ("n_relationships", "<i8"),
        ("n_angle_relationships", "<i8"), ("n_clearances", "<i8"),
        ("w_focal_point", "<f8"), ("w_pair_wise", "<f8"),
        ("w_visual_balance", "<f8"), ("w_symmetry", "<f8"),
        ("w_off_limits", "<f8"), ("w_clearance", "<f8"),
        ("w_surface_area", "<f8"),
        ("centroid_x", "<f8"), ("centroid_y", "<f8"),
        ("focal_x", "<f8"), ("focal_y", "<f8"), ("focal_rot", "<f8"),
        ("surface_quad", "<f8", (8,)),
    ]
)
CONFIG_DT = np.dtype(
    [
        ("n_chains", "<i8"), ("iterations", "<i8"), ("moves_per_step", "<i8"),
        ("accept_draws", "<i8"),
        ("parity_mode", "<i8"), ("seed", "<i8"), ("beta", "<f8"),
    ]
)


def run_wire(surface_b, rels_b, angs_b, poses_b, clr_b, off_b, cfg_b) -> bytes:
    from mh_tpu.api import suggest_layouts
    from mh_tpu.config import REF_BETA, CostMode, SamplerConfig
    from mh_tpu.models.scene import SceneSpec

    srf = np.frombuffer(surface_b, SURFACE_DT)[0]
    cfg = np.frombuffer(cfg_b, CONFIG_DT)[0]
    poses = np.frombuffer(poses_b, POSE_DT)
    rels = np.frombuffer(rels_b, REL_DT)
    angs = np.frombuffer(angs_b, ANG_DT)
    clrs = np.frombuffer(clr_b, RECT_DT)
    offs = np.frombuffer(off_b, RECT_DT)

    n = int(srf["n_objs"])
    positions = np.zeros((n, 6))
    for j, f in enumerate(["x", "y", "z", "rot_x", "rot_y", "rot_z"]):
        positions[:, j] = poses[f][:n]

    spec = SceneSpec(
        positions=positions,
        sizes=np.stack([poses["length"][:n], poses["width"][:n]], axis=1),
        frozen=poses["frozen"][:n] != 0,
        offlimit_quads=offs["quad"][:n].reshape(n, 4, 2),
        surface_quad=np.asarray(srf["surface_quad"]).reshape(4, 2),
        centroid=(float(srf["centroid_x"]), float(srf["centroid_y"])),
        focal=(float(srf["focal_x"]), float(srf["focal_y"])),
        focal_rot=float(srf["focal_rot"]),
        w_pairwise=float(srf["w_pair_wise"]),
        w_visual_balance=float(srf["w_visual_balance"]),
        w_focal=float(srf["w_focal_point"]),
        w_symmetry=float(srf["w_symmetry"]),
        w_clearance=float(srf["w_clearance"]),
        w_offlimits=float(srf["w_off_limits"]),
        w_surface_area=float(srf["w_surface_area"]),
        relationships=[
            (int(r["source_index"]), int(r["target_index"]),
             float(r["range_start"]), float(r["range_end"]))
            for r in rels
        ],
        angle_relationships=[
            (int(a["source_index"]), int(a["target_index"]),
             float(a["angle_min"]), float(a["angle_max"]))
            for a in angs
        ],
        clearances=[
            (np.asarray(c["quad"]).reshape(4, 2), int(c["source_index"]))
            for c in clrs
        ],
    )

    sampler_cfg = SamplerConfig(
        iterations=int(cfg["iterations"]),
        n_chains=int(cfg["n_chains"]),
        n_moves_per_step=max(int(cfg["moves_per_step"]), 1),
        accept_draws=max(int(cfg["accept_draws"]), 1),
        beta=float(cfg["beta"]) if float(cfg["beta"]) > 0 else REF_BETA,
        mode=CostMode.PARITY if int(cfg["parity_mode"]) else CostMode.FIXED,
    )
    res = suggest_layouts(spec, sampler_cfg, key=int(cfg["seed"]))

    points = np.asarray(res.points, np.float64).reshape(-1)
    costs = np.asarray(res.costs, np.float64).reshape(-1)
    accept = np.asarray(res.accept_rate, np.float64).reshape(-1)
    return points.tobytes() + costs.tobytes() + accept.tobytes()


def device_report() -> str:
    from mh_tpu.parallel.mesh import device_report as rep

    return rep()
