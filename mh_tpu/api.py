"""Public API: scene in -> layout suggestions + real cost breakdowns out.

The TPU-native equivalent of the reference's exported ``KernelWrapper`` C ABI
(SURVEY.md C9, ``Kernel.cu:873-984``): the caller hands over a scene and a
launch config, gets back one suggested layout per chain. Two fixes over the
reference by design:

- per-suggestion cost breakdowns are *real* (the reference's device
  writeback is commented out, ``Kernel.cu:852-861``, so its ``resultCosts``
  are garbage);
- nothing leaks (the reference frees only 5 of its 12 device buffers,
  ``Kernel.cu:963-967``) — JAX owns all buffers.
"""

from __future__ import annotations

import dataclasses

import jax
import numpy as np

from mh_tpu.config import SamplerConfig
from mh_tpu.models.scene import Scene, SceneSpec
from mh_tpu.sampler.mh import compile_chains, run_chains

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class LayoutResult:
    """One suggestion per chain (replaces ``result``/``point``, Kernel.cu:129-149)."""

    points: np.ndarray  # f32[n_chains, n_objs, 6] — (x,y,z,rotX,rotY,rotZ)
    costs: np.ndarray  # f32[n_chains, 8] — (total, pairwise, visual, focal,
    #                     symmetry, clearance, offlimits, surface), real values
    accept_rate: np.ndarray  # f32[n_chains]
    step_scale: np.ndarray  # f32[n_chains] — final adapted step-size scale

    COST_FIELDS = (
        "total",
        "pair_wise",
        "visual_balance",
        "focal_point",
        "symmetry",
        "clearance",
        "off_limits",
        "surface_area",
    )


def suggest_layouts(
    scene: Scene | SceneSpec,
    cfg: SamplerConfig,
    key: Array | int = 0,
    pose0: Array | None = None,
    engine: str = "auto",
    mesh=None,
    serve: bool = False,
    objs_devices: int | None = None,
    log=None,
    log_every: int = 0,
) -> LayoutResult:
    """Run ``cfg.n_chains`` MH chains and return their final layouts.

    Accepts either a built :class:`Scene` (with ``pose0``) or a
    :class:`SceneSpec` (initial poses taken from the spec, like the
    reference's input ``cfg`` array).

    ``engine``:

    - ``"auto"`` (default): picks per scene from measured crossovers —
      the Pallas fused kernel on TPU above ``FUSED_CROSSOVER`` padded
      objects (its incremental-symmetry update is O(N) per step vs the
      scan's O(N^2)), the generic XLA scan otherwise. With
      ``serve=True`` (the scene will be sampled repeatedly, so a
      per-scene compile amortizes) auto instead serves
      ``xla_specialized`` up to ``SERVE_CROSSOVER`` padded objects —
      the fastest engine in that regime — and the fused kernel beyond.
      Both constants are re-measured each round (docs/API.md table).
    - ``"xla"``: the fused-by-XLA ``lax.scan`` (any backend).
    - ``"xla_specialized"``: the XLA scan compiled with the scene embedded
      as constants — ~20% faster steady-state, one fresh compile per
      scene (bitwise-identical results to ``"xla"``). Use when serving
      one scene repeatedly.
    - ``"fused"``: the Pallas VMEM-resident kernel (TPU only;
      statistically equivalent but different random stream).

    ``mesh``: a ``jax.sharding.Mesh`` with a chains axis to shard the
    chains over (XLA scan or fused engine). Defaults to the ambient mesh
    over all visible devices whenever more than one device is present and
    ``cfg.n_chains`` divides evenly — chains are device-count invariant
    (XLA: keys fold from global chain ids; fused: the counter-based
    kernel stream is keyed by global chain id), so results are bitwise
    identical to the single-device path.

    ``objs_devices``: shard the O(N^2) objective *within* each chain over
    this many devices (huge-scene model parallelism — the answer to the
    reference's N^2 scaling complaint, ``Readme.md:6``; the symmetry /
    off-limits matrices ``Kernel.cu:283-318,485-514`` are row-sharded and
    psum-reduced over ICI each step). Builds a 2-D (chains x objs) mesh
    from the visible devices; pass a 2-D ``mesh`` (with chains and objs
    axes) instead for explicit placement. Implies the XLA engine.

    ``log``: a file path / file-like / :class:`~mh_tpu.utils.runlog.RunLogger`
    — emits a structured JSONL event stream (``run_config`` + ``result``;
    SURVEY.md §5 observability). With ``log_every > 0`` and the plain
    unsharded ``"xla"`` engine, the run additionally executes in
    ``log_every``-step rounds (bitwise-identical to one shot — the resume
    path is exact) and emits per-round ``round`` events: accept-rate,
    step-scale, and cost-quantile statistics.
    """
    from mh_tpu.utils.runlog import RunLogger, as_logger

    logger = as_logger(log)
    try:
        res, engine_used = _dispatch_layouts(
            scene, cfg, key, pose0, engine, mesh, serve, objs_devices,
            logger, log_every,
        )
        if logger is not None:
            logger.log_result(res, engine=engine_used)
        return res
    finally:
        if logger is not None and not isinstance(log, RunLogger):
            logger.close()


def _dispatch_layouts(
    scene, cfg, key, pose0, engine, mesh, serve, objs_devices, logger,
    log_every,
) -> tuple[LayoutResult, str]:
    if isinstance(scene, SceneSpec):
        spec = scene
        scene = spec.build()
        if pose0 is None:
            pose0 = spec.initial_pose()
    if pose0 is None:
        raise ValueError("pose0 is required when passing a built Scene")

    def log_cfg(eng: str) -> None:
        if logger is not None:
            logger.log_config(
                cfg, engine=eng,
                n_objs=int(np.sum(np.asarray(scene.obj_mask) > 0)),
                n_chains=cfg.n_chains,
            )

    # 2-D (chains x objs) dispatch: either requested by count or implied by
    # a mesh that carries the objs axis
    from mh_tpu.parallel.objshard import OBJS_AXIS

    if mesh is not None and OBJS_AXIS in mesh.shape and mesh.shape[OBJS_AXIS] > 1:
        log_cfg("xla_objsharded")
        return _run_objsharded(scene, cfg, key, pose0, mesh, engine), "xla_objsharded"
    if objs_devices and objs_devices > 1:
        from mh_tpu.parallel.objshard import chain_obj_mesh

        n_dev = jax.device_count()
        if mesh is not None:
            raise ValueError("pass either objs_devices or a 2-D mesh, not both")
        if n_dev % objs_devices:
            raise ValueError(
                f"objs_devices={objs_devices} does not divide the "
                f"{n_dev} visible devices"
            )
        mesh2d = chain_obj_mesh(n_dev // objs_devices, objs_devices)
        log_cfg("xla_objsharded")
        return _run_objsharded(scene, cfg, key, pose0, mesh2d, engine), "xla_objsharded"

    # the fused kernel supports compound block proposals (n_moves_per_step
    # sequential moves per accept, like the reference's blockxDim threads)
    # and per-chain Robbins-Monro step-size adaptation in-kernel
    auto_chosen = False
    if engine == "auto":
        n_dev = jax.device_count() if mesh is None else int(
            np.prod(list(mesh.shape.values()))
        )
        engine = auto_engine(
            on_tpu=jax.default_backend() in ("tpu", "axon"),
            serve=serve,
            n_pad_objs=scene.n_pad_objs,
            n_chains=cfg.n_chains,
            n_dev=n_dev,
            explicit_mesh=mesh is not None,
            shared_pose0=np.ndim(pose0) == 2,
        )
        auto_chosen = True

    if engine == "fused":
        try:
            log_cfg("fused")
            return _run_fused(scene, cfg, key, pose0, mesh), "fused"
        except Exception:  # noqa: BLE001 — auto never crashes the caller
            # the fused runner already retries scoped-VMEM OOMs internally
            # (shrinking its chain block); anything that still escapes only
            # downgrades an auto choice — an explicit engine="fused" raises
            if not auto_chosen:
                raise
            import warnings

            warnings.warn(
                "auto-selected fused kernel failed; falling back to the "
                "XLA engine",
                stacklevel=2,
            )
            engine = "xla"
    if engine not in ("xla", "xla_specialized"):
        raise ValueError(
            f"unknown engine {engine!r} (use 'xla', 'xla_specialized' or 'fused')"
        )
    log_cfg(engine)
    if logger is not None and log_every > 0 and engine == "xla" and mesh is None:
        # per-round logging runs the unsharded chain runner in
        # ``log_every``-step rounds — results are bitwise identical to the
        # one-shot (and to the sharded) path: chains are device-count
        # invariant and the resume fold is exact (test_recovery.py)
        return _run_xla_logged(scene, cfg, key, pose0, logger, log_every), engine
    return _run_xla(scene, cfg, key, pose0, engine, mesh), engine


def auto_engine(
    *,
    on_tpu: bool,
    serve: bool,
    n_pad_objs: int,
    n_chains: int,
    n_dev: int,
    explicit_mesh: bool,
    shared_pose0: bool,
) -> str:
    """The ``engine="auto"`` decision, as a pure function of the context.

    Two measured crossovers (linearity-fit slopes, v5e, 1024 chains;
    docs/API.md "Engine crossover" table — re-derived each round):

    - vs the UNSPECIALIZED ``run_chains`` scan (what auto uses for
      one-shot calls): the fused Pallas kernel wins above
      ``FUSED_CROSSOVER`` padded objects (its incremental-symmetry update
      is O(N) per step vs the scan's O(N^2)).
    - vs the SPECIALIZED scan (scene baked in as constants; one fresh
      compile per scene): specialized stays faster until
      ``SERVE_CROSSOVER`` padded objects. ``serve=True`` declares the
      scene will be sampled repeatedly, making the per-scene compile
      worth it — auto then serves xla_specialized below the crossover.

    Device counts: every returned engine serves any ``n_dev`` (the fused
    kernel runs sharded over the chains axis — scene replicated, streams
    keyed by global chain id, device-count invariant) as long as the
    chains split evenly from one shared pose0; otherwise auto falls back
    to the generic scan, which handles every configuration.
    """
    chains_fit = n_chains % 8 == 0
    single_dev = not explicit_mesh and n_dev == 1
    multi_ok = n_chains % max(n_dev, 1) == 0 and shared_pose0
    fused_ok = on_tpu and chains_fit and (single_dev or multi_ok)
    if serve and single_dev and n_pad_objs <= SERVE_CROSSOVER:
        return "xla_specialized"
    if fused_ok and n_pad_objs > (SERVE_CROSSOVER if serve else FUSED_CROSSOVER):
        return "fused"
    return "xla"


# Measured engine crossovers in padded object lanes (docs/API.md "Engine
# crossover" table; round-5 thin-engine linearity fits, v5e, 1024 chains,
# 2026-08-21). The thin fused kernel is ~flat at 0.074-0.082 ms/step up to
# one object tile while the scans grow ~N^2: generic 0.062@64objs /
# 0.076@80 / 0.116@100, specialized 0.038@64 / 0.089@100 — so fused now
# wins vs the generic scan from ~84 objects (88 padded lanes) and vs the
# scene-specialized scan from ~93 objects (96 lanes). PARITY numbers;
# FIXED tracks them: with w_offlimits == 0 both engines statically skip
# the off-limits machinery (fused 0.072 vs scan 0.086 on the demo), and
# with a weighted term they tie at 100 objs (0.1222 vs 0.1197 — tunnel
# noise) — one mode-agnostic threshold serves both.
FUSED_CROSSOVER = 88
SERVE_CROSSOVER = 96


def _run_objsharded(scene, cfg, key, pose0, mesh2d, engine) -> LayoutResult:
    """Huge-scene 2-D (chains x objs) mesh dispatch (model parallelism)."""
    if engine not in ("auto", "xla"):
        raise ValueError(
            f"objs-sharded sampling uses the XLA engine (got {engine!r})"
        )
    if np.ndim(pose0) != 2:
        raise ValueError("objs-sharded sampling needs one shared pose0 f32[N,6]")
    from mh_tpu.parallel.objshard import run_chains_objsharded

    if isinstance(key, int):
        key = jax.random.key(key)
    state = run_chains_objsharded(key, pose0, scene, cfg, mesh2d)
    return _result_from_state(scene, state)


def _run_fused(scene, cfg, key, pose0, mesh) -> LayoutResult:
    """Dispatch to the fused Pallas kernel (sharded when >1 device)."""
    seed = key if isinstance(key, int) else 0
    # off-TPU the kernel runs under the Pallas interpreter with its
    # software counter-based PRNG (no hardware prng_* lowering there)
    interp = jax.default_backend() not in ("tpu", "axon")
    if mesh is None and jax.device_count() > 1 and (
        cfg.n_chains % jax.device_count() == 0 and np.ndim(pose0) == 2
    ):
        from mh_tpu.parallel.mesh import chain_mesh

        mesh = chain_mesh()
    if mesh is not None:
        from mh_tpu.kernels.fused_mh import run_chains_fused_sharded

        pose, breakdown, n_acc, scale = run_chains_fused_sharded(
            seed, pose0, scene, cfg, cfg.n_chains, cfg.iterations, mesh,
            interpret=interp,
        )
    else:
        from mh_tpu.kernels.fused_mh import run_chains_fused

        pose, breakdown, n_acc, scale = run_chains_fused(
            seed, pose0, scene, cfg, cfg.n_chains, cfg.iterations,
            interpret=interp,
        )
    n_real = int(np.sum(np.asarray(scene.obj_mask) > 0))
    return LayoutResult(
        points=np.asarray(pose)[:, :n_real, :],
        costs=np.asarray(breakdown),
        accept_rate=np.asarray(n_acc, np.float64) / max(cfg.iterations, 1),
        step_scale=np.asarray(scale),
    )


def _result_from_state(scene, state) -> LayoutResult:
    n_real = int(np.sum(np.asarray(scene.obj_mask) > 0))
    return LayoutResult(
        points=np.asarray(state.pose)[:, :n_real, :],
        costs=np.asarray(state.costs.as_vector()),
        accept_rate=np.asarray(state.accept_rate),
        step_scale=np.exp(np.asarray(state.log_scale)),
    )


def _run_xla_logged(scene, cfg, key, pose0, logger, log_every) -> LayoutResult:
    """The plain XLA engine in ``log_every``-step rounds with ``round``
    events after each — bitwise identical to the one-shot run (the resume
    fold consumes exactly the stream the uninterrupted run would)."""
    import dataclasses as dc

    from mh_tpu.sampler.mh import continue_chains

    if isinstance(key, int):
        key = jax.random.key(key)
    total = cfg.iterations
    first = min(log_every, total)
    states, _ = run_chains(key, pose0, scene, dc.replace(cfg, iterations=first))
    step = first
    logger.log_round(0, step, states)
    rnd = 1
    while step < total:
        n = min(log_every, total - step)
        states = continue_chains(states, scene, dc.replace(cfg, iterations=n))
        step += n
        logger.log_round(rnd, step, states)
        rnd += 1
    return _result_from_state(scene, states)


def _run_xla(scene, cfg, key, pose0, engine, mesh) -> LayoutResult:
    """Dispatch to the XLA scan engines (sharded when >1 device)."""
    if isinstance(key, int):
        key = jax.random.key(key)

    if mesh is not None and engine == "xla_specialized":
        raise ValueError("mesh sharding applies to engine='xla' only")
    if mesh is not None and np.ndim(pose0) != 2:
        raise ValueError(
            "mesh sharding supports one shared pose0 (f32[N,6]); per-chain "
            "starts need the unsharded engine='xla'"
        )
    if engine == "xla" and mesh is None and jax.device_count() > 1 and (
        cfg.n_chains % jax.device_count() == 0 and np.ndim(pose0) == 2
    ):
        from mh_tpu.parallel.mesh import chain_mesh

        mesh = chain_mesh()

    if engine == "xla_specialized":
        state, _ = compile_chains(scene, cfg)(key, pose0)
    elif mesh is not None:
        from mh_tpu.parallel.sharded import run_chains_sharded

        state = run_chains_sharded(key, pose0, scene, cfg, mesh)
    else:
        state, _ = run_chains(key, pose0, scene, cfg)
    return _result_from_state(scene, state)
