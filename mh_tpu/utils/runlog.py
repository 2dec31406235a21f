"""Structured run logging: a JSONL event stream for observability.

SURVEY.md §5 mandates a metrics/logging subsystem; the reference's only
instrumentation is ~80 commented-out ``printf`` statements and a device
printout (``Kernel.cu:156-157,1199-1214``). Here every run can emit a
machine-parseable event stream instead: one JSON object per line, each
with a wall-clock ``ts``, an ``event`` kind, and kind-specific fields.

Event kinds:

- ``run_config``  — engine, sampler config, scene summary (run start)
- ``round``       — periodic chain statistics: accept-rate mean/min/max,
                    step-scale stats, total-cost quantiles (p10/p50/p90)
- ``checkpoint``  — a state save/restore (path, step)
- ``result``      — final layouts summary (run end)

Wire-in points: ``suggest_layouts(..., log=..., log_every=N)`` and the CLI
``--log FILE`` flags (``mh_tpu demo --log run.jsonl``); checkpoint
save/restore accept an optional logger.
"""

from __future__ import annotations

import dataclasses
import json
import time
from typing import IO

import numpy as np


def _jsonable(v):
    if isinstance(v, (np.floating, np.integer)):
        return v.item()
    if isinstance(v, np.ndarray):
        return v.tolist()
    if dataclasses.is_dataclass(v) and not isinstance(v, type):
        return {
            f.name: _jsonable(getattr(v, f.name))
            for f in dataclasses.fields(v)
        }
    if isinstance(v, dict):
        return {k: _jsonable(x) for k, x in v.items()}
    if isinstance(v, (list, tuple)):
        return [_jsonable(x) for x in v]
    if hasattr(v, "name") and hasattr(v, "value"):  # Enum
        return v.name
    try:
        json.dumps(v)
        return v
    except TypeError:
        return str(v)


class RunLogger:
    """Append-only JSONL event emitter.

    ``sink`` is a file path (opened in append mode) or any file-like with
    ``write``. Thread-unsafe by design (one logger per run).
    """

    def __init__(self, sink: str | IO[str]):
        if isinstance(sink, str):
            self._fh: IO[str] = open(sink, "a")  # noqa: SIM115 — closed in close()
            self._owns = True
        else:
            self._fh = sink
            self._owns = False

    def event(self, kind: str, **fields) -> None:
        rec = {"ts": round(time.time(), 3), "event": kind}
        rec.update({k: _jsonable(v) for k, v in fields.items()})
        self._fh.write(json.dumps(rec) + "\n")
        self._fh.flush()

    def close(self) -> None:
        if self._owns:
            self._fh.close()

    def __enter__(self) -> "RunLogger":
        return self

    def __exit__(self, *exc) -> None:
        self.close()

    # --- domain helpers -----------------------------------------------------

    def log_config(self, cfg, *, engine: str, n_objs: int, n_chains: int,
                   **extra) -> None:
        self.event(
            "run_config", engine=engine, n_objs=n_objs, n_chains=n_chains,
            config=cfg, **extra,
        )

    def log_round(self, round_idx: int, step: int, states) -> None:
        """Chain statistics from a (vmapped) ``MHState``."""
        acc = np.asarray(states.accept_rate, np.float64)
        scale = np.exp(np.asarray(states.log_scale, np.float64))
        total = np.asarray(states.costs.total, np.float64)
        q10, q50, q90 = np.quantile(total, (0.1, 0.5, 0.9))
        self.event(
            "round",
            round=round_idx,
            step=step,
            accept_rate={"mean": acc.mean(), "min": acc.min(), "max": acc.max()},
            step_scale={"mean": scale.mean(), "min": scale.min(),
                        "max": scale.max()},
            cost_total={"p10": q10, "p50": q50, "p90": q90,
                        "best": total.max()},
        )

    def log_checkpoint(self, kind: str, path: str, **extra) -> None:
        self.event("checkpoint", op=kind, path=path, **extra)

    def log_result(self, result, *, engine: str) -> None:
        acc = np.asarray(result.accept_rate, np.float64)
        total = np.asarray(result.costs[:, 0], np.float64)
        self.event(
            "result",
            engine=engine,
            n_suggestions=int(result.points.shape[0]),
            accept_rate={"mean": acc.mean(), "min": acc.min(), "max": acc.max()},
            cost_total={"best": total.max(), "p50": float(np.median(total))},
        )


def as_logger(log) -> RunLogger | None:
    """Coerce a path / file-like / RunLogger / None into a logger."""
    if log is None or isinstance(log, RunLogger):
        return log
    return RunLogger(log)
