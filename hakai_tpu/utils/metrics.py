"""Structured run metrics.

The reference's observability is printf-based: a progress line every 100
steps (HAKAI_j.jl:489-493), deletion events (:736), a ``findmax`` on the
external force (:540) and displacement increment (:657), and a bug-report
dump file (:86-87).  Here the equivalents are computed on device in one jitted
function and appended as JSONL records between solver chunks.
"""
from __future__ import annotations

import json
from typing import IO

import jax
import jax.numpy as jnp

from ..core.lowering import LoweredModel
from ..core.state import SimState


@jax.jit
def step_metrics(model: LoweredModel, state: SimState) -> dict:
    """Scalar diagnostics of the current state (device-side)."""
    v = state.velo
    ke = 0.5 * jnp.sum(model.diag_M * (v * v).sum(axis=0))
    d_disp = state.disp - state.disp_pre
    d_max = jnp.sqrt((d_disp * d_disp).sum(axis=0)).max()
    f_max = jnp.abs(state.contact_force).max()
    alive = state.element_flag.sum()
    eq_max = state.eq_ps.max()
    mises = state.stress
    return dict(
        kinetic_energy=ke,
        d_max=d_max,
        contact_force_max=f_max,
        alive_elements=alive,
        eq_plastic_strain_max=eq_max,
        stress_absmax=jnp.abs(mises).max(),
        disp_absmax=jnp.abs(state.disp).max(),
    )


class MetricsWriter:
    """Append-only JSONL metrics stream."""

    def __init__(self, path: str | None):
        self._f: IO | None = open(path, "a") if path else None
        self.history: list[dict] = []

    def record(self, model: LoweredModel, state: SimState, step: int,
               wall_s: float) -> dict:
        m = step_metrics(model, state)
        rec = {k: float(v) for k, v in m.items()}
        rec["step"] = step
        rec["time"] = step * model.dt
        rec["wall_s"] = wall_s
        self.history.append(rec)
        if self._f:
            self._f.write(json.dumps(rec) + "\n")
            self._f.flush()
        return rec

    def close(self):
        if self._f:
            self._f.close()
