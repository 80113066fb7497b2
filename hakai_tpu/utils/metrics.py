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


@jax.jit
def halo_step_metrics(hm, s) -> dict:
    """step_metrics twin for shard-major halo state (parallel/halo.py) —
    every scalar reduces over the sharded arrays directly, so metrics
    streaming never forces the per-chunk host-side gather_state the VTK
    frames need.  contact_force is not carried in HaloState; its max is
    reported as 0.0 exactly as the gather_state view did."""
    v = s.velo                                       # (S, 3, No)
    ke = 0.5 * jnp.sum(hm.diag_M * (v * v).sum(axis=1))
    d_disp = s.disp - s.disp_pre
    d_max = jnp.sqrt((d_disp * d_disp).sum(axis=1)).max()
    return dict(
        kinetic_energy=ke,
        d_max=d_max,
        contact_force_max=jnp.zeros((), s.disp.dtype),
        alive_elements=s.element_flag.sum(),
        eq_plastic_strain_max=s.eq_ps.max(),
        stress_absmax=jnp.abs(s.stress).max(),
        disp_absmax=jnp.abs(s.disp).max(),
    )


class MetricsWriter:
    """Append-only JSONL metrics stream."""

    def __init__(self, path: str | None):
        self._f: IO | None = open(path, "a") if path else None
        self.history: list[dict] = []

    def record(self, model: LoweredModel, state: SimState, step: int,
               wall_s: float) -> dict:
        return self.record_raw(step_metrics(model, state), model, step,
                               wall_s)

    def record_raw(self, m: dict, model: LoweredModel, step: int,
                   wall_s: float) -> dict:
        """Append a record from precomputed device-side scalars."""
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
