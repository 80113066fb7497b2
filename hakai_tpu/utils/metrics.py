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


def _elastic_energy(G_e, lam_e, vol_e, stress, flag):
    """Elastic strain energy from the constitutive state: per Gauss point
    u = sigma : C^-1 sigma / 2 in isotropic component form, weighted by
    vol_e/8 (initial geometry; diagnostics only)."""
    G = jnp.where(G_e == 0, 1.0, G_e)
    nu = lam_e / (2.0 * (lam_e + G))
    E_y = 2.0 * G * (1.0 + nu)
    sx, sy, sz, txy, tyz, txz = (stress[c] for c in range(6))
    u_gp = ((sx**2 + sy**2 + sz**2
             - 2.0 * nu * (sx * sy + sy * sz + sz * sx)) / (2.0 * E_y)
            + (txy**2 + tyz**2 + txz**2) / (2.0 * G))
    wv = jnp.where(flag, vol_e, 0.0) / 8.0
    return jnp.sum(u_gp.sum(axis=-2) * wv)


def _plastic_dissipation(vol_e, yield0_e, yield_s, eq_ps, flag):
    """integral(sigma_y d eps_p) with the trapezoid (yield0 + yield_now)/2
    per Gauss point — exact for linear hardening within one table segment."""
    wv = jnp.where(flag, vol_e, 0.0) / 8.0
    wp_gp = 0.5 * (yield0_e[..., None, :] + yield_s) * eq_ps
    return jnp.sum(wp_gp.sum(axis=-2) * wv)


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
    out = dict(
        kinetic_energy=ke,
        d_max=d_max,
        contact_force_max=f_max,
        alive_elements=alive,
        eq_plastic_strain_max=eq_max,
        stress_absmax=jnp.abs(mises).max(),
        disp_absmax=jnp.abs(state.disp).max(),
    )
    if model.config.energy_check:
        ke0 = 0.5 * jnp.sum(model.diag_M * (model.velo0 ** 2).sum(axis=0))
        u_el = _elastic_energy(model.G_e, model.lam_e, model.vol_e,
                               state.stress, state.element_flag)
        w_p = _plastic_dissipation(model.vol_e, model.yield0_e,
                                   state.yield_s, state.eq_ps,
                                   state.element_flag)
        out.update(_energy_fields(ke, ke0, state.work, u_el, w_p))
    return out


def _energy_fields(ke, ke0, work, u_el, w_p):
    """Balance scalars shared by the single-chip and halo metric paths.

    ``balance_residual`` = KE - KE0 - W_ext + W_int is EXACTLY zero in real
    arithmetic for the central-difference update (identity derivation in
    solver.explicit._integrate), so its magnitude tracks accumulated
    roundoff-energy injection; ``energy_rel_error`` normalizes it by the
    run's energy scale for thresholding."""
    w_ext, w_int = work[0], work[1]
    residual = ke - ke0 - w_ext + w_int
    scale = jnp.maximum(
        jnp.maximum(jnp.maximum(ke, ke0),
                    jnp.maximum(jnp.abs(w_ext), jnp.abs(w_int))),
        jnp.maximum(u_el + w_p, jnp.asarray(1e-30, ke.dtype)))
    return dict(work_external=w_ext, work_internal=w_int,
                elastic_energy=u_el, plastic_dissipation=w_p,
                balance_residual=residual,
                energy_rel_error=jnp.abs(residual) / scale)


@jax.jit
def energy_guard(model: LoweredModel, state: SimState):
    """(|residual| / scale) for the between-chunk divergence abort —
    separable from step_metrics so run() can guard without streaming
    metrics."""
    v = state.velo
    ke = 0.5 * jnp.sum(model.diag_M * (v * v).sum(axis=0))
    ke0 = 0.5 * jnp.sum(model.diag_M * (model.velo0 ** 2).sum(axis=0))
    u_el = _elastic_energy(model.G_e, model.lam_e, model.vol_e,
                           state.stress, state.element_flag)
    w_p = _plastic_dissipation(model.vol_e, model.yield0_e, state.yield_s,
                               state.eq_ps, state.element_flag)
    return _energy_fields(ke, ke0, state.work, u_el, w_p)["energy_rel_error"]


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
    out = dict(
        kinetic_energy=ke,
        d_max=d_max,
        contact_force_max=jnp.zeros((), s.disp.dtype),
        alive_elements=s.element_flag.sum(),
        eq_plastic_strain_max=s.eq_ps.max(),
        stress_absmax=jnp.abs(s.stress).max(),
        disp_absmax=jnp.abs(s.disp).max(),
    )
    if hm.base.config.energy_check:
        ke0 = 0.5 * jnp.sum(hm.diag_M * (hm.velo0 ** 2).sum(axis=1))
        u_el = _elastic_energy(hm.G_e, hm.lam_e, hm.vol_e,
                               jnp.moveaxis(s.stress, 1, 0),  # (6,S,8,El)
                               s.element_flag)
        w_p = _plastic_dissipation(hm.vol_e, hm.yield0_e, s.yield_s,
                                   s.eq_ps, s.element_flag)
        out.update(_energy_fields(ke, ke0, s.work.sum(axis=0), u_el, w_p))
    return out


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
