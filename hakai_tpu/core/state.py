"""Simulation state pytree.

Mirrors the mutable per-step arrays of the reference time loop
(HAKAI_j.jl:225-456) as one immutable pytree updated by the pure
``step`` function.  ``Q`` (internal force) is state because the reference's
central-difference update at step ``t`` consumes the internal force computed
at the end of step ``t-1`` (HAKAI_j.jl:562-567 uses ``Q`` filled at :668-675
of the previous iteration).
"""
from __future__ import annotations

import dataclasses
from dataclasses import dataclass

import jax
import jax.numpy as jnp

from .lowering import LoweredModel


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class SimState:
    t: jnp.ndarray            # () int32 — completed step count
    disp: jnp.ndarray         # (3, N)
    disp_pre: jnp.ndarray     # (3, N)
    velo: jnp.ndarray         # (3, N)
    Q: jnp.ndarray            # (3, N) internal force from previous step
    stress: jnp.ndarray       # (6, 8, E) integration-point Cauchy stress
    strain: jnp.ndarray       # (6, E) accumulated GP-MEAN strain increments
    #   (the per-GP strain tensor is write-only in the reference: its only
    #   consumer is the output node-averaging, which takes the GP mean first
    #   — cal_node_stress_strain, HAKAI_j.jl:3436 — so the state carries the
    #   mean directly; 8x less strain traffic/memory, same output)
    eq_ps: jnp.ndarray        # (8, E) equivalent plastic strain
    yield_s: jnp.ndarray      # (8, E) current yield stress
    triax: jnp.ndarray        # (8, E) stress triaxiality
    element_flag: jnp.ndarray  # (E,) bool — alive mask (padding = False)
    contact_force: jnp.ndarray  # (3, N) last contact force (diagnostics/VTK)
    work: jnp.ndarray         # (2,) cumulative [W_ext+constraint, W_int];
    #   accumulated per step only when config.energy_check (zeros otherwise
    #   — the dataclass field is unconditional so checkpoints/pytree specs
    #   stay uniform; see utils.metrics.energy_metrics for the identity)

    def replace(self, **kw) -> "SimState":
        return dataclasses.replace(self, **kw)

    @property
    def position_of(self):
        raise AttributeError("use coord + disp")


def init_state(model: LoweredModel) -> SimState:
    kdt = model.dtype      # kinematic dtype (f64 in mixed mode)
    edt = model.edtype     # element dtype (f32 in mixed mode)
    N, E = model.N, model.E
    zeros3N = jnp.zeros((3, N), kdt)
    velo = model.velo0
    # IC encodes velocity through the back-difference start
    # (disp_pre = -v*dt, HAKAI_j.jl:232-239)
    disp_pre = -velo * jnp.asarray(model.dt, kdt)
    yield_s = jnp.broadcast_to(model.yield0_e, (8, E)).astype(edt)
    return SimState(
        t=jnp.zeros((), jnp.int32),
        disp=zeros3N,
        disp_pre=disp_pre,
        velo=velo,
        Q=zeros3N,
        stress=jnp.zeros((6, 8, E), edt),
        strain=jnp.zeros((6, E), edt),
        eq_ps=jnp.zeros((8, E), edt),
        yield_s=yield_s,
        triax=jnp.zeros((8, E), edt),
        element_flag=model.elem_exists,
        contact_force=zeros3N,
        work=jnp.zeros((2,), kdt),
    )
