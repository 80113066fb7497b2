"""Multi-chip domain decomposition over a ``jax.sharding.Mesh``.

The reference scales only via shared-memory threads on one host
(FLoops ``@floop`` element/contact loops, HAKAI_j.jl:1114, 2370) — it has no
distributed axis at all (SURVEY.md §2).  The TPU-native scaling axis is
spatial domain decomposition of the mesh:

  * **elements are sharded** across the ``dp`` mesh axis (the Gauss-point
    state pytree lives entirely on the owning device);
  * node kinematics are replicated; each device assembles the internal-force
    contribution of its element shard by local scatter-add and the global
    force is one ``psum`` over ICI — the FEM analogue of tensor parallelism's
    all-reduce;
  * element life masks are ``all_gather``-ed so contact-surface activity
    (which references global element ids) stays consistent.

All collectives are XLA collectives over the mesh — no host round-trips
(contrast the reference GPU path's per-step full-array uploads,
HAKAI_j.jl:2842-2886).  A halo-exchange node-sharded variant (ppermute over
ring neighbours) is the planned next step for pod-scale meshes.
"""
from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..core.lowering import ContactPairArrays, LoweredModel
from ..core.state import SimState
from ..ops.contact import contact_forces
from ..ops.element import element_update, triax_stress
from ..ops.erosion import erode
from ..solver.explicit import apply_bc

# element-axis (last-dim sharded) fields of LoweredModel
_ELEM_FIELDS = ("elem", "elem_exists", "mat_id", "G_e", "lam_e",
                "has_plastic_e", "yield0_e")
# element-axis fields of SimState
_STATE_ELEM_FIELDS = ("stress", "strain", "eq_ps", "yield_s", "triax",
                      "element_flag")


def _strip_plans(model: LoweredModel) -> LoweredModel:
    """Remove single-chip Pallas gather plans: the sharded path gathers with
    XLA per shard (per-shard plans are a planned follow-up)."""
    pairs = tuple(dataclasses.replace(p, plan_tpos=None, plan_tvel=None,
                                      plan_inode=None, plan_jnode=None,
                                      plan_fgi=None, plan_fgt=None,
                                      plan_fx=None, plan_pick=None)
                  for p in model.pairs)
    return dataclasses.replace(model, plan_pos=None, plan_asm=None,
                               asm_mask=None, asm_vl=0, pairs=pairs)


def make_mesh(n_devices: int | None = None, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = n_devices or len(devices)
    return Mesh(np.array(devices[:n]), ("dp",))


def model_specs(model: LoweredModel) -> LoweredModel:
    """PartitionSpec pytree matching LoweredModel: element axis over 'dp'."""
    kw = {}
    for f in dataclasses.fields(model):
        if f.metadata.get("static"):
            continue
        if f.name == "pairs":
            kw[f.name] = tuple(
                dataclasses.replace(
                    p, **{g.name: (P() if getattr(p, g.name) is not None
                                   else None)
                          for g in dataclasses.fields(p)
                          if not g.metadata.get("static")})
                for p in model.pairs)
        elif f.name in _ELEM_FIELDS:
            arr = getattr(model, f.name)
            kw[f.name] = P(*([None] * (arr.ndim - 1) + ["dp"]))
        else:
            arr = getattr(model, f.name)
            kw[f.name] = P() if arr is not None else None
    return dataclasses.replace(model, **kw)


_STATE_RANKS = dict(t=0, disp=2, disp_pre=2, velo=2, Q=2, stress=3, strain=3,
                    eq_ps=2, yield_s=2, triax=2, element_flag=1,
                    contact_force=2)


def state_specs() -> SimState:
    kw = {}
    for f in dataclasses.fields(SimState):
        rank = _STATE_RANKS[f.name]
        if f.name in _STATE_ELEM_FIELDS:
            kw[f.name] = P(*([None] * (rank - 1) + ["dp"]))
        else:
            kw[f.name] = P()
    return SimState(**kw)


def _assemble_scatter(elem: jnp.ndarray, Qe: jnp.ndarray, N: int):
    """Local-shard internal-force assembly: (3,8,El)+(8,El) -> (3,N)."""
    return jnp.zeros((3, N), Qe.dtype).at[:, elem].add(Qe)


def _sharded_step(model: LoweredModel, state: SimState) -> SimState:
    """One time step on local shards; runs inside shard_map."""
    dt = jnp.asarray(model.dt, model.dtype)
    t = state.t + 1
    current_time = t.astype(model.dtype) * dt

    # global element life mask for contact (tri/twin ids are global)
    external = jnp.zeros_like(state.disp)
    cforce = state.contact_force
    if model.pairs:
        flag_g = jax.lax.all_gather(state.element_flag, "dp", tiled=True)
        # contact_forces reads element_flag and disp/velo from a state view
        gstate = state.replace(element_flag=flag_g)
        cforce = contact_forces(model, gstate)
        external = external + cforce

    a1 = model.diag_M / dt**2
    a2 = model.diag_M * model.config.damping_C / (2.0 * dt)
    disp_new = (external - state.Q
                + a1 * (2.0 * state.disp - state.disp_pre)
                + a2 * state.disp_pre) / (a1 + a2)
    disp_new = apply_bc(model, disp_new, current_time)
    disp_new = jnp.where(model.node_exists, disp_new, 0.0)

    d_disp = disp_new - state.disp
    velo = d_disp / dt
    position = model.coord + disp_new

    res = element_update(model, position, d_disp, state.stress, state.strain,
                         state.eq_ps, state.yield_s, state.element_flag)
    Q_local = _assemble_scatter(model.elem, res.Qe, model.N)
    Q = jax.lax.psum(Q_local, "dp")
    triax = triax_stress(res.stress)

    flag = state.element_flag
    stress, strain = res.stress, res.strain
    if model.fracture_enabled:
        er = erode(model, stress, strain, res.eq_ps, triax, flag)
        flag, stress, strain = er.element_flag, er.stress, er.strain

    return state.replace(
        t=t, disp=disp_new, disp_pre=state.disp, velo=velo, Q=Q,
        stress=stress, strain=strain, eq_ps=res.eq_ps, yield_s=res.yield_s,
        triax=triax, element_flag=flag, contact_force=cforce,
    )


def make_sharded_step(model: LoweredModel, mesh: Mesh, n_steps: int = 1):
    """Jitted multi-device step: state -> state with element-sharded model.

    ``model.E`` must be divisible by the mesh size (set
    ``SolverConfig.elem_pad`` accordingly before lowering).
    """
    n = mesh.devices.size
    if model.E % n:
        raise ValueError(f"E={model.E} not divisible by mesh size {n}")
    model = _strip_plans(model)
    mspec = model_specs(model)
    sspec = state_specs()

    def body(m, s):
        return jax.lax.fori_loop(0, n_steps,
                                 lambda _, t: _sharded_step(m, t), s)

    # check_vma=False: contact's lax.cond mixes device-varying (gathered
    # element flags) and invariant operands; correctness of replication is
    # guaranteed by construction (all inputs to the node update are psum'd or
    # replicated).
    fn = jax.shard_map(body, mesh=mesh, in_specs=(mspec, sspec),
                       out_specs=sspec, check_vma=False)
    jitted = jax.jit(fn)

    def run(state: SimState) -> SimState:
        return jitted(model, state)

    return run


def shard_arrays(model: LoweredModel, state: SimState, mesh: Mesh):
    """Place model/state on the mesh with the canonical shardings."""
    model = _strip_plans(model)
    mspec, sspec = model_specs(model), state_specs()

    def put(x, spec):
        if x is None or not hasattr(x, "ndim"):
            return x
        return jax.device_put(x, jax.sharding.NamedSharding(mesh, spec))

    model_s = jax.tree_util.tree_map(put, model, mspec)
    state_s = jax.tree_util.tree_map(put, state, sspec)
    return model_s, state_s
