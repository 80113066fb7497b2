"""Multi-chip domain decomposition over a ``jax.sharding.Mesh``.

The reference scales only via shared-memory threads on one host
(FLoops ``@floop`` element/contact loops, HAKAI_j.jl:1114, 2370) — it has no
distributed axis at all (SURVEY.md §2).  The TPU-native scaling axis is
spatial domain decomposition of the mesh:

  * **elements are sharded** across the ``dp`` mesh axis (the Gauss-point
    state pytree lives entirely on the owning device);
  * node kinematics are replicated; each device assembles the internal-force
    contribution of its element shard with its *own* Pallas gather plans
    (lanes masked to locally-owned elements) and the global force is one
    ``psum`` over ICI — the FEM analogue of tensor parallelism's all-reduce;
  * element life masks are ``all_gather``-ed so contact-surface activity
    (which references global element ids) stays consistent; the contact
    narrow phase itself runs replicated (node data is replicated), keeping
    its single-chip Pallas plans.

Per-shard gather plans are stacked on a leading shard axis and sharded over
``dp`` (ops/gather_pallas.plan_sharded_gather): inside the shard_map body
each device slices off its own plan, so the multi-chip path keeps the
blocked-gather kernels (the XLA-gather fallback is 3-5x slower,
docs/PERF.md).  All collectives are XLA collectives over the mesh — no host
round-trips (contrast the reference GPU path's per-step full-array uploads,
HAKAI_j.jl:2842-2886).  A halo-exchange node-sharded variant (ppermute over
ring neighbours) lives in parallel/halo.py for pod-scale meshes.
"""
from __future__ import annotations

import dataclasses
import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..core.lowering import LoweredModel, assembly_lanes
from ..core.state import SimState
from ..ops.contact import contact_forces
from ..ops.element import element_update, triax_stress
from ..ops.erosion import erode
from ..ops.gather_pallas import (blocked_gather, plan_local,
                                 plan_sharded_gather)
from ..solver.explicit import apply_bc

# element-axis (last-dim sharded) fields of LoweredModel
_ELEM_FIELDS = ("elem", "elem_exists", "mat_id", "G_e", "lam_e",
                "has_plastic_e", "yield0_e", "coord_e")
# element-axis fields of SimState
_STATE_ELEM_FIELDS = ("stress", "strain", "eq_ps", "yield_s", "triax",
                      "element_flag")
# stacked per-shard plan fields (leading shard axis over 'dp')
_SHARD_PLAN_FIELDS = ("plan_pos", "plan_asm", "asm_mask")


def shard_model(model: LoweredModel, n: int) -> LoweredModel:
    """Rebuild the element-axis gather plans as stacked per-shard plans.

    ``plan_pos``/``plan_asm``/``asm_mask`` become per-shard (leading axis
    ``n``); contact-pair plans are left untouched — they read replicated
    node data, so every device runs them identically."""
    if model.E % n:
        raise ValueError(f"E={model.E} not divisible by mesh size {n}")
    if model.plan_pos is None:
        return model
    E, N = model.E, model.N
    Es = E // n
    elem = np.asarray(model.elem)
    exists = np.asarray(model.elem_exists)

    idx_list = [elem[:, d * Es:(d + 1) * Es].reshape(-1) for d in range(n)]
    val_list = [np.tile(exists[d * Es:(d + 1) * Es], 8) for d in range(n)]
    plan_pos = plan_sharded_gather(idx_list, N, valid_per_shard=val_list)

    lanes = assembly_lanes(elem, model.n_element, E, N)
    pa_idx, pa_val, pa_mask = [], [], []
    for d in range(n):
        li, lm = [], []
        for idx_arr, msk in lanes:
            e = idx_arr % E
            i = idx_arr // E
            own = msk & (e >= d * Es) & (e < (d + 1) * Es)
            li.append(np.where(own, i * Es + (e - d * Es), 0))
            lm.append(own)
        pa_idx.append(np.concatenate(li))
        pa_val.append(np.concatenate(lm))
        pa_mask.append(np.stack(lm))
    plan_asm = plan_sharded_gather(pa_idx, 8 * Es, valid_per_shard=pa_val)
    return dataclasses.replace(
        model, plan_pos=plan_pos, plan_asm=plan_asm,
        asm_mask=jnp.asarray(np.stack(pa_mask)), asm_vl=len(lanes))


def _local_model(model: LoweredModel) -> LoweredModel:
    """Device-local view inside shard_map: slice the per-shard plans."""
    if model.plan_pos is None:
        return model
    return dataclasses.replace(
        model, plan_pos=plan_local(model.plan_pos),
        plan_asm=plan_local(model.plan_asm), asm_mask=model.asm_mask[0])


def make_mesh(n_devices: int | None = None, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = n_devices or len(devices)
    return Mesh(np.array(devices[:n]), ("dp",))


def _spec_tree(obj, leaf_spec):
    return jax.tree_util.tree_map(lambda _: leaf_spec, obj)


def model_specs(model: LoweredModel) -> LoweredModel:
    """PartitionSpec pytree matching LoweredModel: element axis over 'dp',
    stacked per-shard plans over their leading axis, everything else
    replicated."""
    kw = {}
    for f in dataclasses.fields(model):
        if f.metadata.get("static"):
            continue
        v = getattr(model, f.name)
        if f.name == "pairs":
            kw[f.name] = tuple(
                dataclasses.replace(
                    p, **{g.name: _spec_tree(getattr(p, g.name), P())
                          for g in dataclasses.fields(p)
                          if not g.metadata.get("static")
                          and getattr(p, g.name) is not None})
                for p in model.pairs)
        elif f.name in _SHARD_PLAN_FIELDS:
            kw[f.name] = _spec_tree(v, P("dp")) if v is not None else None
        elif f.name in _ELEM_FIELDS:
            kw[f.name] = (P(*([None] * (v.ndim - 1) + ["dp"]))
                          if v is not None else None)
        else:
            kw[f.name] = _spec_tree(v, P()) if v is not None else None
    return dataclasses.replace(model, **kw)


_STATE_RANKS = dict(t=0, disp=2, disp_pre=2, velo=2, Q=2, stress=3, strain=2,
                    eq_ps=2, yield_s=2, triax=2, element_flag=1,
                    contact_force=2, work=1)


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
    """XLA-fallback local-shard assembly: (3,8,El)+(8,El) -> (3,N)."""
    return jnp.zeros((3, N), Qe.dtype).at[:, elem].add(Qe)


def _sharded_integrate(lm: LoweredModel, state: SimState, flag_g=None):
    """Contact (on all-gathered life masks) + central difference + BCs.
    Mirrors solver.explicit._integrate under shard_map.

    ``flag_g`` (global element life mask) can be precomputed by the caller:
    flags change only on erosion, so erosion-free decks hoist the all_gather
    out of the chunk loop instead of paying it every step."""
    dt = jnp.asarray(lm.dt, lm.dtype)
    t = state.t + 1
    current_time = t.astype(lm.dtype) * dt

    # global element life mask for contact (tri/twin ids are global)
    external = jnp.zeros_like(state.disp)
    cforce = state.contact_force
    if lm.pairs:
        if flag_g is None:
            flag_g = jax.lax.all_gather(state.element_flag, "dp", tiled=True)
        # contact_forces reads element_flag and disp/velo from a state view;
        # the narrow phase is partitioned round-robin over 'dp'
        gstate = state.replace(element_flag=flag_g)
        cforce = contact_forces(lm, gstate, axis_name="dp")
        external = external + cforce

    a1 = lm.diag_M / dt**2
    a2 = lm.diag_M * lm.config.damping_C / (2.0 * dt)
    numer = (external - state.Q
             + a1 * (2.0 * state.disp - state.disp_pre)
             + a2 * state.disp_pre)
    disp_new = numer / (a1 + a2)
    disp_new = apply_bc(lm, disp_new, current_time)
    disp_new = jnp.where(lm.node_exists, disp_new, 0.0)
    velo = (disp_new - state.disp) / dt
    dwork = None
    if lm.config.energy_check:
        # node state is replicated over 'dp': every shard computes the same
        # sums, so the accumulator stays replicated (see explicit._integrate
        # for the exact-identity derivation)
        du_mid = 0.5 * (disp_new - state.disp_pre)
        f_c = jnp.where(lm.bcd_mask, (a1 + a2) * disp_new - numer, 0.0)
        dwork = jnp.stack([jnp.sum((external + f_c) * du_mid),
                           jnp.sum(state.Q * du_mid)])
    return t, disp_new, velo, cforce, dwork


def _sharded_assemble(lm: LoweredModel, Qe: jnp.ndarray) -> jnp.ndarray:
    """Reduction-order-free internal-force assembly: every (lane, node)
    slot is owned by exactly one shard, so psum of the masked lane array is
    a disjoint union (additions with zero are exact); the lane sum then
    runs in the same fixed order as the single-chip path — Q matches a
    single-device run to XLA fusion roundoff, independent of mesh size."""
    if isinstance(Qe, (list, tuple)):
        from ..ops.element import _stack_qe
        Qe = _stack_qe(Qe)
    if lm.plan_asm is not None:
        qf = Qe.reshape(3, -1)
        vals = blocked_gather(qf, lm.plan_asm)
        vals = vals.reshape(3, lm.asm_vl, lm.N)
        vals = jnp.where(lm.asm_mask[None], vals, 0.0)
        vals = jax.lax.psum(vals, "dp")
        return vals.sum(axis=1).astype(lm.dtype)
    Q_local = _assemble_scatter(lm.elem, Qe, lm.N).astype(lm.dtype)
    return jax.lax.psum(Q_local, "dp")


def _sharded_step(lm: LoweredModel, state: SimState, flag_g=None) -> SimState:
    """One generic time step on local shards; runs inside shard_map.
    ``lm`` is the device-local model view (element fields are local
    slices, plans already through plan_local)."""
    t, disp_new, velo, cforce, dwork = _sharded_integrate(lm, state, flag_g)
    d_disp = disp_new - state.disp
    position = lm.coord + disp_new

    edt = lm.edtype
    res = element_update(lm, position.astype(edt), d_disp.astype(edt),
                         state.stress, state.strain,
                         state.eq_ps, state.yield_s, state.element_flag)
    Q = _sharded_assemble(lm, res.Qe)
    triax = triax_stress(res.stress)

    flag = state.element_flag
    stress, strain = res.stress, res.strain
    if lm.fracture_enabled:
        er = erode(lm, stress, strain, res.eq_ps, triax, flag)
        flag, stress, strain = er.element_flag, er.stress, er.strain

    return state.replace(
        t=t, disp=disp_new, disp_pre=state.disp, velo=velo, Q=Q,
        stress=stress, strain=strain, eq_ps=res.eq_ps, yield_s=res.yield_s,
        triax=triax, element_flag=flag, contact_force=cforce,
        work=state.work if dwork is None else state.work + dwork,
    )


def _sharded_step_fast(lm: LoweredModel, state: SimState, disp_e_prev,
                       stress_c, strain_c, flag_g=None):
    """disp_e-carry fast step under shard_map — same formulation as
    solver.explicit.step_fast (3-channel gather of only the new
    displacement, stress/strain carried as 6-component tuples), so sharded
    runs reproduce single-device fast-path numerics."""
    from ..ops.element import element_core_c, gather_disp_e
    from ..ops.erosion import erosion_delete_mask

    from ..ops.element import element_kinematics

    edt = lm.edtype
    t, disp_new, velo, cforce, dwork = _sharded_integrate(lm, state, flag_g)
    disp_e = gather_disp_e(lm, disp_new)
    pos_r, du_r = element_kinematics(lm.coord_e, disp_e, disp_e_prev,
                                     edt, lm.E)
    qe, s_c, e_c, eq, y, triax = element_core_c(
        lm, pos_r, du_r, stress_c, strain_c, state.eq_ps, state.yield_s,
        state.element_flag, pre_centered=True)
    if not lm.fracture_enabled:
        # chunk-exit triax on fracture-free decks — see
        # solver.explicit.step_fast (make_sharded_step recomputes it once
        # from the final stress)
        triax = state.triax
    elif triax is None:  # VMEM-resident regime (see element.py)
        from ..ops.element import triax_components
        triax = triax_components(s_c)
    Q = _sharded_assemble(lm, qe)
    # deferred erosion zeroing — see solver.explicit.step_fast
    if lm.fracture_enabled:
        # dead elements carry stale stress under deferred zeroing; the
        # reference's triax for them is 0 (recomputed from zeroed stress)
        triax = jnp.where(state.element_flag[None, :], triax, 0.0)
    flag = state.element_flag
    if lm.fracture_enabled:
        flag, delete = erosion_delete_mask(lm, eq, triax, flag)
    new_state = state.replace(
        t=t, disp=disp_new, disp_pre=state.disp, velo=velo, Q=Q,
        eq_ps=eq, yield_s=y, triax=triax, element_flag=flag,
        contact_force=cforce,
        work=state.work if dwork is None else state.work + dwork)
    return new_state, disp_e, tuple(s_c), tuple(e_c)


def make_sharded_step(model: LoweredModel, mesh: Mesh, n_steps: int = 1):
    """Jitted multi-device step: state -> state with element-sharded model.

    ``model.E`` must be divisible by the mesh size (set
    ``SolverConfig.elem_pad`` accordingly before lowering).  ``model``
    should already be through :func:`shard_model` (``shard_arrays`` does
    this); an unprepared model falls back to XLA gathers per shard.
    """
    n = mesh.devices.size
    if model.E % n:
        raise ValueError(f"E={model.E} not divisible by mesh size {n}")
    if model.plan_pos is not None and model.plan_pos.starts.ndim == 1:
        # single-chip plans: rebuild as stacked per-shard plans (S, n_tiles)
        model = shard_model(model, n)
    mspec = model_specs(model)
    sspec = state_specs()

    def body(m, s):
        lm = _local_model(m)
        # erosion-free decks: the global life mask is constant, so the
        # contact-path all_gather hoists out of the chunk loop
        flag_g0 = None
        if lm.pairs and not lm.fracture_enabled:
            flag_g0 = jax.lax.all_gather(s.element_flag, "dp", tiled=True)
        if lm.coord_e is not None:
            # disp_e-carry fast chunk path (mirrors solver run_chunk)
            from ..ops.element import gather_disp_e

            disp_e0 = gather_disp_e(lm, s.disp)
            stress_c0 = tuple(s.stress[c] for c in range(6))
            strain_c0 = tuple(s.strain[c] for c in range(6))
            dummy = jnp.zeros((0,), lm.dtype)
            s0 = s.replace(stress=dummy, strain=dummy)

            def stepb(_, carry):
                st, de, sc, ec = carry
                return _sharded_step_fast(lm, st, de, sc, ec, flag_g0)

            out, _, s_c, e_c = jax.lax.fori_loop(
                0, n_steps, stepb, (s0, disp_e0, stress_c0, strain_c0))
            keep = out.element_flag[None, None, :]  # deferred erosion zeroing
            out = out.replace(stress=jnp.where(keep, jnp.stack(s_c), 0.0),
                              strain=jnp.where(out.element_flag[None, :],
                                               jnp.stack(e_c), 0.0))
            if not lm.fracture_enabled:  # chunk-exit triax (step_fast)
                out = out.replace(triax=triax_stress(out.stress))
            return out
        return jax.lax.fori_loop(
            0, n_steps, lambda _, t: _sharded_step(lm, t, flag_g0), s)

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
    """Prepare per-shard plans and place model/state on the mesh with the
    canonical shardings."""
    model = shard_model(model, mesh.devices.size)
    mspec, sspec = model_specs(model), state_specs()

    def put(x, spec):
        if x is None or not hasattr(x, "ndim"):
            return x
        return jax.device_put(x, jax.sharding.NamedSharding(mesh, spec))

    model_s = jax.tree_util.tree_map(put, model, mspec)
    state_s = jax.tree_util.tree_map(put, state, sspec)
    return model_s, state_s
