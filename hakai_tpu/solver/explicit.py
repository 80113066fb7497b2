"""Explicit central-difference time integrator.

One whole time step of the reference loop (HAKAI_j.jl:487-951) as a pure
jitted ``step(model, state) -> state``:

  contact force -> central-difference displacement update -> boundary
  conditions (amplitude-scaled, applied to the *new* displacement,
  HAKAI_j.jl:585-617) -> kinematics update -> element stress + internal
  force -> triaxiality -> ductile erosion (mask update).

Running a simulation uses ``run()`` which drives jitted multi-step chunks
from the host and writes VTK frames on the fixed 100-frame schedule
(HAKAI_j.jl:471-480, 932-942).
"""
from __future__ import annotations

import sys
import time as _time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..core.lowering import LoweredModel
from ..core.state import SimState, init_state
from ..io.vtk import write_vtk
from ..ops.contact import contact_forces
from ..ops.element import assemble_internal_force, element_update, triax_stress
from ..ops.erosion import erode
from .output import node_fields


def amplitude_values(model: LoweredModel, current_time) -> jnp.ndarray:
    """Piecewise-linear amplitude interpolation (HAKAI_j.jl:586-600).

    Returns one value per amplitude table. Outside all segments the reference
    falls back to segment 1 (time_index stays 1), i.e. linear extrapolation of
    the first segment — reproduced by argmax's all-False default of 0.
    """
    T, V, n = model.amp_time, model.amp_value, model.amp_n
    L = T.shape[1]
    # unrolled first-match segment scan (amplitude tables are tiny); avoids
    # gathers entirely
    t0, t1 = T[:, 0], T[:, 1]
    v0, v1 = V[:, 0], V[:, 1]
    found = jnp.zeros(T.shape[0], bool)
    for j in range(L - 1):
        inside = ((current_time >= T[:, j]) & (current_time <= T[:, j + 1])
                  & (j < n - 1) & ~found)
        t0 = jnp.where(inside, T[:, j], t0)
        t1 = jnp.where(inside, T[:, j + 1], t1)
        v0 = jnp.where(inside, V[:, j], v0)
        v1 = jnp.where(inside, V[:, j + 1], v1)
        found = found | inside
    return v0 + (v1 - v0) * (current_time - t0) / (t1 - t0)


def apply_bc(model: LoweredModel, disp_new: jnp.ndarray, current_time):
    """Prescribe displacements: disp_new[dof] = value * amp (HAKAI_j.jl:612).

    BC entries were deduplicated last-wins at lowering, so the scatter has
    unique targets and is deterministic.
    """
    ampv = amplitude_values(model, current_time)
    # dense precomputed mask/value/amp-id (core/lowering.py): the previous
    # compact scatter rebuilt the dense arrays from the (K,) lists EVERY
    # step (~0.3 ms/step of loop-invariant work at 1M nodes that XLA never
    # hoisted out of the chunk loop).  The per-table amplitude factor is a
    # static select chain — A is tiny, and a gather of (3, N) int32 ids
    # through a 2-entry table would cost more than the selects.
    fac = jnp.ones(disp_new.shape, disp_new.dtype)
    for a in range(ampv.shape[0]):
        fac = jnp.where(model.bcd_amp == a, ampv[a], fac)
    return jnp.where(model.bcd_mask, model.bcd_value * fac, disp_new)


def _integrate(model: LoweredModel, state: SimState, activity=None):
    """Contact + central difference + BCs (HAKAI_j.jl:497-653).
    Returns (t, disp_new, velo, contact_force, dwork) where dwork is the
    per-step [dW_ext, dW_int] increment pair (None unless
    config.energy_check)."""
    dt = jnp.asarray(model.dt, model.dtype)
    t = state.t + 1
    current_time = t.astype(model.dtype) * dt

    external = jnp.zeros_like(state.disp)
    cforce = state.contact_force
    if model.pairs:
        cforce = contact_forces(model, state, activity=activity)
        external = external + cforce

    # central difference (HAKAI_j.jl:562-567)
    a1 = model.diag_M / dt**2                       # (N,)
    a2 = model.diag_M * model.config.damping_C / (2.0 * dt)
    numer = (external - state.Q
             + a1 * (2.0 * state.disp - state.disp_pre)
             + a2 * state.disp_pre)
    disp_new = numer / (a1 + a2)

    disp_new = apply_bc(model, disp_new, current_time)
    disp_new = jnp.where(model.node_exists, disp_new, 0.0)
    velo = (disp_new - state.disp) / dt
    dwork = None
    if model.config.energy_check:
        # Discrete energy balance of the central-difference update: with the
        # midpoint increment du_mid = (u_new - u_prev)/2 the identity
        #   dKE = (F_ext + F_c - Q) . du_mid
        # holds EXACTLY in real arithmetic (dKE telescopes the half-step
        # kinetic energies 0.5*M*((u_new-u)/dt)^2), where F_c is the
        # constraint force realizing the prescribed motion at BC dofs.
        # The accumulated residual KE - KE0 - W_ext + W_int is therefore
        # pure roundoff — a direct detector of roundoff-energy injection.
        du_mid = 0.5 * (disp_new - state.disp_pre)
        f_c = jnp.where(model.bcd_mask, (a1 + a2) * disp_new - numer, 0.0)
        dw_ext = jnp.sum((external + f_c) * du_mid)
        dw_int = jnp.sum(state.Q * du_mid)
        dwork = jnp.stack([dw_ext, dw_int])
    return t, disp_new, velo, cforce, dwork


def _finish(model: LoweredModel, state: SimState, t, disp_new, velo, cforce,
            res) -> SimState:
    """Assembly + triaxiality + erosion + state swap (HAKAI_j.jl:662-804)."""
    Q = assemble_internal_force(model, res.Qe).astype(model.dtype)
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


def _acc_work(state: SimState, dwork):
    return state.work if dwork is None else state.work + dwork


def step(model: LoweredModel, state: SimState) -> SimState:
    t, disp_new, velo, cforce, dwork = _integrate(model, state)
    # element/contact math runs in edtype (f32 in mixed mode); the kinematic
    # difference d_disp is taken in the (possibly wider) nodal dtype FIRST so
    # no cancellation noise enters the strain increments
    edt = model.edtype
    res = element_update(model, (model.coord + disp_new).astype(edt),
                         (disp_new - state.disp).astype(edt),
                         state.stress, state.strain, state.eq_ps,
                         state.yield_s, state.element_flag)
    out = _finish(model, state, t, disp_new, velo, cforce, res)
    return out.replace(work=_acc_work(state, dwork))


def _next_activity(model: LoweredModel, activity, flag, changed):
    """Chunk-carried contact activity masks: recompute only when erosion
    actually deleted something this step (``changed``), else reuse.  Masks
    are pure functions of ``flag`` (ops.contact.contact_activity) and flag's
    sole writer is erosion, so the cached masks are bitwise-identical to a
    per-step recompute; on most steps of a fracture deck nothing dies and
    the O(inventory) flag gathers are skipped (VERDICT #4;
    add_surface_triangle, HAKAI_j.jl:2167-2245, runs per-step in the ref)."""
    if activity is None:
        return None
    from ..ops.contact import contact_activity
    return jax.lax.cond(changed,
                        lambda f: contact_activity(model, f),
                        lambda _: activity, flag)


def _init_activity(model: LoweredModel, flag):
    """Initial chunk-carry activity — None unless some pair actually has
    dynamic (flag-dependent) masks."""
    if not model.pairs or not model.fracture_enabled:
        return None
    if all(p.static_activity for p in model.pairs):
        return None
    from ..ops.contact import contact_activity
    return contact_activity(model, flag)


def step_fast(model: LoweredModel, state: SimState, disp_e_prev,
              stress_c, strain_c, activity=None):
    """Step variant for the chunk loop: carries the gathered element-node
    displacements (only the new displacement is gathered, 3 channels instead
    of 6) and the stress/strain state as 6-component tuples (avoids
    re-materializing (6,8,E) stacks every step).

    In mixed mode the carry stays f64: both kinematic differences (the du
    increment and the node-0 centering) cancel in f64 *before* the cast to
    the f32 element dtype, so no cancellation noise enters the strain
    increments — same contract as the generic ``step``.

    (A 24×(E,) rank-1 row carry with lazy kinematics was measured at 1M and
    131k, round 3: XLA conserves the fusion-boundary traffic either way —
    1M 15.9→15.8 ms, 131k −7%.  The (3,8,E) carry stays.)"""
    from ..ops.element import element_core_c, element_kinematics, \
        gather_disp_e
    from ..ops.erosion import erosion_delete_mask

    edt = model.edtype
    t, disp_new, velo, cforce, dwork = _integrate(model, state, activity)
    disp_e = gather_disp_e(model, disp_new)
    pos_r, du_r = element_kinematics(model.coord_e, disp_e, disp_e_prev,
                                     edt, model.E)
    qe, s_c, e_c, eq, y, triax = element_core_c(
        model, pos_r, du_r, stress_c, strain_c, state.eq_ps, state.yield_s,
        state.element_flag, pre_centered=True)
    if not model.fracture_enabled:
        # triax is only consumed by erosion (fracture decks) and frame
        # output: on fracture-free decks run_chunk computes it ONCE at
        # chunk exit from the final stress (identical values — same pure
        # function of the same state) instead of every step (~0.8 ms/step
        # of re-read fusions at 1M elements).
        triax = state.triax
    elif triax is None:                  # VMEM-resident regime (see element.py)
        from ..ops.element import triax_components
        triax = triax_components(s_c)
    Q = assemble_internal_force(model, qe).astype(model.dtype)
    # Deferred erosion zeroing: dead elements keep stale stress/strain in the
    # chunk carry (the math passes old state through for ~alive and every
    # consumer masks by flag); run_chunk masks the state once at chunk exit
    # instead of 12 (8,E) select passes per step.  triax is masked with the
    # PRE-erosion flag so a just-deleted element keeps its final stale triax
    # for exactly one step, as the reference does (erosion zeroes only
    # stress/strain, HAKAI_j.jl:744-757; triax recomputes to 0 next step).
    if model.fracture_enabled:
        # dead elements carry stale stress under deferred zeroing; the
        # reference's triax for them is 0 (recomputed from zeroed stress)
        triax = jnp.where(state.element_flag[None, :], triax, 0.0)
    flag = state.element_flag
    if model.fracture_enabled:
        flag, delete = erosion_delete_mask(model, eq, triax, flag)
        activity = _next_activity(model, activity, flag, delete.any())
    new_state = state.replace(
        t=t, disp=disp_new, disp_pre=state.disp, velo=velo, Q=Q,
        eq_ps=eq, yield_s=y, triax=triax, element_flag=flag,
        contact_force=cforce, work=_acc_work(state, dwork))
    return new_state, disp_e, tuple(s_c), tuple(e_c), activity


def step_fast_packed(model: LoweredModel, state: SimState, disp_e_prev, P,
                     activity=None):
    """disp_e-carry step for the fused Pallas element kernel: the whole
    Gauss-point state travels as one packed (72, E) array ``P`` (see
    ops/element_pallas.element_core_packed), minimizing the kernel's
    per-grid-step DMA issues."""
    from ..ops.element import assemble_internal_force, gather_disp_e
    from ..ops.element_pallas import packed_element_step

    E = model.E
    t, disp_new, velo, cforce, dwork = _integrate(model, state, activity)
    disp_e = gather_disp_e(model, disp_new)
    P_new, qe, triax, flag = packed_element_step(
        model, model.coord_e, disp_e, disp_e_prev, P, state.element_flag)
    Q = assemble_internal_force(model, qe.reshape(3, 8, E)
                                ).astype(model.dtype)
    if triax is None:
        triax = state.triax              # chunk-exit triax (see step_fast)
    if activity is not None:
        # the packed kernel folds erosion in; detect a deletion by diffing
        # the life mask (one (E,) bool pass — cheap next to the masks)
        changed = jnp.any(flag != state.element_flag)
        activity = _next_activity(model, activity, flag, changed)
    new_state = state.replace(
        t=t, disp=disp_new, disp_pre=state.disp, velo=velo, Q=Q,
        triax=triax, element_flag=flag, contact_force=cforce,
        work=_acc_work(state, dwork))
    return new_state, disp_e, P_new, activity


def _interleave_nodal(x, edtype):
    """(3, N) nodal field -> (N/128, 3, 128) channel-interleaved layout for
    the fused-gather kernel's window DMAs (one contiguous copy per tile)."""
    N = x.shape[1]
    return x.astype(edtype).reshape(3, N // 128, 128).transpose(1, 0, 2)


def step_fast_packed_fused(model: LoweredModel, state: SimState, disp_il_prev,
                           P, activity=None):
    """Fused-gather variant of step_fast_packed: the element kernel resolves
    disp/dprev element copies from nodal windows (GatherPhysPlan), so no
    (3, 8, E) disp_e array is ever materialized or carried — the kernel is
    DMA-bandwidth bound and those streams were 200 MB/step at 1M.
    Pure-f32 decks only (the carry IS the nodal field)."""
    from ..ops.element import assemble_internal_force
    from ..ops.element_pallas import packed_element_step_fused

    E = model.E
    t, disp_new, velo, cforce, dwork = _integrate(model, state, activity)
    disp_il = _interleave_nodal(disp_new, model.edtype)
    P_new, qe, triax, flag = packed_element_step_fused(
        model, P, state.element_flag, disp_il, disp_il_prev)
    Q = assemble_internal_force(model, qe.reshape(3, 8, E)
                                ).astype(model.dtype)
    if triax is None:
        triax = state.triax
    if activity is not None:
        changed = jnp.any(flag != state.element_flag)
        activity = _next_activity(model, activity, flag, changed)
    new_state = state.replace(
        t=t, disp=disp_new, disp_pre=state.disp, velo=velo, Q=Q,
        triax=triax, element_flag=flag, contact_force=cforce,
        work=_acc_work(state, dwork))
    return new_state, disp_il, P_new, activity


def pack_gauss_state(state: SimState, E: int):
    """(72, E) packed Gauss-point state: stress 0:48, GP-mean strain 48:54,
    zero pad 54:56 (keeps eq/yield on sublane-tile boundaries inside the
    Pallas kernels), eq_ps 56:64, yield 64:72."""
    dt = state.stress.dtype
    return jnp.concatenate(
        [state.stress.reshape(48, E), state.strain,
         jnp.zeros((2, E), dt), state.eq_ps, state.yield_s], axis=0)


def unpack_gauss_state(state: SimState, P, E: int) -> SimState:
    return state.replace(stress=P[:48].reshape(6, 8, E),
                         strain=P[48:54],
                         eq_ps=P[56:64], yield_s=P[64:72])


@partial(jax.jit, static_argnums=(2,))
def run_chunk(model: LoweredModel, state: SimState, n_steps: int) -> SimState:
    # Chunk-loop unrolling lets XLA fuse across steps; cross-step fusion
    # makes a step's bits depend on its position inside an unroll group,
    # so explicit unroll factors trade bitwise-exact resume for (possible)
    # throughput.  Measured on the deck it was designed for it LOSES (see
    # below), so the default never unrolls.
    unroll = model.config.chunk_unroll
    if unroll == 0:                                     # auto = off
        # Measured on TPU (benchmarks/sweep_unroll_n22k.py, car-crash-N22k
        # mixed): U=1 1255 us/step, U=2 3183, U=4 2195, U=8 1717 — XLA's
        # cross-step fusion of the unrolled body is a net loss even on the
        # launch-bound deck the unroll was built for, so auto never unrolls.
        unroll = 1
    if model.E > 32768:
        unroll = 1
    # disp_e-carry fast path; in mixed mode the carry is f64 (differences
    # cancel before the f32 cast inside step_fast)
    if model.coord_e is not None:
        from ..ops.element import gather_disp_e, pallas_core_ok

        act0 = _init_activity(model, state.element_flag)
        if pallas_core_ok(model, model.E, model.edtype):
            import os
            E = model.E
            P0 = pack_gauss_state(state, E)
            dummy = jnp.zeros((0,), model.dtype)
            s0 = state.replace(stress=dummy, strain=dummy, eq_ps=dummy,
                               yield_s=dummy)
            fused = (model.plan_gphys is not None
                     and model.dtype == model.edtype
                     and model.config.fused_gather != "off"
                     and os.environ.get("HAKAI_FUSED_GATHER", "1") != "0")
            if fused:
                il0 = _interleave_nodal(state.disp, model.edtype)
                step_fn = step_fast_packed_fused
            else:
                il0 = gather_disp_e(model, state.disp)
                step_fn = step_fast_packed
            out, _, P, _ = jax.lax.fori_loop(
                0, n_steps,
                lambda _, c: step_fn(model, c[0], c[1], c[2], c[3]),
                (s0, il0, P0, act0), unroll=unroll)
            P = jnp.concatenate(           # deferred erosion zeroing
                [jnp.where(out.element_flag[None, :], P[:56], 0.0), P[56:]],
                axis=0)
            if not model.fracture_enabled:   # chunk-exit triax (step_fast)
                from ..ops.element import triax_components
                out = out.replace(triax=triax_components(
                    [P[8 * c:8 * (c + 1)] for c in range(6)]))
            return unpack_gauss_state(out, P, E)
        stress_c0 = tuple(state.stress[c] for c in range(6))
        strain_c0 = tuple(state.strain[c] for c in range(6))
        dummy = jnp.zeros((0,), model.dtype)
        s0 = state.replace(stress=dummy, strain=dummy)
        disp_e0 = gather_disp_e(model, state.disp)

        def body(_, carry):
            s, de, sc, ec, act = carry
            return step_fast(model, s, de, sc, ec, act)

        out, _, s_c, e_c, _ = jax.lax.fori_loop(
            0, n_steps, body, (s0, disp_e0, stress_c0, strain_c0, act0),
            unroll=unroll)
        keep = out.element_flag[None, None, :]   # deferred erosion zeroing
        out = out.replace(stress=jnp.where(keep, jnp.stack(s_c), 0.0),
                          strain=jnp.where(out.element_flag[None, :],
                                           jnp.stack(e_c), 0.0))
        if not model.fracture_enabled:       # chunk-exit triax (step_fast)
            from ..ops.element import triax_components
            out = out.replace(triax=triax_components(
                [out.stress[c] for c in range(6)]))
        return out
    return jax.lax.fori_loop(0, n_steps, lambda _, s: step(model, s), state,
                             unroll=unroll)


def _deck_order_frame(model: LoweredModel, disp, velo, flag, nd):
    """Map internal (possibly RCM-renumbered) arrays back to the deck's
    original node/element order for output."""
    nN, nE = model.n_node, model.n_element
    coord = np.asarray(model.coord)
    elem = np.asarray(model.elem)
    flag = np.asarray(flag)
    disp = np.asarray(disp)
    velo = np.asarray(velo)
    nd_np = type(nd)(*[np.asarray(x) for x in nd])
    if model.node_new2old is None:
        return coord, elem, flag, disp, velo, nd_np
    n2o = np.asarray(model.node_new2old)
    e2o = np.asarray(model.elem_new2old)

    def nodes_back(a):
        out = np.zeros(a.shape[:-1] + (a.shape[-1],), a.dtype)
        out[..., n2o] = a[..., :nN]
        return out

    coord_o = nodes_back(coord)
    disp_o = nodes_back(disp)
    velo_o = nodes_back(velo)
    nd_o = type(nd)(*[nodes_back(np.asarray(x)) for x in nd_np])
    elem_o = np.zeros_like(elem)
    elem_o[:, e2o] = n2o[elem[:, :nE]]
    flag_o = np.zeros_like(flag)
    flag_o[e2o] = flag[:nE]
    return coord_o, elem_o, flag_o, disp_o, velo_o, nd_o


def run(model: LoweredModel, state: SimState | None = None,
        verbose: bool = True, write_output: bool = True,
        devices: int | None = None, halo: int | None = None,
        resume_halo: str | None = None):
    """Whole simulation: time_num steps, 100 VTK frames (HAKAI_j.jl:471-480).

    ``devices`` > 1 runs element-sharded over a ``jax.sharding.Mesh`` of
    that many devices (parallel/sharding.py) with per-shard Pallas gather
    plans; the assembly psum is a disjoint lane union (no reduction-order
    error), so output frames match a single-device run with byte-identical
    structure and float fields agreeing to ~1e-6 relative (XLA contracts
    FMAs shape-dependently, which can flip the last printed ASCII digit —
    the contract tests/test_sharding.py::test_run_devices_vtk_identical
    asserts).  ``halo`` > 1 instead uses the node-sharded
    halo-exchange decomposition (parallel/halo.py) — the pod-scale path
    where node state is owned by shards and only halo rows (plus the
    compact contact-node block on contact decks) ride the interconnect.

    Returns the final state.
    """
    from ..utils.metrics import MetricsWriter

    cfg = model.config
    state = state if state is not None else init_state(model)
    # multi-host (jax.distributed): every process runs the same loop and
    # participates in every collective (step chunks, gather_state views);
    # only process 0 touches the filesystem or the console
    proc0 = jax.process_index() == 0
    verbose = verbose and proc0

    view = None                 # sharded-state -> SimState for host output
    frame_data = None           # state -> (disp, velo, flag, NodeData) host
    save_ckpt = None            # (path, state) -> writes a checkpoint
    ckpt_all_procs = False      # multi-process shard-major checkpoints are
    #                             written by EVERY process (one file each)
    if halo is not None and halo > 1:
        from functools import partial as _partial

        from ..parallel.halo import (gather_state, init_halo_state,
                                     load_halo_checkpoint, make_halo_frame,
                                     make_halo_step, partition,
                                     partition_state, save_halo_checkpoint)
        from ..parallel.sharding import make_mesh
        hm = partition(model, halo)
        mesh = make_mesh(halo)
        if resume_halo is not None:
            # shard-major checkpoint resume (no single-chip round trip)
            state = load_halo_checkpoint(resume_halo, hm, mesh=mesh)
        else:
            # checkpoint resume: scatter the restored SimState into shards
            state = (partition_state(hm, state) if int(state.t) > 0
                     else init_halo_state(hm))
        steppers = {}

        def step_chunk(s, n):
            if n not in steppers:
                steppers[n] = make_halo_step(hm, mesh, n_steps=n)
            return steppers[n](s)

        view = _partial(gather_state, hm)
        # pod-scale frames/checkpoints never materialize the gathered
        # element state on host: node-averaged fields are computed on
        # device per shard, checkpoints round-trip shard-major
        _frame = make_halo_frame(hm, mesh)

        def frame_data(s):
            disp, velo, nd, flag = _frame(s)
            return disp, velo, flag, nd

        def save_ckpt(path, s):
            # shard-major in both layouts: multi-process runs write one
            # per-process shard file (EVERY process calls this — see the
            # ckpt_all_procs gate below), so no host ever materializes the
            # global element state
            save_halo_checkpoint(path, hm, s, mesh=mesh)
        ckpt_all_procs = jax.process_count() > 1
    elif devices is not None and devices > 1:
        from ..parallel.sharding import (make_mesh, make_sharded_step,
                                         shard_arrays)
        mesh = make_mesh(devices)
        model_s, state = shard_arrays(model, state, mesh)
        steppers = {}

        def step_chunk(s, n):
            if n not in steppers:
                steppers[n] = make_sharded_step(model_s, mesh, n_steps=n)
            return steppers[n](s)
    else:
        def step_chunk(s, n):
            return run_chunk(model, s, n)

    time_num = model.time_num
    output_num = cfg.output_num
    d_out = max(time_num // output_num, 1)
    n_frames = time_num // d_out if time_num else 0
    metrics = MetricsWriter(cfg.metrics_path if proc0 else None)

    if view is None:
        def view(s):
            return s

    if frame_data is None:
        def frame_data(s):
            sv = view(s)
            nd = node_fields(model, sv.stress, sv.strain, sv.eq_ps, sv.triax)
            return sv.disp, sv.velo, sv.element_flag, nd

    if save_ckpt is None:
        def save_ckpt(path, s):
            from ..utils.checkpoint import save_checkpoint
            save_checkpoint(path, view(s))

    frame_times = []
    if write_output:
        di_, ve_, fl_, nd = frame_data(state)
        co, el, fl, di, ve, nd_o = _deck_order_frame(model, di_, ve_, fl_, nd)
        if proc0:
            write_vtk(0, cfg.out_dir, co, el, fl, di, ve, nd_o,
                      model.n_node, model.n_element)
        frame_times.append((0, float(int(state.t)) * model.dt))

    t0 = _time.time()
    # jnp (not np.asarray) so multi-process global arrays reduce
    # on-device to a replicated scalar instead of failing host copy
    alive_prev = int(jnp.sum(state.element_flag))
    done = int(state.t)          # resume-aware (checkpoint carries t)
    i_out = done // d_out + 1
    while done < time_num:
        n = min(d_out, time_num - done)
        state = step_chunk(state, n)
        done += n
        if cfg.check_nan and not bool(jnp.isfinite(state.disp).all()):
            raise FloatingPointError(f"NaN/Inf in displacement at step {done}")
        if cfg.energy_check and cfg.energy_abort_rel > 0:
            from ..utils.metrics import energy_guard, halo_step_metrics
            if halo is not None and halo > 1:
                rel = float(halo_step_metrics(hm, state)["energy_rel_error"])
            else:
                rel = float(energy_guard(model, state))
            if rel > cfg.energy_abort_rel:
                raise FloatingPointError(
                    f"energy balance diverged at step {done}: "
                    f"|KE - KE0 - W_ext + W_int| = {rel:.3e} of the energy "
                    f"scale (> {cfg.energy_abort_rel:.3e}) — roundoff energy "
                    "injection; re-run with --precision f64 or mixed")
        alive = int(jnp.sum(state.element_flag))
        if verbose and alive != alive_prev:
            print(f"Element deleted:{alive}/{model.n_element}")
            alive_prev = alive
        if verbose:
            sys.stdout.write(f"\r{done * model.dt:.4e} / {model.end_time:.4e}     ")
            sys.stdout.flush()
        if cfg.metrics_path is not None:
            if halo is not None and halo > 1:
                # device-side sharded reductions — no host gather_state
                from ..utils.metrics import halo_step_metrics
                metrics.record_raw(halo_step_metrics(hm, state), model,
                                   done, _time.time() - t0)
            else:
                metrics.record(model, view(state), done, _time.time() - t0)
        if write_output and done % d_out == 0 and i_out <= n_frames:
            di_, ve_, fl_, nd = frame_data(state)
            co, el, fl, di, ve, nd_o = _deck_order_frame(model, di_, ve_,
                                                         fl_, nd)
            if proc0:
                write_vtk(i_out, cfg.out_dir, co, el, fl, di, ve, nd_o,
                          model.n_node, model.n_element)
            frame_times.append((i_out, done * model.dt))
            if (cfg.checkpoint_every and i_out % cfg.checkpoint_every == 0
                    and (proc0 or ckpt_all_procs)):
                save_ckpt(cfg.checkpoint_path
                          or f"{cfg.out_dir}/ckpt_{i_out:03d}.npz", state)
            i_out += 1
    metrics.close()
    if write_output and frame_times and proc0:
        from ..io.vtk import write_pvd
        write_pvd(cfg.out_dir, frame_times)   # ParaView time-series index
    if verbose:
        print(f"\nwall: {_time.time() - t0:.2f}s for {time_num} steps")
    return view(state)
