"""Halo-exchange domain decomposition — node-sharded scaling for pod-size
meshes.

The replicated-node ``sharding.py`` path all-reduces the full (3, N) internal
force every step; fine up to ~1M nodes, but pod-scale meshes (10M+ elements,
BASELINE.json config 5) need node state *owned* by shards.  This module
implements the FEM analogue of ring/context parallelism (SURVEY.md §5
long-context row):

  * nodes are partitioned contiguously; elements are assigned to the shard
    owning their first node;
  * with a bandwidth-ordered mesh every element on shard d touches only
    nodes in [d*No - H, (d+1)*No + H) for a small static halo width H
    (verified at lowering);
  * per step each shard receives its neighbours' boundary rows
    (``lax.ppermute`` over the ring), runs the element kernel on the local
    window, and sends ghost-row force contributions back to their owners —
    two H-row exchanges per step instead of an N-row all-reduce;
  * the node integrator runs on owned rows only;
  * the element hot loop uses the same per-shard Pallas gather plans and
    disp_e-carry formulation as the single-chip fast path (window-local
    plans built at partition time);
  * contact (HAKAI_j.jl:2248-2706) exchanges only the *contact-relevant*
    node rows: the static union of every pair's candidate/triangle/surface
    node ids is all-gathered as a compact (6, Ncs)-per-shard block — an
    O(surface) exchange, not O(N) — and the narrow phase is partitioned
    round-robin over the mesh axis exactly as parallel/sharding.py does.
"""
from __future__ import annotations

import dataclasses
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..core.lowering import LoweredModel, _dup_lanes
from ..core.state import SimState
from ..ops.contact import contact_forces_pv
from ..ops.element import (assemble_internal_force, element_update,
                           element_core_c, gather_disp_e, triax_stress)
from ..ops.erosion import erode, erosion_delete_mask
from ..ops.gather_pallas import (plan_local, plan_sharded_assemble_phys,
                                 plan_sharded_gather)
from ..solver.explicit import amplitude_values

# fields that stay replicated across the mesh (static index maps every
# device needs in full, e.g. to rebuild global views from all_gathers)
_REPL_FIELDS = ("cn_inv", "eg_inv")


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class HaloModel:
    """Shard-major lowered arrays for the halo step.

    Leading axis = shard (sharded over 'dp' by shard_map); windows are the
    owned node range extended by H on both sides.
    """
    n_shards: int = dataclasses.field(metadata=dict(static=True), default=0)
    No: int = dataclasses.field(metadata=dict(static=True), default=0)  # owned nodes/shard
    H: int = dataclasses.field(metadata=dict(static=True), default=0)   # halo rows
    El: int = dataclasses.field(metadata=dict(static=True), default=0)  # elems/shard
    h_asm_vl: int = dataclasses.field(metadata=dict(static=True), default=0)
    base: LoweredModel = None          # original (arrays unused in hot loop)

    elem_w: jnp.ndarray = None         # (S, 8, El) window-local node ids
    elem_gid: jnp.ndarray = None       # (S, El) global element ids (-1 pad)
    elem_alive0: jnp.ndarray = None    # (S, El) bool
    mat_id: jnp.ndarray = None         # (S, El)
    G_e: jnp.ndarray = None            # (S, El)
    lam_e: jnp.ndarray = None          # (S, El)
    has_plastic_e: jnp.ndarray = None  # (S, El)
    yield0_e: jnp.ndarray = None       # (S, El)
    vol_e: jnp.ndarray = None          # (S, El) initial element volume
    diag_M: jnp.ndarray = None         # (S, No) owned nodal mass
    coord: jnp.ndarray = None          # (S, 3, No) owned coordinates
    node_exists: jnp.ndarray = None    # (S, No)
    bc_mask: jnp.ndarray = None        # (S, 3, No) prescribed-dof mask
    bc_value: jnp.ndarray = None       # (S, 3, No)
    bc_amp: jnp.ndarray = None         # (S, 3, No) int32 amplitude id (-1 none)
    velo0: jnp.ndarray = None          # (S, 3, No)
    # --- element fast path (window-local Pallas plans; None = generic) ---
    coord_e: jnp.ndarray = None        # (S, 3, 8, El) centered on node 0
    h_plan_pos: object = None          # stacked per-shard (3,W)->(3,8El) plan
    h_plan_asm: object = None          # stacked per-shard assembly-lane plan
    h_plan_asm2: object = None         # stacked per-shard phys-layout
    #                                    assembly plan (HBM-spill regime)
    h_asm_mask: jnp.ndarray = None     # (S, VL, W) bool
    # --- contact: compact exchange of contact-relevant node rows ---
    cn_local: jnp.ndarray = None       # (S, Ncs) int32 owned-row id (0 pad)
    cn_mask: jnp.ndarray = None        # (S, Ncs) bool
    cn_inv: jnp.ndarray = None         # (N,) int32 -> slot in (S*Ncs) (+pad)
    eg_inv: jnp.ndarray = None         # (E,) int32 -> slot in (S*El) (+pad)


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class HaloState:
    t: jnp.ndarray
    disp: jnp.ndarray       # (S, 3, No)
    disp_pre: jnp.ndarray
    velo: jnp.ndarray
    Q: jnp.ndarray          # (S, 3, No)
    stress: jnp.ndarray     # (S, 6, 8, El)
    strain: jnp.ndarray     # (S, 6, El) GP-mean accumulator
    eq_ps: jnp.ndarray      # (S, 8, El)
    yield_s: jnp.ndarray
    triax: jnp.ndarray
    element_flag: jnp.ndarray  # (S, El)
    work: jnp.ndarray       # (S, 2) per-shard partial [W_ext, W_int] sums
    #   (owned rows only — disjoint over shards, so the global accumulator
    #   is the shard sum; see solver.explicit._integrate)

    def replace(self, **kw):
        return dataclasses.replace(self, **kw)


def _round_up(x: int, m: int) -> int:
    return int(-(-x // m) * m)


def partition(model: LoweredModel, n_shards: int) -> HaloModel:
    """Numpy lowering of a LoweredModel into shard-major halo arrays."""
    N, E = model.N, model.E
    if N % n_shards:
        raise ValueError(f"padded node count {N} not divisible by {n_shards}")
    No = N // n_shards
    elem = np.asarray(model.elem)               # (8, E)
    exists = np.asarray(model.elem_exists)

    owner = np.clip(elem.min(axis=0) // No, 0, n_shards - 1)    # (E,)
    # padding elements carry no state and are pure ballast — leave them
    # unassigned (they resolve through eg_inv's False pad slot and
    # gather_state's zero fill) instead of parking them all on one shard,
    # which made every shard pay the last shard's padded element count
    owner = np.where(exists, owner, -1)
    El = 0
    shard_elems = []
    for d in range(n_shards):
        ids = np.nonzero(owner == d)[0]
        shard_elems.append(ids)
        El = max(El, len(ids))
    El = max(-(-El // 8) * 8, 8)

    # halo width: max overshoot of element nodes past the owned range
    # (real elements only — padding rows are all-zero node ids parked on
    # the last shard and would blow the width)
    H = 0
    for d, ids in enumerate(shard_elems):
        ids_r = ids[exists[ids]]
        if len(ids_r) == 0:
            continue
        sub = elem[:, ids_r]
        lo, hi = d * No, (d + 1) * No
        H = max(H, int(max(lo - sub.min(), 0)), int(max(sub.max() - (hi - 1), 0)))
    if H > No:
        raise ValueError(f"halo width {H} exceeds shard size {No}: "
                         "mesh ordering too scattered for halo decomposition")
    H = max(H, 1)

    # --- window-local Pallas plans (the element hot loop's gathers).
    # Constraints: gather-plan tiles must not straddle index segments, so
    # El must be a tile multiple (slot-major element gather) and the window
    # W = No + 2H a tile multiple (lane-major assembly gather).
    tile = 2048
    use_plans = (model.plan_pos is not None and El >= tile // 2
                 and model.config.gather_mode != "xla")
    if use_plans:
        El = _round_up(El, tile)
        rem = (No + 2 * H) % tile
        H2 = H + (tile - rem) // 2 if rem else H
        if H2 > No:
            use_plans = False       # window padding would pass shard size
        else:
            H = H2

    S = n_shards
    W = No + 2 * H
    elem_w = np.zeros((S, 8, El), np.int64)
    elem_gid = np.full((S, El), -1, np.int64)
    alive0 = np.zeros((S, El), bool)
    mat_id = np.zeros((S, El), np.int64)
    fields = {k: np.zeros((S, El))
              for k in ("G_e", "lam_e", "yield0_e", "vol_e")}
    hasp = np.zeros((S, El), bool)
    g_mat = np.asarray(model.mat_id)
    g_G = np.asarray(model.G_e)
    g_lam = np.asarray(model.lam_e)
    g_y0 = np.asarray(model.yield0_e)
    g_vol = np.asarray(model.vol_e)
    for d, ids in enumerate(shard_elems):
        k = len(ids)
        if k == 0:
            continue
        # window-local = global - (d*No - H); padding elements (dead,
        # masked by alive0) point at window slot 0
        ew = elem[:, ids] - (d * No - H)
        elem_w[d, :, :k] = np.where(exists[ids][None, :], ew, 0)
        elem_gid[d, :k] = ids
        alive0[d, :k] = exists[ids]
        mat_id[d, :k] = g_mat[ids]
        fields["G_e"][d, :k] = g_G[ids]
        fields["lam_e"][d, :k] = g_lam[ids]
        fields["yield0_e"][d, :k] = g_y0[ids]
        fields["vol_e"][d, :k] = g_vol[ids]
        hasp[d, :k] = np.asarray(model.has_plastic_e)[ids]

    def shard_nodes(a):     # (..., N) -> (S, ..., No)
        a = np.asarray(a)
        a = np.moveaxis(a.reshape(a.shape[:-1] + (S, No)), -2, 0)
        return np.ascontiguousarray(a)

    # dense BC fields per owned node
    bc_mask = np.zeros((3, N), bool)
    bc_value = np.zeros((3, N))
    bc_amp = np.full((3, N), -1, np.int64)
    bm = np.asarray(model.bc_mask)
    for k in range(len(bm)):
        if bm[k]:
            a, nd = int(model.bc_axis[k]), int(model.bc_node[k])
            bc_mask[a, nd] = True
            bc_value[a, nd] = float(model.bc_value[k])
            bc_amp[a, nd] = int(model.bc_amp[k])

    # --- per-shard window plans (fast path) ---
    coord_np = np.asarray(model.coord)
    coord_e_s = h_plan_pos = h_plan_asm = h_plan_asm2 = h_asm_mask_j = None
    h_asm_vl = 0
    if use_plans:
        idx_list, val_list = [], []
        lanes_per_shard = []
        for d in range(S):
            idx_list.append(elem_w[d].reshape(-1))
            val_list.append(np.tile(alive0[d], 8))
            al = alive0[d]
            pos = np.nonzero(al)[0]
            # slot-pure lanes: one _dup_lanes call per local corner keeps
            # every lane's source positions inside a single El-wide slot
            # segment.  Mixed-slot lanes (one _dup_lanes over all corners)
            # made window-boundary nodes' contributions jump up to 7*El in
            # source space, blowing the uniform per-shard plan's tile
            # windows (w_rows ~12k >> 64) and dropping the whole halo
            # assembly to the XLA fallback at pod scale.
            ls = []
            for slot in range(8):
                ls += _dup_lanes(elem_w[d][slot, al], slot * El + pos, W)
            lanes_per_shard.append(ls)
        # subgroups=16 / cap 768: DMA-issue amortization in the HBM-spill
        # regime, same knobs as the single-chip plan (core/lowering.py)
        h_plan_pos = plan_sharded_gather(idx_list, W, valid_per_shard=val_list,
                                         subgroups=16, m_w_cap=768)
        h_asm_vl = max((len(ls) for ls in lanes_per_shard), default=1)
        h_asm_vl = max(h_asm_vl, 1)
        asm_idx, asm_val, asm_mask_s = [], [], []
        for ls in lanes_per_shard:
            li = [l[0] for l in ls] + [np.zeros(W, np.int64)] * (h_asm_vl - len(ls))
            lm = [l[1] for l in ls] + [np.zeros(W, bool)] * (h_asm_vl - len(ls))
            asm_idx.append(np.concatenate(li))
            asm_val.append(np.concatenate(lm))
            asm_mask_s.append(np.stack(lm))
        h_plan_asm = plan_sharded_gather(asm_idx, 8 * El,
                                         valid_per_shard=asm_val)
        h_asm_mask_j = jnp.asarray(np.stack(asm_mask_s))
        # physical-layout assembly plan for the HBM-spill regime (the
        # single-chip path's ~2 ms/step win at 1M elements; engaged by
        # assemble_internal_force when El >= its min-E gate on TPU — skip
        # the (numpy-heavy) build below that size)
        from ..ops.element import _PHYS_ASM_MIN_E
        if El >= _PHYS_ASM_MIN_E:
            h_plan_asm2 = plan_sharded_assemble_phys(
                [elem_w[d] for d in range(S)],
                [len(ids) for ids in shard_elems], El, W)
        # centered element-node coordinates for the disp_e-carry fast path
        ce = np.zeros((S, 3, 8, El))
        for d, ids in enumerate(shard_elems):
            k = len(ids)
            if k == 0:
                continue
            ep = coord_np[:, elem[:, ids]]
            ce[d, :, :, :k] = ep - ep[:, 0][:, None, :]
        coord_e_s = jnp.asarray(ce, model.edtype)

    # --- contact: static compact exchange sets ---
    cn_local = cn_mask_j = cn_inv = eg_inv = None
    if model.pairs:
        parts = []
        for p in model.pairs:
            parts.append(np.asarray(p.tri_nodes).reshape(-1))
            parts.append(np.asarray(p.cand_nodes))
            parts.append(np.asarray(p.jnode_nodes))
        cnodes = np.unique(np.concatenate(parts))
        cnodes = cnodes[(cnodes >= 0) & (cnodes < N)]
        Ncs = 0
        per_shard = []
        for d in range(S):
            own = cnodes[(cnodes >= d * No) & (cnodes < (d + 1) * No)]
            per_shard.append(own)
            Ncs = max(Ncs, len(own))
        Ncs = max(_round_up(Ncs, 8), 8)
        cn_local_a = np.zeros((S, Ncs), np.int64)
        cn_mask_a = np.zeros((S, Ncs), bool)
        cn_inv_a = np.full(N, S * Ncs, np.int64)    # pad slot -> zero column
        for d, own in enumerate(per_shard):
            k = len(own)
            cn_local_a[d, :k] = own - d * No
            cn_mask_a[d, :k] = True
            cn_inv_a[own] = d * Ncs + np.arange(k)
        cn_local = jnp.asarray(cn_local_a, jnp.int32)
        cn_mask_j = jnp.asarray(cn_mask_a)
        cn_inv = jnp.asarray(cn_inv_a, jnp.int32)
        # global element id -> flat (shard, slot) for the life-mask rebuild
        eg_inv_a = np.full(E, S * El, np.int64)
        for d in range(S):
            ids = elem_gid[d]
            real = ids >= 0
            eg_inv_a[ids[real]] = d * El + np.nonzero(real)[0]
        eg_inv = jnp.asarray(eg_inv_a, jnp.int32)

    dtype = model.dtype
    return HaloModel(
        n_shards=S, No=No, H=int(H), El=El, h_asm_vl=h_asm_vl, base=model,
        elem_w=jnp.asarray(elem_w, jnp.int32),
        elem_gid=jnp.asarray(elem_gid, jnp.int32),
        elem_alive0=jnp.asarray(alive0),
        mat_id=jnp.asarray(mat_id, jnp.int32),
        G_e=jnp.asarray(fields["G_e"], model.edtype),
        lam_e=jnp.asarray(fields["lam_e"], model.edtype),
        has_plastic_e=jnp.asarray(hasp),
        yield0_e=jnp.asarray(fields["yield0_e"], model.edtype),
        vol_e=jnp.asarray(fields["vol_e"], model.edtype),
        diag_M=jnp.asarray(shard_nodes(np.asarray(model.diag_M)), dtype),
        coord=jnp.asarray(shard_nodes(np.asarray(model.coord)), dtype),
        node_exists=jnp.asarray(shard_nodes(np.asarray(model.node_exists))),
        bc_mask=jnp.asarray(shard_nodes(bc_mask)),
        bc_value=jnp.asarray(shard_nodes(bc_value), dtype),
        bc_amp=jnp.asarray(shard_nodes(bc_amp), jnp.int32),
        velo0=jnp.asarray(shard_nodes(np.asarray(model.velo0)), dtype),
        coord_e=coord_e_s, h_plan_pos=h_plan_pos, h_plan_asm=h_plan_asm,
        h_plan_asm2=h_plan_asm2, h_asm_mask=h_asm_mask_j,
        cn_local=cn_local, cn_mask=cn_mask_j, cn_inv=cn_inv,
        eg_inv=eg_inv,
    )


def init_halo_state(hm: HaloModel) -> HaloState:
    dt = hm.base.dtype
    S, No, El = hm.n_shards, hm.No, hm.El
    z3 = jnp.zeros((S, 3, No), dt)
    edt = hm.base.edtype
    return HaloState(
        t=jnp.zeros((), jnp.int32),
        disp=z3, disp_pre=-hm.velo0 * jnp.asarray(hm.base.dt, dt),
        velo=hm.velo0, Q=z3,
        stress=jnp.zeros((S, 6, 8, El), edt),
        strain=jnp.zeros((S, 6, El), edt),
        eq_ps=jnp.zeros((S, 8, El), edt),
        yield_s=jnp.broadcast_to(hm.yield0_e[:, None], (S, 8, El)).astype(edt),
        triax=jnp.zeros((S, 8, El), edt),
        element_flag=hm.elem_alive0,
        work=jnp.zeros((S, 2), dt),
    )


def partition_state(hm: HaloModel, state: SimState) -> HaloState:
    """Scatter a single-chip SimState into halo shards (checkpoint resume)."""
    S, No, El = hm.n_shards, hm.No, hm.El
    gid = np.asarray(hm.elem_gid)                  # (S, El)
    valid = gid >= 0

    def split_nodes(a):
        a = np.asarray(a)
        return jnp.asarray(np.ascontiguousarray(np.moveaxis(
            a.reshape(a.shape[:-1] + (S, No)), -2, 0)))

    def split_elems(a, fill=0.0):
        a = np.asarray(a)
        out = np.full((S,) + a.shape[:-1] + (El,), fill, a.dtype)
        mv = np.moveaxis(out, 0, -2)               # view (..., S, El)
        mv[..., valid] = a[..., gid[valid]]
        return jnp.asarray(out)

    edt = hm.base.edtype
    return HaloState(
        t=jnp.asarray(state.t),
        disp=split_nodes(state.disp), disp_pre=split_nodes(state.disp_pre),
        velo=split_nodes(state.velo), Q=split_nodes(state.Q),
        stress=split_elems(state.stress).astype(edt),
        strain=split_elems(state.strain).astype(edt),
        eq_ps=split_elems(state.eq_ps).astype(edt),
        yield_s=split_elems(state.yield_s).astype(edt),
        triax=split_elems(state.triax).astype(edt),
        element_flag=split_elems(np.asarray(state.element_flag), fill=False),
        # cumulative work is a global scalar pair: park it on shard 0 so the
        # shard-sum (gather_state / halo_step_metrics) reproduces it
        work=jnp.asarray(np.concatenate(
            [np.asarray(state.work, hm.base.dtype)[None],
             np.zeros((S - 1, 2), hm.base.dtype)])),
    )


def _exchange_window(x, H):
    """(3, No) owned rows -> (3, No+2H) window via ring ppermute."""
    n = jax.lax.axis_size("dp")
    right = [(i, (i + 1) % n) for i in range(n)]
    left = [(i, (i - 1) % n) for i in range(n)]
    from_left = jax.lax.ppermute(x[..., -H:], "dp", right)   # my left nbr's tail
    from_right = jax.lax.ppermute(x[..., :H], "dp", left)    # my right nbr's head
    d = jax.lax.axis_index("dp")
    # ring wrap: shard 0 has no real left neighbour; zero the wrapped halo
    from_left = jnp.where(d == 0, 0.0, from_left)
    from_right = jnp.where(d == n - 1, 0.0, from_right)
    return jnp.concatenate([from_left, x, from_right], axis=-1)


def _return_ghosts(fw, H):
    """(3, No+2H) window forces -> (3, No) owned forces (+ neighbour ghosts)."""
    n = jax.lax.axis_size("dp")
    right = [(i, (i + 1) % n) for i in range(n)]
    left = [(i, (i - 1) % n) for i in range(n)]
    own = fw[..., H:-H]
    to_left = jax.lax.ppermute(fw[..., :H], "dp", left)      # arrives at left nbr
    to_right = jax.lax.ppermute(fw[..., -H:], "dp", right)
    d = jax.lax.axis_index("dp")
    to_left = jnp.where(d == n - 1, 0.0, to_left)    # wrapped from shard 0
    to_right = jnp.where(d == 0, 0.0, to_right)
    own = own.at[..., -H:].add(to_left)
    own = own.at[..., :H].add(to_right)
    return own


def _global_flags(hm: HaloModel, flag_local):
    """(El,) local life mask -> (E,) global via all_gather + static inverse
    gather (no scatter; pad elements read a False sentinel column)."""
    base = hm.base
    fl = jax.lax.all_gather(flag_local, "dp")            # (S, El)
    ext = jnp.concatenate([fl.reshape(-1),
                           jnp.zeros((1,), fl.dtype)])   # + False pad slot
    return ext[hm.eg_inv].astype(bool)


def _halo_contact(hm: HaloModel, s: HaloState, flag_g, activity=None):
    """Contact force on owned rows: all-gather the compact contact-node
    kinematics, rebuild sparse (3, N) views (valid at contact nodes only —
    the narrow phase reads nothing else), run the round-robin-partitioned
    narrow phase (ops/contact.py, axis_name='dp'), slice the owned rows."""
    base = hm.base
    edt = base.edtype
    pos_own = (hm.coord + s.disp).astype(edt)
    vel_own = s.velo.astype(edt)
    pv = jnp.concatenate([pos_own, vel_own], axis=0)     # (6, No)
    pvc = jnp.where(hm.cn_mask[None], pv[:, hm.cn_local], 0.0)   # (6, Ncs)
    pv_all = jax.lax.all_gather(pvc, "dp")               # (S, 6, Ncs)
    flat = jnp.moveaxis(pv_all, 0, 1).reshape(6, -1)     # (6, S*Ncs)
    flat = jnp.concatenate([flat, jnp.zeros((6, 1), edt)], axis=1)
    full = flat[:, hm.cn_inv]                            # (6, N) sparse-valid
    cf = contact_forces_pv(base, full[:3], full[3:], flag_g, axis_name="dp",
                           activity=activity)
    d = jax.lax.axis_index("dp")
    return jax.lax.dynamic_slice(cf, (jnp.int32(0), d * hm.No), (3, hm.No))


def _halo_integrate(hm: HaloModel, s: HaloState, flag_g=None, activity=None):
    """Contact + central difference + BCs on owned rows.
    Returns (t, disp_new, velo)."""
    base = hm.base
    dt = jnp.asarray(base.dt, base.dtype)
    t = s.t + 1
    ct = t.astype(base.dtype) * dt

    external = jnp.zeros_like(s.disp)
    if base.pairs:
        if flag_g is None:
            flag_g = _global_flags(hm, s.element_flag)
        external = external + _halo_contact(hm, s, flag_g,
                                            activity).astype(base.dtype)

    a1 = hm.diag_M / dt**2
    a2 = hm.diag_M * base.config.damping_C / (2.0 * dt)
    numer = (external - s.Q + a1 * (2.0 * s.disp - s.disp_pre)
             + a2 * s.disp_pre)
    disp_new = numer / (a1 + a2)
    ampv = amplitude_values(base, ct)
    fac = jnp.where(hm.bc_amp >= 0, ampv[jnp.clip(hm.bc_amp, 0, None)], 1.0)
    disp_new = jnp.where(hm.bc_mask, hm.bc_value * fac, disp_new)
    disp_new = jnp.where(hm.node_exists, disp_new, 0.0)
    velo = (disp_new - s.disp) / dt
    dwork = None
    if base.config.energy_check:
        # per-shard partial sums over OWNED rows (disjoint across shards);
        # exact-identity derivation in solver.explicit._integrate
        du_mid = 0.5 * (disp_new - s.disp_pre)
        f_c = jnp.where(hm.bc_mask, (a1 + a2) * disp_new - numer, 0.0)
        dwork = jnp.stack([jnp.sum((external + f_c) * du_mid),
                           jnp.sum(s.Q * du_mid)])
    return t, disp_new, velo, dwork


def _local_fast_model(hm: HaloModel) -> LoweredModel:
    """Window-local LoweredModel view for the fast path inside shard_map
    (``hm``'s plan fields must already be device-local; N/E are rebound to
    the window size / per-shard element count)."""
    W = hm.No + 2 * hm.H
    return dataclasses.replace(
        hm.base, N=W, E=hm.El, elem=hm.elem_w, mat_id=hm.mat_id,
        G_e=hm.G_e, lam_e=hm.lam_e, has_plastic_e=hm.has_plastic_e,
        yield0_e=hm.yield0_e,
        plan_pos=hm.h_plan_pos, plan_asm=hm.h_plan_asm,
        plan_asm2=hm.h_plan_asm2,
        asm_mask=hm.h_asm_mask, asm_vl=hm.h_asm_vl,
        coord_e=None, inc_idx=None, inc_mask=None, pairs=())


def _halo_step_fast(hm: HaloModel, lm: LoweredModel, s: HaloState,
                    disp_e_prev, stress_c, strain_c, flag_g, activity=None):
    """disp_e-carry step on the window — structurally identical to the
    single-chip fast path (solver.explicit.step_fast): only the new
    displacement window is gathered (3 channels), stress/strain travel as
    6-component tuples, and the assembly runs through the per-shard lane
    plan instead of an XLA scatter."""
    base = hm.base
    edt = base.edtype
    H = hm.H
    from ..ops.element import element_kinematics

    t, disp_new, velo, dwork = _halo_integrate(hm, s, flag_g, activity)
    disp_w = _exchange_window(disp_new, H)               # (3, W)
    disp_e = gather_disp_e(lm, disp_w)                   # (3, 8, El)
    pos_r, du_r = element_kinematics(hm.coord_e, disp_e, disp_e_prev,
                                     edt, lm.E)
    qe, s_c, e_c, eq, y, triax = element_core_c(
        lm, pos_r, du_r, stress_c, strain_c, s.eq_ps, s.yield_s,
        s.element_flag, pre_centered=True)
    if not base.fracture_enabled:
        # chunk-exit triax on fracture-free decks — see
        # solver.explicit.step_fast (make_halo_step recomputes it once
        # from the final stress)
        triax = s.triax
    elif triax is None:  # VMEM-resident regime (see element.py)
        from ..ops.element import triax_components
        triax = triax_components(s_c)
    fw = assemble_internal_force(lm, qe).astype(base.dtype)   # (3, W)
    Q = _return_ghosts(fw, H)
    # deferred erosion zeroing — see solver.explicit.step_fast
    if base.fracture_enabled:
        # dead elements carry stale stress under deferred zeroing; the
        # reference's triax for them is 0 (recomputed from zeroed stress)
        triax = jnp.where(s.element_flag[None, :], triax, 0.0)
    flag = s.element_flag
    if base.fracture_enabled:
        flag, delete = erosion_delete_mask(lm, eq, triax, flag)
    new = s.replace(t=t, disp=disp_new, disp_pre=s.disp, velo=velo, Q=Q,
                    eq_ps=eq, yield_s=y, triax=triax, element_flag=flag,
                    work=s.work if dwork is None else s.work + dwork)
    return new, disp_e, tuple(s_c), tuple(e_c), flag


def _halo_step_fast_packed(hm: HaloModel, lm: LoweredModel, s: HaloState,
                           disp_e_prev, P, flag_g, activity=None):
    """Packed-state variant of _halo_step_fast: the whole Gauss-point state
    travels as one (72, El) array through the fused Pallas element kernel
    (ops/element_pallas — "pallas" packed variant or "pallas_mxu"), exactly
    mirroring solver.explicit.step_fast_packed on the window.  Engaged by
    make_halo_step when ops.element.pallas_core_ok holds for the window
    model, putting pod-scale shards (>=1M elements each, the HBM-spill
    regime) on the hand kernel instead of the fused-XLA element math."""
    base = hm.base
    H = hm.H
    El = lm.E

    t, disp_new, velo, dwork = _halo_integrate(hm, s, flag_g, activity)
    disp_w = _exchange_window(disp_new, H)               # (3, W)
    disp_e = gather_disp_e(lm, disp_w)                   # (3, 8, El)
    from ..ops.element_pallas import packed_element_step
    P_new, qe, triax, flag = packed_element_step(
        lm, hm.coord_e, disp_e, disp_e_prev, P, s.element_flag)
    fw = assemble_internal_force(lm, qe.reshape(3, 8, El)).astype(base.dtype)
    Q = _return_ghosts(fw, H)
    if triax is None:
        triax = s.triax                  # chunk-exit triax (see step_fast)
    new = s.replace(t=t, disp=disp_new, disp_pre=s.disp, velo=velo, Q=Q,
                    triax=triax, element_flag=flag,
                    work=s.work if dwork is None else s.work + dwork)
    return new, disp_e, P_new, flag


def _halo_step(hm: HaloModel, s: HaloState, flag_g=None) -> HaloState:
    base = hm.base
    H = hm.H
    t, disp_new, velo, dwork = _halo_integrate(hm, s, flag_g)

    d_disp = disp_new - s.disp
    position = hm.coord + disp_new
    pos_w = _exchange_window(position, H)
    dd_w = _exchange_window(d_disp, H)

    # reuse the single-chip element kernel on the window with a local model
    lm = dataclasses.replace(
        base, elem=hm.elem_w, mat_id=hm.mat_id, G_e=hm.G_e, lam_e=hm.lam_e,
        has_plastic_e=hm.has_plastic_e, yield0_e=hm.yield0_e,
        plan_pos=None, plan_asm=None, asm_mask=None, asm_vl=0, pairs=())
    edt = base.edtype
    res = element_update(lm, pos_w.astype(edt), dd_w.astype(edt), s.stress,
                         s.strain, s.eq_ps, s.yield_s, s.element_flag)
    W = hm.No + 2 * H
    fw = jnp.zeros((3, W), base.dtype).at[:, hm.elem_w].add(
        res.Qe.astype(base.dtype))
    Q = _return_ghosts(fw, H)

    triax = triax_stress(res.stress)
    flag = s.element_flag
    stress, strain = res.stress, res.strain
    if base.fracture_enabled:
        er = erode(lm, stress, strain, res.eq_ps, triax, flag)
        flag, stress, strain = er.element_flag, er.stress, er.strain

    return s.replace(t=t, disp=disp_new, disp_pre=s.disp, velo=velo, Q=Q,
                     stress=stress, strain=strain, eq_ps=res.eq_ps,
                     yield_s=res.yield_s, triax=triax, element_flag=flag,
                     work=s.work if dwork is None else s.work + dwork)


def _to_global(tree, spec_tree, mesh: Mesh):
    """Place a host-replicated pytree onto a (possibly multi-process) mesh
    as global ``jax.Array``s per the given PartitionSpec tree.

    Under one process ``jit`` shards host arrays itself, so this is only
    engaged when ``jax.process_count() > 1`` — there every input must be a
    global array built from the locally-addressable shards (every process
    holds the full host value; ``partition()`` is deterministic NumPy, so
    all processes compute identical trees).  Leaves already global (e.g.
    the state returned by a previous chunk) pass through."""
    def conv(x, sp):
        if not hasattr(x, "shape") or not hasattr(x, "dtype"):
            return x
        if isinstance(x, jax.Array) and not x.is_fully_addressable:
            return x                     # already a global array
        sh = jax.sharding.NamedSharding(mesh, sp)
        xh = np.asarray(x)
        return jax.make_array_from_callback(xh.shape, sh,
                                            lambda idx: xh[idx])
    return jax.tree_util.tree_map(conv, tree, spec_tree)


def _halo_specs(hm: HaloModel):
    """(model_specs, state_specs) PartitionSpec trees for shard_map over
    'dp': shard-major leaves lead with 'dp', plans shard over their stacked
    leading axis, _REPL_FIELDS and the base model stay replicated."""
    def spec_of(name, v):
        if name in _REPL_FIELDS:
            return P(*([None] * np.ndim(v)))
        return P(*(["dp"] + [None] * (np.ndim(v) - 1)))

    mspec = dataclasses.replace(
        hm,
        base=jax.tree_util.tree_map(lambda _: P(), hm.base),
        h_plan_pos=(jax.tree_util.tree_map(lambda _: P("dp"), hm.h_plan_pos)
                    if hm.h_plan_pos is not None else None),
        h_plan_asm=(jax.tree_util.tree_map(lambda _: P("dp"), hm.h_plan_asm)
                    if hm.h_plan_asm is not None else None),
        h_plan_asm2=(jax.tree_util.tree_map(lambda _: P("dp"),
                                            hm.h_plan_asm2)
                     if hm.h_plan_asm2 is not None else None),
        **{f.name: spec_of(f.name, getattr(hm, f.name))
           for f in dataclasses.fields(hm)
           if f.name not in ("base", "h_plan_pos", "h_plan_asm",
                             "h_plan_asm2")
           and not f.metadata.get("static")
           and getattr(hm, f.name) is not None})
    sspec = HaloState(
        t=P(), **{f.name: spec_of("", getattr(init_halo_state(hm), f.name))
                  for f in dataclasses.fields(HaloState) if f.name != "t"})
    return mspec, sspec


def _unlead(m: HaloModel, st: HaloState):
    """Strip the leading shard axis (size 1 per device) inside shard_map;
    replicated fields keep their full shape, plans go device-local."""
    def ul(x):
        return x[0] if hasattr(x, "shape") and x.ndim >= 1 else x
    mm = dataclasses.replace(
        m,
        h_plan_pos=(plan_local(m.h_plan_pos)
                    if m.h_plan_pos is not None else None),
        h_plan_asm=(plan_local(m.h_plan_asm)
                    if m.h_plan_asm is not None else None),
        h_plan_asm2=(plan_local(m.h_plan_asm2)
                     if m.h_plan_asm2 is not None else None),
        **{f.name: ul(getattr(m, f.name))
           for f in dataclasses.fields(m)
           if f.name not in ("base", "h_plan_pos", "h_plan_asm",
                             "h_plan_asm2")
           and f.name not in _REPL_FIELDS
           and not f.metadata.get("static")})
    stt = HaloState(t=st.t, **{f.name: ul(getattr(st, f.name))
                               for f in dataclasses.fields(HaloState)
                               if f.name != "t"})
    return mm, stt


def make_halo_step(hm: HaloModel, mesh: Mesh, n_steps: int = 1):
    S = hm.n_shards
    if mesh.devices.size != S:
        raise ValueError("mesh size must equal n_shards")

    mspec, sspec = _halo_specs(hm)

    def body(m, st):
        mm, stt = _unlead(m, st)
        # contact life mask: constant across the chunk on erosion-free decks
        flag_g0 = None
        if mm.base.pairs and not mm.base.fracture_enabled:
            flag_g0 = _global_flags(mm, stt.element_flag)

        carry_fg = bool(mm.base.pairs) and mm.base.fracture_enabled
        if mm.h_plan_pos is not None and mm.coord_e is not None:
            # fast path: mm's plans are already device-local; hand a
            # window-local model view to the element kernels
            lmw = _local_fast_model(mm)
            disp_w0 = _exchange_window(stt.disp, mm.H)
            disp_e0 = gather_disp_e(lmw, disp_w0)
            dummy = jnp.zeros((0,), stt.stress.dtype)
            fg_init = (_global_flags(mm, stt.element_flag) if carry_fg
                       else jnp.zeros((0,), bool))
            # chunk-carried contact activity masks (see solver.explicit.
            # _next_activity): pure functions of the global life mask, so
            # they refresh only on steps where a deletion changed it.  The
            # cond predicate compares the freshly-gathered fg against the
            # carried one — replicated-identical on every shard, and the
            # branches are collective-free (local mask gathers only), so
            # divergence/deadlock under shard_map is impossible.
            from ..ops.contact import contact_activity
            act_init = (contact_activity(mm.base, fg_init) if carry_fg
                        else None)

            def _next_act(fg_new, fg_old, act):
                if not carry_fg:
                    return act
                return jax.lax.cond(
                    jnp.any(fg_new != fg_old),
                    lambda f: contact_activity(mm.base, f),
                    lambda _: act, fg_new)

            from ..ops.element import pallas_core_ok
            if pallas_core_ok(lmw, mm.El, mm.base.edtype):
                # fused Pallas element kernel on the window (packed state)
                from ..solver.explicit import (pack_gauss_state,
                                               unpack_gauss_state)
                P0 = pack_gauss_state(stt, mm.El)
                s0 = stt.replace(stress=dummy, strain=dummy, eq_ps=dummy,
                                 yield_s=dummy)

                def stepp(_, carry):
                    st_c, de, Pc, fg, act = carry
                    fg_use = fg if carry_fg else flag_g0
                    new, de2, P2, flag = _halo_step_fast_packed(
                        mm, lmw, st_c, de, Pc, fg_use, act)
                    fg2 = _global_flags(mm, flag) if carry_fg else fg
                    return new, de2, P2, fg2, _next_act(fg2, fg, act)

                out, _, Pn, _, _ = jax.lax.fori_loop(
                    0, n_steps, stepp, (s0, disp_e0, P0, fg_init, act_init))
                Pn = jnp.concatenate(      # deferred erosion zeroing
                    [jnp.where(out.element_flag[None, :], Pn[:56], 0.0),
                     Pn[56:]], axis=0)
                out = unpack_gauss_state(out, Pn, mm.El)
            else:
                sc0 = tuple(stt.stress[c] for c in range(6))
                ec0 = tuple(stt.strain[c] for c in range(6))
                s0 = stt.replace(stress=dummy, strain=dummy)

                def stepb(_, carry):
                    st_c, de, sc, ec, fg, act = carry
                    fg_use = fg if carry_fg else flag_g0
                    new, de2, sc2, ec2, flag = _halo_step_fast(
                        mm, lmw, st_c, de, sc, ec, fg_use, act)
                    fg2 = _global_flags(mm, flag) if carry_fg else fg
                    return new, de2, sc2, ec2, fg2, _next_act(fg2, fg, act)

                out, _, sc, ec, _, _ = jax.lax.fori_loop(
                    0, n_steps, stepb,
                    (s0, disp_e0, sc0, ec0, fg_init, act_init))
                keep = out.element_flag[None, None, :]  # deferred zeroing
                out = out.replace(stress=jnp.where(keep, jnp.stack(sc), 0.0),
                                  strain=jnp.where(out.element_flag[None, :],
                                                   jnp.stack(ec), 0.0))
            if not mm.base.fracture_enabled:  # chunk-exit triax (step_fast)
                out = out.replace(triax=triax_stress(out.stress))
        else:
            if carry_fg:
                def stepg(_, c):
                    st_c, fg = c
                    new = _halo_step(mm, st_c, fg)
                    return new, _global_flags(mm, new.element_flag)
                out, _ = jax.lax.fori_loop(
                    0, n_steps, stepg,
                    (stt, _global_flags(mm, stt.element_flag)))
            else:
                out = jax.lax.fori_loop(
                    0, n_steps, lambda _, x: _halo_step(mm, x, flag_g0), stt)
        relead = lambda x: x[None] if hasattr(x, "shape") else x
        return HaloState(t=out.t, **{f.name: relead(getattr(out, f.name))
                                     for f in dataclasses.fields(HaloState)
                                     if f.name != "t"})

    fn = jax.shard_map(body, mesh=mesh, in_specs=(mspec, sspec),
                       out_specs=sspec, check_vma=False)
    jitted = jax.jit(fn)
    if jax.process_count() > 1:
        # multi-host (jax.distributed) mesh: inputs must be global arrays;
        # the halo ring's ppermute and the contact all_gather then ride
        # ICI within a slice and DCN across hosts with no code change
        hm_g = _to_global(hm, mspec, mesh)
        return lambda st: jitted(hm_g, _to_global(st, sspec, mesh))
    return lambda st: jitted(hm, st)


def gather_state(hm: HaloModel, s: HaloState) -> SimState:
    """Host-side reassembly into a single-chip SimState view: node fields
    are concatenated shard-major; element fields scatter back to global
    element order through the shard->global permutation kept at
    partition time (elem_gid), so halo runs can emit full VTK frames.

    Multi-process (jax.distributed) runs hold only their local shards, so
    sharded leaves are first resharded to fully-replicated (a collective —
    EVERY process must call gather_state, as run() does) before the host
    reassembly; writers gate the file IO on process 0."""
    if isinstance(s.disp, jax.Array) and not s.disp.is_fully_addressable:
        mesh = s.disp.sharding.mesh
        repl = jax.jit(lambda x: x,
                       out_shardings=jax.sharding.NamedSharding(mesh, P()))

        def full(x):
            if isinstance(x, jax.Array) and not x.is_fully_addressable:
                return np.asarray(repl(x))
            return x
        s = jax.tree_util.tree_map(full, s)
    def join_nodes(a):   # (S, ..., No) -> (..., N)
        a = np.asarray(a)
        return np.moveaxis(a, 0, -2).reshape(a.shape[1:-1] + (-1,))
    base = hm.base
    gid = np.asarray(hm.elem_gid)                 # (S, El), -1 pad
    valid = gid >= 0

    def join_elems(a, fill=0.0):   # (S, ..., El) -> (..., E)
        a = np.asarray(a)
        out = np.full(a.shape[1:-1] + (base.E,), fill, a.dtype)
        src = np.moveaxis(a, 0, -2)               # (..., S, El)
        out[..., gid[valid]] = src[..., valid]
        return out

    return SimState(
        t=jnp.asarray(s.t),
        disp=jnp.asarray(join_nodes(s.disp)),
        disp_pre=jnp.asarray(join_nodes(s.disp_pre)),
        velo=jnp.asarray(join_nodes(s.velo)),
        Q=jnp.asarray(join_nodes(s.Q)),
        stress=jnp.asarray(join_elems(s.stress)),
        strain=jnp.asarray(join_elems(s.strain)),
        eq_ps=jnp.asarray(join_elems(s.eq_ps)),
        yield_s=jnp.asarray(join_elems(s.yield_s)),
        triax=jnp.asarray(join_elems(s.triax)),
        element_flag=jnp.asarray(join_elems(s.element_flag, fill=False)),
        contact_force=jnp.zeros((3, base.N), base.dtype),
        work=jnp.asarray(np.asarray(s.work).sum(axis=0)),
    )


def join_nodes(a):
    """(S, ..., No) shard-major node blocks -> (..., N) host array (the node
    partition is contiguous, so this is a cheap moveaxis+reshape)."""
    a = np.asarray(a)
    return np.moveaxis(a, 0, -2).reshape(a.shape[1:-1] + (-1,))


def join_elem_field(hm: HaloModel, a, fill=0.0):
    """(S, ..., El) shard-major element field -> (..., E) global order."""
    a = np.asarray(a)
    gid = np.asarray(hm.elem_gid)
    valid = gid >= 0
    out = np.full(a.shape[1:-1] + (hm.base.E,), fill, a.dtype)
    src = np.moveaxis(a, 0, -2)
    out[..., gid[valid]] = src[..., valid]
    return out


def make_halo_frame(hm: HaloModel, mesh: Mesh):
    """Device-side frame view for pod-scale output: the node-averaged output
    fields (cal_node_stress_strain, HAKAI_j.jl:3408-3486) are computed PER
    SHARD — element GP means scatter into the local window, ghost rows
    return to their owners over the ring (same exchange as the force
    assembly), and the incidence count divides on owned rows — so the
    Gauss-point element state (the dominant term: (6,8,El) stress and
    friends, ~27 GB host RSS at 10M elements via gather_state) never leaves
    the device.  The host receives only (S,·,No) node blocks and the (S,El)
    life mask.

    Returns ``frame(s) -> (disp, velo, NodeData, element_flag)`` as host
    numpy arrays in global order.  Deleted elements keep their zeroed state
    and still count in the divisor, exactly as the reference (and the
    single-chip solver.output.node_fields) does; padding elements are
    excluded.  Field values match the single-chip path to summation-order
    roundoff (the per-shard scatter adds in a different order than the
    fixed-order incidence sum)."""
    from ..solver.output import NodeData

    mspec, sspec = _halo_specs(hm)
    edt = hm.base.edtype

    def body(m, st):
        mm, stt = _unlead(m, st)
        El = mm.El
        W = mm.No + 2 * mm.H
        es = stt.stress.mean(axis=1)                    # (6, El)
        ep = stt.eq_ps.mean(axis=0)[None]               # (1, El)
        et = stt.triax.mean(axis=0)[None]
        alive0 = mm.elem_alive0                          # (El,) excludes pad
        val = jnp.concatenate([es, stt.strain, ep, et], axis=0)  # (14, El)
        src = jnp.concatenate(
            [jnp.where(alive0[None], val, 0.0),
             jnp.where(alive0, 1.0, 0.0)[None].astype(edt)], axis=0)
        acc = jnp.zeros((15, W), edt).at[:, mm.elem_w].add(
            jnp.broadcast_to(src[:, None, :], (15, 8, El)))
        own = _return_ghosts(acc, mm.H)                 # (15, No)
        cnt = jnp.maximum(own[14], 1.0)
        nf = own[:14] / cnt
        ns = nf[:6]
        sx, sy, sz, txy, tyz, txz = (ns[i] for i in range(6))
        mises = jnp.sqrt(0.5 * ((sx - sy)**2 + (sy - sz)**2 + (sx - sz)**2
                                + 6.0 * (txy**2 + tyz**2 + txz**2)))
        nd = NodeData(ns, nf[6:12], nf[12], mises, nf[13])
        lead = lambda x: x[None]
        return (lead(stt.disp), lead(stt.velo),
                jax.tree_util.tree_map(lead, nd), lead(stt.element_flag))

    ospec = (P("dp"), P("dp"),
             jax.tree_util.tree_map(lambda _: P("dp"),
                                    NodeData(*([0.0] * 5))), P("dp"))
    fn = jax.jit(jax.shard_map(body, mesh=mesh, in_specs=(mspec, sspec),
                               out_specs=ospec, check_vma=False))

    def frame(s: HaloState):
        hm_in = (_to_global(hm, mspec, mesh) if jax.process_count() > 1
                 else hm)
        s_in = (_to_global(s, sspec, mesh) if jax.process_count() > 1
                else s)
        disp, velo, nd, flag = fn(hm_in, s_in)
        if jax.process_count() > 1:
            repl = jax.jit(lambda x: x,
                           out_shardings=jax.sharding.NamedSharding(
                               mesh, P()))
            disp, velo, nd, flag = jax.tree_util.tree_map(
                repl, (disp, velo, nd, flag))
        nd_host = NodeData(*[join_nodes(x) for x in nd])
        return (join_nodes(disp), join_nodes(velo), nd_host,
                join_elem_field(hm, flag, fill=False))
    return frame


# ---------------------------------------------------------------------------
# sharded checkpoint: HaloState round-trips shard-major, skipping the
# gather_state reassembly (which materializes the full single-chip element
# state on host — the pod-scale bottleneck).  The reference has no
# checkpointing at all (SURVEY.md §5).
# ---------------------------------------------------------------------------

def _local_shard_rows(mesh: Mesh) -> list[int]:
    """Leading-axis shard rows owned by this process under P('dp', ...)."""
    pi = jax.process_index()
    return [i for i, d in enumerate(mesh.devices.flat)
            if d.process_index == pi]


def _proc_shard_path(path: str, pid: int) -> str:
    return f"{path}.p{pid}.npz"


def save_halo_checkpoint(path: str, hm: HaloModel, s: HaloState,
                         mesh: Mesh | None = None) -> str:
    """Write a shard-major halo checkpoint.

    Single-process runs write one ``.npz`` with the full (S, ...) leaves.
    Multi-process (jax.distributed) runs write one ``{path}.p{K}.npz`` PER
    PROCESS — every process calls this and saves only its addressable shard
    rows, so no host ever materializes the global element state (RSS is
    bounded by one process's shards); process 0 additionally writes a tiny
    manifest at ``path`` recording the partition + process geometry.  The
    reference has no checkpointing at all (SURVEY.md §5)."""
    fmt = np.array([hm.n_shards, hm.No, hm.El], np.int64)
    multi = (jax.process_count() > 1
             and isinstance(s.disp, jax.Array)
             and not s.disp.is_fully_addressable)
    if not multi:
        # host-replicated state: one file, written once (process 0 when
        # several processes hold the same host copy)
        if jax.process_index() == 0:
            leaves = {f.name: np.asarray(getattr(s, f.name))
                      for f in dataclasses.fields(s)}
            leaves["halo_format"] = fmt
            np.savez_compressed(path, **leaves)
        return path

    mesh = mesh if mesh is not None else s.disp.sharding.mesh
    rows = _local_shard_rows(mesh)

    def local_block(x):
        """Addressable shard rows of a leading-'dp' leaf, stacked in global
        row order (replicated leaves — t — pass through whole)."""
        if not (isinstance(x, jax.Array) and not x.is_fully_addressable):
            return np.asarray(x)
        shards = list(x.addressable_shards)
        if x.ndim == 0 or x.sharding.is_fully_replicated:
            return np.asarray(shards[0].data)
        shards.sort(key=lambda sh: sh.index[0].start or 0)
        return np.concatenate([np.asarray(sh.data) for sh in shards], axis=0)

    leaves = {f.name: local_block(getattr(s, f.name))
              for f in dataclasses.fields(s)}
    leaves["halo_format"] = fmt
    leaves["halo_rows"] = np.asarray(rows, np.int64)
    leaves["halo_procs"] = np.array([jax.process_index(),
                                     jax.process_count()], np.int64)
    np.savez_compressed(_proc_shard_path(path, jax.process_index()), **leaves)
    if jax.process_index() == 0:
        np.savez(path, halo_format=fmt, halo_manifest=np.array(
            [jax.process_count()], np.int64))
    return path


def is_halo_checkpoint(path: str) -> bool:
    with np.load(path) as data:
        return "halo_format" in data


def load_halo_checkpoint(path: str, hm: HaloModel,
                         mesh: Mesh | None = None) -> HaloState:
    """Load a shard-major checkpoint; the partition geometry (shards, owned
    rows, elements per shard) must match the current partition().

    Multi-process checkpoints (a manifest at ``path`` plus per-process
    ``{path}.pK.npz`` shard files) resume across the same mesh: every
    process reads ONLY its own shard file and places the rows straight onto
    its local devices (``jax.make_array_from_single_device_arrays``), so
    resume never materializes the global state on any host."""
    data = np.load(path)
    if "halo_manifest" in data:
        if mesh is None:
            raise ValueError("multi-process halo checkpoint needs the mesh "
                             "to resume (load_halo_checkpoint(..., mesh=))")
        nproc = int(data["halo_manifest"][0])
        if nproc != jax.process_count():
            raise ValueError(
                f"halo checkpoint was written by {nproc} processes; this "
                f"run has {jax.process_count()} — resume on the same "
                "process layout")
        return _load_halo_checkpoint_proc(
            _proc_shard_path(path, jax.process_index()), hm, mesh)
    S, No, El = (int(x) for x in data["halo_format"])
    if (S, No, El) != (hm.n_shards, hm.No, hm.El):
        raise ValueError(
            f"halo checkpoint partition (S={S}, No={No}, El={El}) does not "
            f"match the current partition (S={hm.n_shards}, No={hm.No}, "
            f"El={hm.El}); re-partition with the same device count and "
            "padding, or resume through a single-chip checkpoint")
    like = init_halo_state(hm)
    kw = {}
    for f in dataclasses.fields(like):
        ref = getattr(like, f.name)
        if f.name == "work" and f.name not in data:
            kw[f.name] = jnp.zeros_like(ref)
            continue
        arr = data[f.name]
        if arr.shape != np.shape(ref):
            raise ValueError(f"halo checkpoint field {f.name} has shape "
                             f"{arr.shape}, partition expects "
                             f"{np.shape(ref)}")
        kw[f.name] = jnp.asarray(arr, np.asarray(ref).dtype)
    return HaloState(**kw)


def _load_halo_checkpoint_proc(ppath: str, hm: HaloModel,
                               mesh: Mesh) -> HaloState:
    """Per-process half of the multi-process resume: read this process's
    shard rows and assemble global arrays device-by-device."""
    data = np.load(ppath)
    S, No, El = (int(x) for x in data["halo_format"])
    if (S, No, El) != (hm.n_shards, hm.No, hm.El):
        raise ValueError(
            f"halo checkpoint partition (S={S}, No={No}, El={El}) does not "
            f"match the current partition (S={hm.n_shards}, No={hm.No}, "
            f"El={hm.El})")
    rows_saved = [int(r) for r in data["halo_rows"]]
    rows_now = _local_shard_rows(mesh)
    if rows_saved != rows_now:
        raise ValueError(
            f"process {jax.process_index()} owned shard rows {rows_saved} "
            f"at save time but owns {rows_now} now — resume on the same "
            "mesh/process layout")
    devs = {i: d for i, d in enumerate(mesh.devices.flat)
            if d.process_index == jax.process_index()}
    like = init_halo_state(hm)
    kw = {}
    for f in dataclasses.fields(like):
        ref = np.asarray(getattr(like, f.name))
        if f.name == "work" and f.name not in data:
            arr = np.zeros((len(rows_now),) + ref.shape[1:], ref.dtype)
        else:
            arr = data[f.name]
        if f.name == "t":
            sh = jax.sharding.NamedSharding(mesh, P())
            kw[f.name] = jax.make_array_from_single_device_arrays(
                ref.shape, sh,
                [jax.device_put(jnp.asarray(arr, ref.dtype), d)
                 for d in devs.values()])
            continue
        if arr.shape != (len(rows_now),) + ref.shape[1:]:
            raise ValueError(f"halo checkpoint field {f.name} has shape "
                             f"{arr.shape}, expected "
                             f"{(len(rows_now),) + ref.shape[1:]}")
        sh = jax.sharding.NamedSharding(
            mesh, P(*(["dp"] + [None] * (ref.ndim - 1))))
        kw[f.name] = jax.make_array_from_single_device_arrays(
            ref.shape, sh,
            [jax.device_put(jnp.asarray(arr[k:k + 1], ref.dtype), devs[row])
             for k, row in enumerate(rows_now)])
    return HaloState(**kw)
