"""Lowering: parsed :class:`~hakai_tpu.io.model.Model` -> padded static-shape
device arrays.

This replaces the reference's mutable object graph + in-place loops
(HAKAI_j.jl:81-485 setup) with a compile-once representation:

  * node/element tables padded to lane-friendly multiples, mesh axis last;
  * per-element material constants gathered into dense arrays;
  * internal-force assembly as a precomputed node->(element,slot) incidence
    table so the Qe->Q scatter (HAKAI_j.jl:668-675) becomes a deterministic
    gather-sum;
  * the complete contact face inventory (exterior *and* interior faces) is
    pre-enumerated with twin-element links so that post-erosion surface
    growth (add_surface_triangle, HAKAI_j.jl:2167-2245) is a mask flip, not a
    dynamic append.
"""
from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ..config import SolverConfig
from ..io.model import Model
from ..ops.gather_pallas import (AsmPhysPlan, GatherPlan, GatherPhysPlan,
                                 plan_assemble, plan_assemble_phys,
                                 plan_blocked_gather, plan_gather_phys,
                                 plan_segmented)
from ..ops.shape import pusai_hexa

# Pallas gather-plan tile: plans engage for meshes with at least one full
# tile on both axes (elements AND nodes); do not lower below 2048 — small
# r_tile wedges the TPU compile service (see .claude/skills/verify).
_PLAN_TILE = 2048

# face -> local node slots, with the reference's node orders
# (get_element_face, HAKAI_j.jl:1959-1964)
_FACE_SLOTS = np.array([
    [0, 1, 2, 3],
    [4, 5, 6, 7],
    [0, 1, 5, 4],
    [1, 2, 6, 5],
    [2, 3, 7, 6],
    [3, 0, 4, 7],
])


def _round_up(x: int, m: int) -> int:
    return int(-(-x // m) * m)


def assembly_lanes(elem: np.ndarray, nE: int, E: int, N: int):
    """Slot-pure assembly lanes: lane (slot i, dup d) holds at most one
    incident element per node.  Returns [(idx (N,) into i*E+e, mask (N,))].
    Shared by the single-chip lowering and the per-shard plan builder
    (parallel/sharding.py)."""
    lanes = []
    for i in range(8):
        nodes_i = elem[i, :nE]
        order = np.argsort(nodes_i, kind="stable")
        sn = nodes_i[order]
        st = np.concatenate([[0], np.nonzero(np.diff(sn))[0] + 1]) \
            if len(sn) else np.zeros(0, np.int64)
        grp = np.repeat(st, np.diff(np.concatenate([st, [len(sn)]]))) \
            if len(sn) else np.zeros(0, np.int64)
        rank = np.arange(len(sn)) - grp
        maxdup = int(rank.max()) + 1 if len(sn) else 1
        for d in range(maxdup):
            sel = rank == d
            idx_arr = np.zeros(N, np.int64)
            msk = np.zeros(N, bool)
            idx_arr[sn[sel]] = i * E + order[sel]
            msk[sn[sel]] = True
            lanes.append((idx_arr, msk))
    return lanes


def _dup_lanes(targets: np.ndarray, src_ids: np.ndarray, n_out: int):
    """Scatter-as-gather lanes: output o sums src[idx[o]] over the returned
    (idx (n_out,), mask (n_out,)) lanes.  Entries with equal targets are
    ranked into separate lanes, so each lane is a (partial) permutation —
    the TPU-native replacement for a scatter-add (deterministic fixed-order
    sum; SURVEY.md §2 race-handling row)."""
    targets = np.asarray(targets, np.int64)
    src_ids = np.asarray(src_ids, np.int64)
    order = np.argsort(targets, kind="stable")
    sn = targets[order]
    if len(sn) == 0:
        return []
    st = np.concatenate([[0], np.nonzero(np.diff(sn))[0] + 1])
    grp = np.repeat(st, np.diff(np.concatenate([st, [len(sn)]])))
    rank = np.arange(len(sn)) - grp
    lanes = []
    for d in range(int(rank.max()) + 1):
        sel = rank == d
        idx_arr = np.zeros(n_out, np.int64)
        msk = np.zeros(n_out, bool)
        idx_arr[sn[sel]] = src_ids[order[sel]]
        msk[sn[sel]] = True
        lanes.append((idx_arr, msk))
    return lanes


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class ContactPairArrays:
    """One *directional* contact pair: nodes of instance ``i`` against the
    triangulated surface of instance ``j`` (CT entries, HAKAI_j.jl:357-398)."""
    # ---- static metadata ----
    i_instance: int = dataclasses.field(metadata=dict(static=True), default=0)
    j_instance: int = dataclasses.field(metadata=dict(static=True), default=0)
    is_self: bool = dataclasses.field(metadata=dict(static=True), default=False)
    young: float = dataclasses.field(metadata=dict(static=True), default=0.0)
    tri_capacity: int = dataclasses.field(metadata=dict(static=True), default=0)
    node_capacity: int = dataclasses.field(metadata=dict(static=True), default=0)
    # ---- triangle (j) side: full face inventory of instance j ----
    tri_nodes: jnp.ndarray = None     # (3, 2F) int32 global node ids
    tri_elem: jnp.ndarray = None      # (2F,) int32 global element id
    tri_init: jnp.ndarray = None      # (2F,) bool: initially exposed & in CP set
    tri_twin: jnp.ndarray = None      # (2F,) int32 twin element id, -1 boundary
    # ---- node (i) side: candidate nodes of instance i ----
    cand_nodes: jnp.ndarray = None    # (C,) int32 global node ids
    cand_init: jnp.ndarray = None     # (C,) bool
    cand_twin: jnp.ndarray = None     # (C, VT) int32 element ids whose death
    #                                   re-exposes this node; -1 padded
    # ---- j-side surface nodes (for the AABB/broad phase, c_nodes_j) ----
    jnode_nodes: jnp.ndarray = None   # (Cj,) int32
    jnode_init: jnp.ndarray = None    # (Cj,) bool
    jnode_twin: jnp.ndarray = None    # (Cj, VTj) int32
    jnode_capacity: int = dataclasses.field(metadata=dict(static=True), default=0)
    # ---- static Pallas gather plans + precomputed static gathers ----
    plan_tpos: object = None          # GatherPlan over concat(v0,v1,v2) ids
    tpos_bounds: tuple = dataclasses.field(metadata=dict(static=True),
                                           default=())   # segment (start,stop)
    plan_tvel: object = None          # GatherPlan over v0 ids
    plan_inode: object = None         # GatherPlan over cand_nodes
    plan_jnode: object = None         # GatherPlan over jnode_nodes
    tri_enodes: jnp.ndarray = None    # (8, 2F) own-element nodes (self pairs)
    cand_mass: jnp.ndarray = None     # (Ci,) lumped nodal mass
    # ---- scatter-as-gather plans for the force accumulation (+f to the
    # node, -f/3 to each triangle vertex): XLA's scatter-add runs serially
    # on TPU (~0.9 ms per vertex scatter on the 22k car deck) ----
    plan_fgi: object = None           # node <- force_i (single lane)
    fgi_mask: jnp.ndarray = None      # (1, N) bool
    # force_t accumulates in a *compact* target space (the pair's touched
    # surface nodes, Nt << N) so the (VLt, target) mask-sum doesn't scale
    # with the whole mesh; plan_fx expands the compact sums back to (3, N)
    plan_fgt: object = None           # tn-slot <- force_t (VLt dup lanes),
    #                                   or sorted-contribution order (tree)
    fgt_mask: jnp.ndarray = None      # (VLt, Nt) bool (lane mode)
    plan_fx: object = None            # node <- compact tn sums (1 lane)
    fx_mask: jnp.ndarray = None       # (N,) bool: node touched by a triangle
    # tree mode (big surfaces whose lane plan overflows tile windows):
    fgt_segmask: jnp.ndarray = None   # (S, 3F) bool shift-add masks
    plan_pick: object = None          # tn-slot <- segment-start sums
    fgt_tnvalid: jnp.ndarray = None   # (Nt,) bool
    fgt_strides: tuple = dataclasses.field(metadata=dict(static=True),
                                           default=())
    fgt_k: int = dataclasses.field(metadata=dict(static=True), default=0)
    fgt_vl: int = dataclasses.field(metadata=dict(static=True), default=0)
    fgt_n: int = dataclasses.field(metadata=dict(static=True), default=0)
    fgi_src: int = dataclasses.field(metadata=dict(static=True), default=0)
    fgt_src: int = dataclasses.field(metadata=dict(static=True), default=0)
    # fracture-free deck: the twin inventory was culled at lowering and the
    # activity masks are compile-time all-true (ops/contact.py skips them)
    static_activity: bool = dataclasses.field(metadata=dict(static=True),
                                              default=False)


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class LoweredModel:
    """Static-shape solver inputs. Mesh axes are the *last* array axes."""
    # ---- static metadata ----
    n_node: int = dataclasses.field(metadata=dict(static=True), default=0)
    n_element: int = dataclasses.field(metadata=dict(static=True), default=0)
    N: int = dataclasses.field(metadata=dict(static=True), default=0)   # padded
    E: int = dataclasses.field(metadata=dict(static=True), default=0)   # padded
    dt: float = dataclasses.field(metadata=dict(static=True), default=0.0)
    end_time: float = dataclasses.field(metadata=dict(static=True), default=0.0)
    time_num: int = dataclasses.field(metadata=dict(static=True), default=0)
    mass_scaling: float = dataclasses.field(metadata=dict(static=True), default=1.0)
    contact_flag: int = dataclasses.field(metadata=dict(static=True), default=0)
    fracture_enabled: bool = dataclasses.field(metadata=dict(static=True), default=False)
    element_min_size: float = dataclasses.field(metadata=dict(static=True), default=0.0)
    element_max_size: float = dataclasses.field(metadata=dict(static=True), default=0.0)
    config: SolverConfig = dataclasses.field(metadata=dict(static=True),
                                             default_factory=SolverConfig)
    # static copies of the (tiny) material tables, so hot loops can unroll
    # them into scalar constants instead of per-element table gathers:
    # pl_tables[m] = ((stress, strain), ...); du_tables[m] = ((fr, triax), ...)
    pl_tables: tuple = dataclasses.field(metadata=dict(static=True), default=())
    du_tables: tuple = dataclasses.field(metadata=dict(static=True), default=())

    # ---- mesh ----
    coord: jnp.ndarray = None       # (3, N)
    elem: jnp.ndarray = None        # (8, E) int32, 0-based
    elem_exists: jnp.ndarray = None  # (E,) bool
    node_exists: jnp.ndarray = None  # (N,) bool
    inc_idx: jnp.ndarray = None     # (V, N) int32 into flattened (8*E) Qe
    inc_mask: jnp.ndarray = None    # (V, N) bool
    diag_M: jnp.ndarray = None      # (N,) lumped nodal mass (scaled)
    pusai: jnp.ndarray = None       # (8, 3, 8) shape gradients

    # ---- per-element material ----
    mat_id: jnp.ndarray = None      # (E,) int32 0-based
    G_e: jnp.ndarray = None         # (E,)
    lam_e: jnp.ndarray = None       # (E,)
    has_plastic_e: jnp.ndarray = None  # (E,) bool
    yield0_e: jnp.ndarray = None    # (E,)

    # ---- material tables (per material, padded) ----
    pl_stress: jnp.ndarray = None   # (M, P)
    pl_strain: jnp.ndarray = None   # (M, P)
    pl_Hd: jnp.ndarray = None       # (M, max(P-1,1))
    pl_n: jnp.ndarray = None        # (M,) int32 true rows
    du_strain: jnp.ndarray = None   # (M, D) fracture strain
    du_triax: jnp.ndarray = None    # (M, D) triaxiality
    du_n: jnp.ndarray = None        # (M,) int32 true rows

    # ---- boundary/initial conditions ----
    bc_node: jnp.ndarray = None     # (K,) int32
    bc_axis: jnp.ndarray = None     # (K,) int32
    bc_value: jnp.ndarray = None    # (K,)
    bc_amp: jnp.ndarray = None      # (K,) int32 amplitude id, -1 = none
    bc_mask: jnp.ndarray = None     # (K,) bool
    bcd_mask: jnp.ndarray = None    # (3, N) bool dense prescribed-dof mask
    bcd_value: jnp.ndarray = None   # (3, N) dense prescribed values
    bcd_amp: jnp.ndarray = None     # (3, N) int32 amplitude id, -1 = none
    amp_time: jnp.ndarray = None    # (A, L)
    amp_value: jnp.ndarray = None   # (A, L)
    amp_n: jnp.ndarray = None       # (A,) int32 true knots
    velo0: jnp.ndarray = None       # (3, N) initial velocity
    vol_e: jnp.ndarray = None       # (E,) initial element volume (energy
    #                                 diagnostics; HAKAI_j.jl:183-197)

    # ---- contact ----
    pairs: Tuple[ContactPairArrays, ...] = ()
    # merged contact-kinematics gather: ONE (6, N) posvel gather feeds every
    # pair's q0/q1/q2/vel_j0/pos_i/vel_i/pos_jn slices instead of ~4 gather
    # launches per directional pair (the contact step on small decks is
    # launch-bound — car-crash-N22k spends ~0.56 ms/step outside the narrow
    # phase across ~30 launches; VERDICT r4 #5).  ckin_slices[p] =
    # ((t0s,t0e),(t1s,t1e),(t2s,t2e),(cs,ce),(js,je)) into the gathered
    # (6, R) array, per directional pair.
    plan_ckin: GatherPlan | None = None
    ckin_slices: tuple = dataclasses.field(metadata=dict(static=True),
                                           default=())

    # ---- Pallas blocked-gather plans (None -> XLA gather fallback) ----
    # nodal -> element gather of stacked (position, d_disp): (6,N) -> (6,8E)
    plan_pos: GatherPlan | None = None
    # slot-pure assembly gather: (3,8E) -> (3, VL*N); lane v reads
    # Qe[slot, e_v(n)] — a node is the same local corner of at most
    # `dup` elements per lane, so assembly needs no scatter at all.
    plan_asm: GatherPlan | None = None
    asm_mask: jnp.ndarray = None    # (VL, N) bool
    asm_vl: int = dataclasses.field(metadata=dict(static=True), default=0)
    # physical-layout assembly plan (preferred on TPU: consumes (3,8,E) Qe
    # directly, no relayouts, one output write per node tile); plan_asm
    # stays as the f64 / fallback path
    plan_asm2: AsmPhysPlan | None = None
    # fused in-kernel nodal gather plan (None -> separate gather + streamed
    # disp_e/dprev_e; see ops/gather_pallas.GatherPhysPlan)
    plan_gphys: GatherPhysPlan | None = None
    # RCM renumbering permutations (None = deck order used internally);
    # new internal id -> original deck id, 0-based (core/renumber.py)
    node_new2old: jnp.ndarray = None   # (n_node,) int32
    elem_new2old: jnp.ndarray = None   # (n_element,) int32
    # pre-gathered element-node coordinates (only with gather plans): the
    # fast chunk loop computes pos_e = coord_e + disp_e without re-gathering
    # static geometry every step
    coord_e: jnp.ndarray = None        # (3, 8, E)

    # critical explicit dt (dilatational wave, after mass scaling); the
    # reference has no stability check (SURVEY.md §5)
    cfl_dt: float = dataclasses.field(metadata=dict(static=True),
                                      default=float("inf"))

    @property
    def dtype(self):
        """Kinematic dtype (nodal state; f64 in mixed mode)."""
        return self.coord.dtype

    @property
    def edtype(self):
        """Element/contact math dtype (f32 in mixed mode)."""
        return self.G_e.dtype


def _instance_faces(model: Model, inst_idx: int):
    """Enumerate all 6*Ej faces of an instance with the reference's node
    orders and outward orientation (get_element_face, HAKAI_j.jl:1946-1992).

    Returns (faces (F,4) part-local 1-based, face_elem (F,) part-local
    1-based, exterior (F,) bool, twin_elem (F,) part-local 1-based or 0).
    """
    inst = model.instances[inst_idx]
    part = model.parts[inst.part_id - 1]
    cd = part.coordmat            # (3, n) part coords (pre-transform, as ref)
    el = part.elementmat.T        # (Ej, 8) 1-based
    nE = part.n_element

    faces = el[:, _FACE_SLOTS]                     # (Ej, 6, 4)
    faces = faces.reshape(nE * 6, 4)
    face_elem = np.repeat(np.arange(1, nE + 1), 6)

    # outward orientation fix
    p = cd[:, faces - 1]                           # (3, F, 4)
    ctr = cd[:, el - 1].mean(axis=2)               # (3, Ej)
    ctr = np.repeat(ctr, 6, axis=1)                # (3, F)
    v1 = p[:, :, 1] - p[:, :, 0]
    v2 = p[:, :, 3] - p[:, :, 0]
    nv = np.cross(v1.T, v2.T).T                    # (3, F)
    vc = ctr - p[:, :, 0]
    flip = (nv * vc).sum(axis=0) > 0.0
    faces[flip] = faces[flip][:, [0, 3, 2, 1]]

    # dedup by sorted key
    keys = np.sort(faces, axis=1)
    _, inv, counts = np.unique(keys, axis=0, return_inverse=True,
                               return_counts=True)
    exterior = counts[inv] == 1

    twin_elem = np.zeros(nE * 6, np.int64)
    order = np.argsort(inv, kind="stable")
    shared = counts[inv][order] == 2
    so = order[shared]                             # pairs adjacent in `so`
    a, b = so[0::2], so[1::2]
    twin_elem[a] = face_elem[b]
    twin_elem[b] = face_elem[a]
    return faces, face_elem, exterior, twin_elem


def _cand_nodes(model: Model, inst_idx: int, elements: np.ndarray,
                face_cache: dict, reexposure: bool = True):
    """Candidate surface nodes of an instance for one contact side.

    ``c_nodes`` of the reference grows monotonically: nodes on initially
    exterior (CP-filtered) faces, plus — after an element deletion — the
    nodes of the re-exposed shared faces (add_surface_triangle,
    HAKAI_j.jl:2167-2245).  A node is therefore active at runtime iff it was
    initially active or any owner of an internal face containing it has died.
    Returns (cand (C,), cand_init (C,), cand_twin (C, VT)) with global ids.

    ``reexposure=False`` reproduces the reference's self-pair surface-repair
    gap: for a pair with i_instance == j_instance only ``c_nodes_i`` is ever
    appended to (the ``elseif`` at HAKAI_j.jl:779/789 never fires), so the
    j-side node set is frozen at its initial value.
    """
    faces, face_elem, exterior, twin = face_cache[inst_idx]
    inst = model.instances[inst_idx]
    in_cp = np.isin(face_elem, elements)
    init_rows = exterior & in_cp
    if len(init_rows):
        # the reference's surface dedup loop runs j = 1:nE*6-1
        # (HAKAI_j.jl:2045), so the instance's very last face is never a
        # surface candidate even when exterior
        init_rows = init_rows.copy()
        init_rows[-1] = False
    gn = faces - 1 + inst.node_offset
    internal = (twin > 0) if reexposure else np.zeros(len(twin), bool)
    cand = np.unique(gn[init_rows | internal])
    cand_init = np.isin(cand, np.unique(gn[init_rows])) if init_rows.any() \
        else np.zeros(len(cand), bool)
    owners: dict = {}
    g_elem = face_elem - 1 + inst.element_offset
    g_twin = np.where(twin > 0, twin - 1 + inst.element_offset, -1)
    for r in np.nonzero(internal)[0]:
        for nd in gn[r]:
            s = owners.setdefault(nd, set())
            s.add(int(g_elem[r]))
            s.add(int(g_twin[r]))
    vt = max((len(s) for s in owners.values()), default=1)
    cand_twin = np.full((len(cand), vt), -1, np.int64)
    pos = {nd: k for k, nd in enumerate(cand)}
    for nd, s in owners.items():
        if nd in pos:
            cand_twin[pos[nd], :len(s)] = sorted(s)
    return cand, cand_init, cand_twin


def _pair_arrays(model: Model, cfg: SolverConfig, i_inst: int, j_inst: int,
                 elements_i: np.ndarray, elements_j: np.ndarray,
                 face_cache: dict, dtype, kw_n_pad: int,
                 kw_elem_np: np.ndarray, kw_diag_M_np: np.ndarray,
                 static_activity: bool = False) -> ContactPairArrays:
    """Lower one directional contact pair (global 0-based ids)."""
    if i_inst not in face_cache:
        face_cache[i_inst] = _instance_faces(model, i_inst)
    if j_inst not in face_cache:
        face_cache[j_inst] = _instance_faces(model, j_inst)

    inst_j = model.instances[j_inst]

    # --- triangle (j) side ---
    faces, face_elem, exterior, twin = face_cache[j_inst]
    in_cp = np.isin(face_elem, elements_j)
    init = exterior & in_cp
    if len(init):
        # last face is never a surface candidate (get_surface_triangle's
        # dedup loop stops at nE*6-1, HAKAI_j.jl:2045)
        init = init.copy()
        init[-1] = False
    g_nodes = faces - 1 + inst_j.node_offset                   # (F,4) global
    g_elem = face_elem - 1 + inst_j.element_offset
    g_twin = np.where(twin > 0, twin - 1 + inst_j.element_offset, -1)
    if i_inst == j_inst:
        # self pairs never receive re-exposed triangles: the reference's
        # surface repair updates only c_nodes_i for them (the j-side elseif
        # at HAKAI_j.jl:789 is unreachable when both ids match)
        g_twin = np.full_like(g_twin, -1)
    # two triangles per face: (1,2,3) and (3,4,1)  (HAKAI_j.jl:2140-2145)
    t1 = g_nodes[:, [0, 1, 2]]
    t2 = g_nodes[:, [2, 3, 0]]
    tri_nodes = np.stack([t1, t2], axis=1).reshape(-1, 3).T    # (3, 2F)
    tri_elem = np.repeat(g_elem, 2)
    tri_init = np.repeat(init, 2)
    tri_twin = np.repeat(g_twin, 2)

    if static_activity:
        # Fracture-free deck: element_flag can never change (erosion is the
        # only writer, HAKAI_j.jl:684-764, and it needs a *Damage Initiation
        # or *Tensile Failure table), so the re-exposure inventory — interior
        # twin faces that only become surface when their twin element dies —
        # is dead weight.  Cull everything not initially active: on the
        # car-crash decks this shrinks the narrow-phase/epilogue triangle
        # count ~3x and every downstream plan with it.
        keep = tri_init
        tri_nodes = tri_nodes[:, keep]
        tri_elem = tri_elem[keep]
        tri_twin = np.full(tri_elem.shape[0], -1, tri_twin.dtype)
        tri_init = np.ones(tri_elem.shape[0], bool)
    else:
        # Initially-active faces first within each 2048-wide segment: the raw
        # inventory interleaves exposed faces with their initially-dead twins,
        # which spreads the active set over every narrow-phase triangle block —
        # on the crash tube all 17 blocks of the self pair survive the
        # block-activity cull at 34% occupancy.  Dense-packed, the same cull
        # drops the dead blocks for free (erosion-exposed twins land in each
        # segment's tail blocks, activating only as erosion progresses).  The
        # partition stays INSIDE 2048-aligned segments — the gather-plan tile —
        # so every plan tile keeps the same index set and the diagonal window
        # plans survive (a global partition broke plan_tpos/tvel/fgt on the
        # 127k-triangle car inventory: 19x slowdown on the XLA fallbacks).
        # Twin links are element ids, so no index remap is needed; every plan
        # below is built post-permute.
        _n = tri_init.shape[0]
        perm = np.lexsort((np.arange(_n), ~tri_init, np.arange(_n) // 2048))
        tri_nodes = tri_nodes[:, perm]
        tri_elem = tri_elem[perm]
        tri_init = tri_init[perm]
        tri_twin = tri_twin[perm]

    cand, cand_init, cand_twin = _cand_nodes(model, i_inst, elements_i,
                                             face_cache)
    jc, jc_init, jc_twin = _cand_nodes(model, j_inst, elements_j, face_cache,
                                       reexposure=(i_inst != j_inst))
    if static_activity:
        cand = cand[cand_init]
        cand_init = np.ones(len(cand), bool)
        cand_twin = np.full((len(cand), 1), -1, np.int64)
        jc = jc[jc_init]
        jc_init = np.ones(len(jc), bool)
        jc_twin = np.full((len(jc), 1), -1, np.int64)

    # capacities
    n_tri_init = int(tri_init.sum())
    t_cap = cfg.contact.tri_capacity or min(
        tri_nodes.shape[1], _round_up(max(int(2.5 * n_tri_init), 16), 8))
    n_cap = cfg.contact.node_capacity or min(
        len(cand), _round_up(max(int(1.8 * cand_init.sum()), 16), 8))
    jn_cap = cfg.contact.node_capacity or min(
        len(jc), _round_up(max(int(1.8 * jc_init.sum()), 16), 8))

    young = model.materials[inst_j.material_id - 1].young

    # static gather plans for the per-step contact data (fallback to XLA
    # gathers when the numbering defeats them — blocked_gather checks ok)
    N_src = kw_n_pad
    plan_tpos, tslices = plan_segmented(
        [tri_nodes[0], tri_nodes[1], tri_nodes[2]], N_src)
    tpos_bounds = tuple((s.start, s.stop) for s in tslices)
    plan_tvel = plan_blocked_gather(tri_nodes[0], N_src)
    plan_inode = plan_blocked_gather(cand, N_src)
    plan_jnode = plan_blocked_gather(jc, N_src)

    # scatter-as-gather plans for the force accumulation (see contact.py)
    F2 = tri_nodes.shape[1]
    fgi_src = _round_up(max(len(cand), 128), 128)
    fgt_src = _round_up(max(F2, 128), 128)
    lanes_i = _dup_lanes(cand, np.arange(len(cand)), N_src)
    plan_fgi = plan_blocked_gather(
        np.concatenate([l[0] for l in lanes_i]), fgi_src,
        valid=np.concatenate([l[1] for l in lanes_i]), subgroups=4)
    fgi_mask = np.stack([l[1] for l in lanes_i])

    # triangle reactions accumulate over the pair's touched nodes only
    # (compact slot space tn): the dense (VL, target) lane sum then costs
    # VL*Nt instead of VL*N — on the 22k car deck the wall pair drops from
    # (36, 23k) to (36, 512).  A single _dup_lanes call over all three
    # vertices packs lanes by *total* node incidence (lower VL than three
    # per-vertex maxima).  plan_fx expands the compact sums back to (3, N).
    tn = np.unique(np.asarray(tri_nodes))                     # (Nt,) sorted
    fgt_n = _round_up(max(len(tn), 128), 128)
    t_targets = np.searchsorted(tn, np.asarray(tri_nodes).reshape(-1))
    src_all = np.tile(np.arange(F2), 3)
    lanes_t = _dup_lanes(t_targets, src_all, fgt_n)
    # max_w_rows=128: triangle inventories are denser than nodes (slope
    # F2/N up to ~6), so windows of node-sorted lanes span ~100 source rows
    plan_fgt = plan_blocked_gather(
        np.concatenate([l[0] for l in lanes_t]), fgt_src,
        valid=np.concatenate([l[1] for l in lanes_t]), subgroups=4,
        max_w_rows=128)
    fgt_mask = np.stack([l[1] for l in lanes_t])
    fgt_vl = len(lanes_t)
    fgt_segmask = fgt_strides = plan_pick = fgt_tnvalid = None
    fgt_k = 0
    if not plan_fgt.ok:
        # Large shell-like surfaces (e.g. the 127k-triangle car inventory)
        # defeat the lane plan: gaps in the touched-node space blow the tile
        # windows.  Fall back to a sorted-contribution segmented tree-sum:
        # gather force_t into node-sorted contribution order (slope ~1/3 —
        # diagonal-mode friendly), then log2(max degree) masked shift-adds
        # (a Hillis-Steele segmented suffix sum over the sorted keys; keys
        # are sorted, so key[i]==key[i+s] implies the whole range is one
        # segment), leaving each node's total at its segment start, which a
        # 1-lane pick gather extracts before the plan_fx expansion.
        order = np.argsort(t_targets, kind="stable")
        key = t_targets[order]
        K = 3 * F2
        plan_fgt = plan_blocked_gather(src_all[order], fgt_src, subgroups=4)
        seg_starts = np.searchsorted(key, np.arange(len(tn)))
        maxdeg = int(np.diff(np.concatenate([seg_starts, [K]])).max())
        strides = []
        s = 1
        while s < maxdeg:
            strides.append(s)
            s *= 2
        segmask = np.zeros((max(len(strides), 1), K), bool)
        for si, st in enumerate(strides):
            segmask[si, :K - st] = key[:K - st] == key[st:]
        Kp = _round_up(K, 128)
        pick = np.zeros(fgt_n, np.int64)
        pick[:len(tn)] = seg_starts
        tnvalid = np.zeros(fgt_n, bool)
        tnvalid[:len(tn)] = True
        plan_pick = plan_blocked_gather(pick, Kp, valid=tnvalid,
                                        max_w_rows=512)
        fgt_mask = None
        fgt_segmask = jnp.asarray(segmask)
        fgt_strides = tuple(strides)
        fgt_tnvalid = jnp.asarray(tnvalid)
        fgt_k = Kp
    fx_idx = np.zeros(N_src, np.int64)
    fx_mask = np.zeros(N_src, bool)
    fx_idx[tn] = np.arange(len(tn))
    fx_mask[tn] = True
    plan_fx = plan_blocked_gather(fx_idx, fgt_n, valid=fx_mask, subgroups=4)

    return ContactPairArrays(
        i_instance=i_inst, j_instance=j_inst, is_self=(i_inst == j_inst),
        young=float(young), tri_capacity=t_cap, node_capacity=n_cap,
        tri_nodes=jnp.asarray(tri_nodes, jnp.int32),
        tri_elem=jnp.asarray(tri_elem, jnp.int32),
        tri_init=jnp.asarray(tri_init),
        tri_twin=jnp.asarray(tri_twin, jnp.int32),
        cand_nodes=jnp.asarray(cand, jnp.int32),
        cand_init=jnp.asarray(cand_init),
        cand_twin=jnp.asarray(cand_twin, jnp.int32),
        jnode_nodes=jnp.asarray(jc, jnp.int32),
        jnode_init=jnp.asarray(jc_init),
        jnode_twin=jnp.asarray(jc_twin, jnp.int32),
        jnode_capacity=jn_cap,
        plan_tpos=plan_tpos, tpos_bounds=tpos_bounds, plan_tvel=plan_tvel,
        plan_inode=plan_inode, plan_jnode=plan_jnode,
        tri_enodes=(jnp.asarray(kw_elem_np[:, tri_elem], jnp.int32)
                    if i_inst == j_inst else None),
        cand_mass=jnp.asarray(kw_diag_M_np[cand], dtype),
        plan_fgi=plan_fgi, fgi_mask=jnp.asarray(fgi_mask),
        plan_fgt=plan_fgt,
        fgt_mask=(jnp.asarray(fgt_mask) if fgt_mask is not None else None),
        plan_fx=plan_fx, fx_mask=jnp.asarray(fx_mask),
        fgt_segmask=fgt_segmask, fgt_strides=fgt_strides or (),
        plan_pick=plan_pick, fgt_tnvalid=fgt_tnvalid, fgt_k=fgt_k,
        fgt_vl=fgt_vl, fgt_n=fgt_n, fgi_src=fgi_src, fgt_src=fgt_src,
        static_activity=static_activity,
    )


def _lower_contact(model: Model, cfg: SolverConfig, dtype, kw_n_pad=0,
                   kw_elem_np=None, kw_diag_M_np=None,
                   static_activity=False):
    """Build the directional pair list (HAKAI_j.jl:243-402)."""
    if model.contact_flag < 1:
        return (), None, ()
    ni = len(model.instances)
    cps = []   # (i1, i2, elements_1, elements_2) with 1-based part-local elsets
    if len(model.cps) == 0:
        # ALL EXTERIOR (HAKAI_j.jl:272-314)
        if ni > 1:
            for i in range(ni):
                js = i if model.contact_flag == 2 else i + 1
                for j in range(js, ni):
                    cps.append((i, j,
                                np.arange(1, model.instances[i].n_element + 1),
                                np.arange(1, model.instances[j].n_element + 1)))
        else:
            cps.append((0, 0,
                        np.arange(1, model.instances[0].n_element + 1),
                        np.arange(1, model.instances[0].n_element + 1)))
    else:
        for cp in model.cps:
            cps.append((cp.instance_id_1 - 1, cp.instance_id_2 - 1,
                        np.asarray(cp.elements_1), np.asarray(cp.elements_2)))

    face_cache: dict = {}
    pairs = []
    for (i1, i2, els1, els2) in cps:
        if i1 == i2:
            directional = [(i1, i2, els1, els2)]
        else:
            directional = [(i1, i2, els1, els2), (i2, i1, els2, els1)]
        for (ii, jj, ei, ej) in directional:
            pairs.append(_pair_arrays(model, cfg, ii, jj, ei, ej,
                                      face_cache, dtype, kw_n_pad,
                                      kw_elem_np, kw_diag_M_np,
                                      static_activity=static_activity))
    pairs = tuple(pairs)

    # merged contact-kinematics plan: one segmented gather over (6, N)
    # posvel covering every pair's triangle-vertex / candidate / j-node
    # index sets (see LoweredModel.plan_ckin)
    segs = []
    for p in pairs:
        tn = np.asarray(p.tri_nodes)
        segs += [tn[0], tn[1], tn[2],
                 np.asarray(p.cand_nodes), np.asarray(p.jnode_nodes)]
    plan_ckin = None
    ckin_slices = ()
    if segs:
        plan, slices = plan_segmented(segs, kw_n_pad)
        if plan.ok:
            plan_ckin = plan
            ckin_slices = tuple(
                tuple((s.start, s.stop) for s in slices[5 * pi:5 * pi + 5])
                for pi in range(len(pairs)))
    return pairs, plan_ckin, ckin_slices


def lower(model: Model, config: SolverConfig | None = None) -> LoweredModel:
    """Lower a parsed model; with ``config.renumber == "auto"`` retry with
    RCM renumbering when the deck's numbering defeats the gather plans;
    ``"always"`` renumbers unconditionally (the halo decomposition needs
    bandwidth-bounded numbering even when the plans happen to fit)."""
    cfg = config or SolverConfig()
    if cfg.renumber == "always" and model.n_element > 0:
        from .renumber import renumber_model
        m2, node_new2old, elem_new2old = renumber_model(model)
        return dataclasses.replace(
            _lower_impl(m2, cfg),
            node_new2old=jnp.asarray(node_new2old, jnp.int32),
            elem_new2old=jnp.asarray(elem_new2old, jnp.int32))
    if (cfg.renumber == "auto" and model.n_element >= _PLAN_TILE
            and model.n_node >= _PLAN_TILE and cfg.gather_mode != "xla"):
        # Gather plans will engage: renumber up-front.  renumber_model is
        # span-optimal by construction (it keeps the deck order when that
        # already has the smallest worst element-node span), and a smaller
        # span means tighter Pallas gather windows — measured +2.2% at 131k
        # and +1.8% at 1M on a v5e chip (docs/PERF.md round-3).
        from .renumber import renumber_model
        m2, node_new2old, elem_new2old = renumber_model(model)
        lm2 = _lower_impl(m2, cfg)
        if lm2.plan_pos is None or (lm2.plan_pos.ok and lm2.plan_asm.ok):
            return dataclasses.replace(
                lm2,
                node_new2old=jnp.asarray(node_new2old, jnp.int32),
                elem_new2old=jnp.asarray(elem_new2old, jnp.int32))
        # safety net: fall through to the deck ordering
    lm = _lower_impl(model, cfg)
    plans_bad = (cfg.gather_mode != "xla" and lm.plan_pos is not None
                 and not (lm.plan_pos.ok and lm.plan_asm.ok))
    if cfg.renumber == "auto" and plans_bad and model.n_element > 0:
        from .renumber import renumber_model
        m2, node_new2old, elem_new2old = renumber_model(model)
        lm2 = _lower_impl(m2, cfg)
        if lm2.plan_pos.ok and lm2.plan_asm.ok:
            return dataclasses.replace(
                lm2,
                node_new2old=jnp.asarray(node_new2old, jnp.int32),
                elem_new2old=jnp.asarray(elem_new2old, jnp.int32))
    return lm


def _lower_impl(model: Model, cfg: SolverConfig) -> LoweredModel:
    # "mixed": f64 nodal kinematics (where the accumulate-and-difference
    # cancellations live), f32 element/contact math (where the FLOPs are).
    # Stabilizes long contact runs at near-f32 speed (docs/PERF.md).
    if cfg.dtype == "mixed":
        kdtype = jnp.dtype(jnp.float64)
        dtype = jnp.dtype(jnp.float32)
    else:
        kdtype = dtype = jnp.dtype(cfg.dtype)
    if kdtype == jnp.float64:
        jax.config.update("jax_enable_x64", True)

    nN, nE = model.n_node, model.n_element
    node_pad, elem_pad = cfg.node_pad, cfg.elem_pad
    # Pallas gather plans only pay off for meshes with >= a few tiles;
    # tiny meshes keep XLA gathers (and tight padding for cheap CPU tests)
    tile = _PLAN_TILE
    use_plans = cfg.gather_mode != "xla" and nE >= tile and nN >= tile
    if use_plans:
        # gather-plan tiles must not straddle slot/lane segment boundaries:
        # pad the mesh axes to multiples of the tile size (masked padding)
        node_pad = int(np.lcm(node_pad, tile))
        elem_pad = int(np.lcm(elem_pad, tile))
    N = _round_up(max(nN, 1), node_pad)
    E = _round_up(max(nE, 1), elem_pad)

    coord = np.zeros((3, N))
    coord[:, :nN] = model.coordmat
    elem = np.zeros((8, E), np.int64)
    elem[:, :nE] = model.elementmat - 1
    elem_exists = np.zeros(E, bool)
    elem_exists[:nE] = True
    node_exists = np.zeros(N, bool)
    node_exists[:nN] = True

    pusai = pusai_hexa(cfg.integ_num)

    # --- element volumes / lumped mass (HAKAI_j.jl:183-218) ---
    epos = coord[:, elem[:, :nE]]                        # (3, 8, nE)
    J = np.einsum("kai,bie->kabe", pusai, epos)          # (8,3,3,nE)
    detJ = (J[:, 0, 0] * J[:, 1, 1] * J[:, 2, 2]
            + J[:, 0, 1] * J[:, 1, 2] * J[:, 2, 0]
            + J[:, 0, 2] * J[:, 1, 0] * J[:, 2, 1]
            - J[:, 0, 0] * J[:, 1, 2] * J[:, 2, 1]
            - J[:, 0, 1] * J[:, 1, 0] * J[:, 2, 2]
            - J[:, 0, 2] * J[:, 1, 1] * J[:, 2, 0])      # (8, nE)
    volume = detJ.sum(axis=0)                            # (nE,)

    mats = model.materials
    mat_id = np.zeros(E, np.int64)
    mat_id[:nE] = model.element_material - 1
    density_e = np.array([mats[m].density for m in mat_id[:nE]])
    node_mass_e = density_e * volume / 8.0
    diag_M = np.ones(N)  # padding nodes get unit mass (never forced)
    diag_M[:nN] = 0.0
    np.add.at(diag_M, elem[:, :nE].reshape(-1),
              np.broadcast_to(node_mass_e, (8, nE)).reshape(-1))
    diag_M[:nN] *= model.mass_scaling
    diag_M[nN:] = 1.0

    # --- element sizes (HAKAI_j.jl:405-421) ---
    p0 = epos[:, 0]
    L1 = np.linalg.norm(p0 - epos[:, 1], axis=0)
    L2 = np.linalg.norm(p0 - epos[:, 3], axis=0)
    L3 = np.linalg.norm(p0 - epos[:, 4], axis=0)
    sizes = np.stack([L1, L2, L3])
    element_min_size = float(sizes.min()) if nE else 0.0
    element_max_size = float(sizes.max()) if nE else 0.0

    # --- time stepping (HAKAI_j.jl:112-117) ---
    dt = model.d_time * np.sqrt(model.mass_scaling)
    time_num = int(np.floor(model.end_time / dt)) if dt > 0 else 0

    # --- CFL estimate (new; reference has none) ---
    cfl = float("inf")
    if nE:
        lam_v = np.array([mats[m].lam for m in mat_id[:nE]])
        G_v = np.array([mats[m].G for m in mat_id[:nE]])
        rho = np.maximum(density_e, 1e-300)
        c_wave = np.sqrt((lam_v + 2.0 * G_v) / rho)
        lmin_e = sizes.min(axis=0)
        cfl = float((lmin_e / np.maximum(c_wave, 1e-300)).min()
                    * np.sqrt(model.mass_scaling))

    # --- assembly incidence: node -> (slot i, element e) flattened i*E+e ---
    counts = np.zeros(N, np.int64)
    np.add.at(counts, elem[:, :nE].reshape(-1), 1)
    V = max(int(counts.max()), 1)
    inc_idx = np.zeros((V, N), np.int64)
    inc_mask = np.zeros((V, N), bool)
    flat_nodes = elem[:, :nE].reshape(-1)                      # (8*nE,)
    flat_src = (np.arange(8)[:, None] * E
                + np.arange(nE)[None, :]).reshape(-1)          # i*E+e
    order = np.argsort(flat_nodes, kind="stable")
    sn, ssrc = flat_nodes[order], flat_src[order]
    # slot index within each node group (cumcount)
    starts = np.concatenate([[0], np.nonzero(np.diff(sn))[0] + 1])
    grp_start = np.repeat(starts, np.diff(np.concatenate([starts, [len(sn)]])))
    slot = np.arange(len(sn)) - grp_start
    inc_idx[slot, sn] = ssrc
    inc_mask[slot, sn] = True

    # --- per-element material constants ---
    G = np.array([m.G for m in mats]) if mats else np.zeros(1)
    lam = np.array([m.lam for m in mats]) if mats else np.zeros(1)
    has_pl = np.array([m.plastic.shape[0] > 0 for m in mats]) if mats else np.zeros(1, bool)
    y0 = np.array([m.plastic[0, 0] if m.plastic.shape[0] else 0.0 for m in mats]) \
        if mats else np.zeros(1)
    G_e = G[mat_id]
    lam_e = lam[mat_id]
    has_plastic_e = has_pl[mat_id] & elem_exists
    yield0_e = y0[mat_id]

    # --- material tables (padded) ---
    M = max(len(mats), 1)
    P = max(max((m.plastic.shape[0] for m in mats), default=0), 2)
    pl_stress = np.zeros((M, P))
    pl_strain = np.full((M, P), np.inf)
    pl_Hd = np.zeros((M, P - 1))
    pl_n = np.zeros(M, np.int64)
    D = max(max((m.ductile.shape[0] for m in mats), default=0), 1)
    du_strain = np.zeros((M, D))
    du_triax = np.zeros((M, D))
    du_n = np.zeros(M, np.int64)
    for k, m in enumerate(mats):
        npp = m.plastic.shape[0]
        pl_n[k] = npp
        if npp:
            pl_stress[k, :npp] = m.plastic[:, 0]
            pl_strain[k, :npp] = m.plastic[:, 1]
            if npp > 1:
                pl_Hd[k, :npp - 1] = m.Hd
                pl_Hd[k, npp - 1:] = m.Hd[-1]
        nd = m.ductile.shape[0]
        du_n[k] = nd
        if nd:
            du_strain[k, :nd] = m.ductile[:, 0]
            du_triax[k, :nd] = m.ductile[:, 1]
            du_strain[k, nd:] = m.ductile[-1, 0]
            du_triax[k, nd:] = m.ductile[-1, 1]

    # flag_fracture semantics (HAKAI_j.jl:162-170): set by *Tensile Failure or
    # a ductile table; at runtime only the ductile path acts (the stress
    # criterion is commented out at HAKAI_j.jl:686-698).
    fracture_enabled = bool(any(m.ductile.shape[0] > 0 for m in mats)
                            or any(m.has_failure_stress for m in mats))

    # --- BCs: flatten + dedupe last-wins (reference applies blocks in order,
    #     later writes overwrite earlier ones; HAKAI_j.jl:585-617) ---
    amp_names = [a.name for a in model.amplitudes]
    entries = {}
    for bc in model.bcs:
        amp_id = amp_names.index(bc.amp_name) if bc.amp_name in amp_names else -1
        for dof, val in zip(bc.dof, bc.value if len(bc.value) == len(bc.dof)
                            else [bc.value[0]] * len(bc.dof)):
            for d in dof:
                node = (int(d) - 1) // 3
                axis = (int(d) - 1) % 3
                entries[(axis, node)] = (float(val), amp_id)
    K = _round_up(max(len(entries), 1), 8)
    bc_node = np.zeros(K, np.int64)
    bc_axis = np.zeros(K, np.int64)
    bc_value = np.zeros(K)
    bc_amp = np.full(K, -1, np.int64)
    bc_mask = np.zeros(K, bool)
    for k, ((axis, node), (val, amp_id)) in enumerate(entries.items()):
        bc_axis[k], bc_node[k], bc_value[k], bc_amp[k] = axis, node, val, amp_id
        bc_mask[k] = True
    # dense (3, N) mirrors for the per-step BC application: the compact
    # scatter rebuilt a dense mask + value array EVERY step inside the chunk
    # loop (~0.3 ms at 1M nodes of loop-invariant work XLA didn't hoist)
    bcd_mask = np.zeros((3, N), bool)
    bcd_value = np.zeros((3, N))
    bcd_amp = np.full((3, N), -1, np.int64)
    for (axis, node), (val, amp_id) in entries.items():
        bcd_mask[axis, node] = True
        bcd_value[axis, node] = val
        bcd_amp[axis, node] = amp_id

    A = max(len(model.amplitudes), 1)
    L = max(max((len(a.time) for a in model.amplitudes), default=0), 2)
    amp_time = np.zeros((A, L))
    amp_value = np.zeros((A, L))
    amp_n = np.full(A, 2, np.int64)
    for k, a in enumerate(model.amplitudes):
        la = len(a.time)
        amp_time[k, :la] = a.time
        amp_value[k, :la] = a.value
        if la:
            amp_time[k, la:] = a.time[-1] + np.arange(1, L - la + 1)
            amp_value[k, la:] = a.value[-1]
        amp_n[k] = max(la, 2)

    # --- initial velocity (HAKAI_j.jl:232-239) ---
    velo0 = np.zeros((3, N))
    for ic in model.ics:
        for dof, val in zip(ic.dof, ic.value):
            node = (np.asarray(dof) - 1) // 3
            axis = (np.asarray(dof) - 1) % 3
            velo0[axis, node] = val

    pairs, plan_ckin, ckin_slices = _lower_contact(
        model, cfg, dtype, kw_n_pad=N,
        kw_elem_np=elem, kw_diag_M_np=diag_M,
        static_activity=(not fracture_enabled and cfg.contact.static_cull))

    pl_tables = tuple(tuple((float(r[0]), float(r[1])) for r in m.plastic)
                      for m in mats)
    du_tables = tuple(tuple((float(r[0]), float(r[1])) for r in m.ductile)
                      for m in mats)

    # --- Pallas blocked-gather plans (ops/gather_pallas.py) ---
    plan_pos = plan_asm = plan_asm2 = plan_gphys = None
    asm_mask = None
    asm_vl = 0
    if use_plans:
        # subgroups=16/cap 768: the disp_e gather is DMA-issue bound in the
        # HBM-spill regime — merging 16 slot-tiles per window DMA measured
        # 731 -> 598 us/step at 1M on v5e (benchmarks/profile_gather_1m.py);
        # neutral at 131k where the gather is VMEM-resident
        plan_pos = plan_blocked_gather(elem.reshape(-1), N,
                                       valid=np.tile(elem_exists, 8),
                                       subgroups=16, m_w_cap=768)
        lanes = assembly_lanes(elem, nE, E, N)
        asm_vl = len(lanes)
        asm_idx = np.concatenate([l[0] for l in lanes])
        asm_mask = np.stack([l[1] for l in lanes])
        # NOTE: an in-kernel accumulation variant (node-block-major grouping
        # + blocked_assemble, which keeps the (3, vl*N) intermediate out of
        # HBM) measured ~100 us/step SLOWER: revisiting the output block
        # (index_map i // vl) defeats Pallas's output pipelining.  The plain
        # gather + XLA masked-sum stays (docs/PERF.md).
        plan_asm = plan_blocked_gather(asm_idx, 8 * E,
                                       valid=asm_mask.reshape(-1),
                                       subgroups=4)
        plan_asm2 = plan_assemble_phys(elem, nE, E, N)
        if not plan_asm2.ok:
            plan_asm2 = None
        # fused in-kernel nodal gather plan (element kernel tile = the MXU
        # packed kernel's tile); padding elements reference node 0, so the
        # fused gather reads real values the element flag later masks
        from ..ops.element import _TILE_E
        te = _TILE_E
        while E % te:
            te //= 2
        plan_gphys = plan_gather_phys(elem, N, E, te)
        if not plan_gphys.ok:
            plan_gphys = None

    return LoweredModel(
        pl_tables=pl_tables, du_tables=du_tables,
        n_node=nN, n_element=nE, N=N, E=E,
        dt=float(dt), end_time=float(model.end_time), time_num=time_num,
        mass_scaling=float(model.mass_scaling),
        contact_flag=int(model.contact_flag),
        cfl_dt=cfl,
        fracture_enabled=fracture_enabled,
        element_min_size=element_min_size, element_max_size=element_max_size,
        config=cfg,
        coord=jnp.asarray(coord, kdtype),
        elem=jnp.asarray(elem, jnp.int32),
        elem_exists=jnp.asarray(elem_exists),
        node_exists=jnp.asarray(node_exists),
        inc_idx=jnp.asarray(inc_idx, jnp.int32),
        inc_mask=jnp.asarray(inc_mask),
        diag_M=jnp.asarray(diag_M, kdtype),
        pusai=jnp.asarray(pusai, dtype),
        mat_id=jnp.asarray(mat_id, jnp.int32),
        G_e=jnp.asarray(G_e, dtype),
        lam_e=jnp.asarray(lam_e, dtype),
        has_plastic_e=jnp.asarray(has_plastic_e),
        yield0_e=jnp.asarray(yield0_e, dtype),
        pl_stress=jnp.asarray(pl_stress, dtype),
        pl_strain=jnp.asarray(pl_strain, dtype),
        pl_Hd=jnp.asarray(pl_Hd, dtype),
        pl_n=jnp.asarray(pl_n, jnp.int32),
        du_strain=jnp.asarray(du_strain, dtype),
        du_triax=jnp.asarray(du_triax, dtype),
        du_n=jnp.asarray(du_n, jnp.int32),
        bc_node=jnp.asarray(bc_node, jnp.int32),
        bc_axis=jnp.asarray(bc_axis, jnp.int32),
        bc_value=jnp.asarray(bc_value, kdtype),
        bc_amp=jnp.asarray(bc_amp, jnp.int32),
        bc_mask=jnp.asarray(bc_mask),
        bcd_mask=jnp.asarray(bcd_mask),
        bcd_value=jnp.asarray(bcd_value, kdtype),
        bcd_amp=jnp.asarray(bcd_amp, jnp.int32),
        amp_time=jnp.asarray(amp_time, kdtype),
        amp_value=jnp.asarray(amp_value, kdtype),
        amp_n=jnp.asarray(amp_n, jnp.int32),
        velo0=jnp.asarray(velo0, kdtype),
        vol_e=jnp.asarray(np.concatenate(
            [volume, np.zeros(E - nE)]), dtype),
        pairs=pairs, plan_ckin=plan_ckin, ckin_slices=ckin_slices,
        plan_pos=plan_pos,
        plan_asm=plan_asm,
        plan_asm2=plan_asm2,
        plan_gphys=plan_gphys,
        asm_mask=(jnp.asarray(asm_mask) if asm_mask is not None else None),
        asm_vl=asm_vl,
        # element-node coordinates centered on node 0 (computed in f64, so
        # the f32 cast carries no cancellation noise even for meshes far from
        # the origin); the Jacobian is translation-invariant
        coord_e=(jnp.asarray(coord[:, elem] - coord[:, elem[0]][:, None, :],
                             dtype) if use_plans else None),
    )
