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
  * the node integrator runs on owned rows only.

Contact is not routed through this path (parallel/sharding.py — the
product multi-chip path reachable via run(devices=N)/CLI --devices —
handles contact with a round-robin-partitioned narrow phase); the halo
step asserts the model has no contact pairs and remains the pod-scale
building block for contactless meshes beyond ~1M nodes.
"""
from __future__ import annotations

import dataclasses
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..core.lowering import LoweredModel
from ..core.state import SimState
from ..ops.element import element_update, triax_stress
from ..ops.erosion import erode
from ..solver.explicit import amplitude_values


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
    base: LoweredModel = None          # original (arrays unused in hot loop)

    elem_w: jnp.ndarray = None         # (S, 8, El) window-local node ids
    elem_gid: jnp.ndarray = None       # (S, El) global element ids (-1 pad)
    elem_alive0: jnp.ndarray = None    # (S, El) bool
    mat_id: jnp.ndarray = None         # (S, El)
    G_e: jnp.ndarray = None            # (S, El)
    lam_e: jnp.ndarray = None          # (S, El)
    has_plastic_e: jnp.ndarray = None  # (S, El)
    yield0_e: jnp.ndarray = None       # (S, El)
    diag_M: jnp.ndarray = None         # (S, No) owned nodal mass
    coord: jnp.ndarray = None          # (S, 3, No) owned coordinates
    node_exists: jnp.ndarray = None    # (S, No)
    bc_mask: jnp.ndarray = None        # (S, 3, No) prescribed-dof mask
    bc_value: jnp.ndarray = None       # (S, 3, No)
    bc_amp: jnp.ndarray = None         # (S, 3, No) int32 amplitude id (-1 none)
    velo0: jnp.ndarray = None          # (S, 3, No)


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class HaloState:
    t: jnp.ndarray
    disp: jnp.ndarray       # (S, 3, No)
    disp_pre: jnp.ndarray
    velo: jnp.ndarray
    Q: jnp.ndarray          # (S, 3, No)
    stress: jnp.ndarray     # (S, 6, 8, El)
    strain: jnp.ndarray
    eq_ps: jnp.ndarray      # (S, 8, El)
    yield_s: jnp.ndarray
    triax: jnp.ndarray
    element_flag: jnp.ndarray  # (S, El)

    def replace(self, **kw):
        return dataclasses.replace(self, **kw)


def partition(model: LoweredModel, n_shards: int) -> HaloModel:
    """Numpy lowering of a LoweredModel into shard-major halo arrays."""
    if model.pairs:
        raise ValueError("halo path does not support contact yet; "
                         "use parallel.sharding")
    N, E = model.N, model.E
    if N % n_shards:
        raise ValueError(f"padded node count {N} not divisible by {n_shards}")
    No = N // n_shards
    elem = np.asarray(model.elem)               # (8, E)
    exists = np.asarray(model.elem_exists)

    owner = np.clip(elem.min(axis=0) // No, 0, n_shards - 1)    # (E,)
    owner = np.where(exists, owner, n_shards - 1)  # park padding on last shard
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

    S = n_shards
    elem_w = np.zeros((S, 8, El), np.int64)
    elem_gid = np.full((S, El), -1, np.int64)
    alive0 = np.zeros((S, El), bool)
    mat_id = np.zeros((S, El), np.int64)
    fields = {k: np.zeros((S, El)) for k in ("G_e", "lam_e", "yield0_e")}
    hasp = np.zeros((S, El), bool)
    g_mat = np.asarray(model.mat_id)
    g_G = np.asarray(model.G_e)
    g_lam = np.asarray(model.lam_e)
    g_y0 = np.asarray(model.yield0_e)
    g_hp = np.asarray(model.has_plastic_e)
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
        hasp[d, :k] = g_hp[ids]

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

    dtype = model.dtype
    return HaloModel(
        n_shards=S, No=No, H=int(H), El=El, base=model,
        elem_w=jnp.asarray(elem_w, jnp.int32),
        elem_gid=jnp.asarray(elem_gid, jnp.int32),
        elem_alive0=jnp.asarray(alive0),
        mat_id=jnp.asarray(mat_id, jnp.int32),
        G_e=jnp.asarray(fields["G_e"], dtype),
        lam_e=jnp.asarray(fields["lam_e"], dtype),
        has_plastic_e=jnp.asarray(hasp),
        yield0_e=jnp.asarray(fields["yield0_e"], dtype),
        diag_M=jnp.asarray(shard_nodes(np.asarray(model.diag_M)), dtype),
        coord=jnp.asarray(shard_nodes(np.asarray(model.coord)), dtype),
        node_exists=jnp.asarray(shard_nodes(np.asarray(model.node_exists))),
        bc_mask=jnp.asarray(shard_nodes(bc_mask)),
        bc_value=jnp.asarray(shard_nodes(bc_value), dtype),
        bc_amp=jnp.asarray(shard_nodes(bc_amp), jnp.int32),
        velo0=jnp.asarray(shard_nodes(np.asarray(model.velo0)), dtype),
    )


def init_halo_state(hm: HaloModel) -> HaloState:
    dt = hm.base.dtype
    S, No, El = hm.n_shards, hm.No, hm.El
    z3 = jnp.zeros((S, 3, No), dt)
    return HaloState(
        t=jnp.zeros((), jnp.int32),
        disp=z3, disp_pre=-hm.velo0 * jnp.asarray(hm.base.dt, dt),
        velo=hm.velo0, Q=z3,
        stress=jnp.zeros((S, 6, 8, El), dt),
        strain=jnp.zeros((S, 6, 8, El), dt),
        eq_ps=jnp.zeros((S, 8, El), dt),
        yield_s=jnp.broadcast_to(hm.yield0_e[:, None], (S, 8, El)).astype(dt),
        triax=jnp.zeros((S, 8, El), dt),
        element_flag=hm.elem_alive0,
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


def _halo_step(hm: HaloModel, s: HaloState) -> HaloState:
    base = hm.base
    dt = jnp.asarray(base.dt, base.dtype)
    H = hm.H
    t = s.t + 1
    ct = t.astype(base.dtype) * dt

    a1 = hm.diag_M / dt**2
    a2 = hm.diag_M * base.config.damping_C / (2.0 * dt)
    disp_new = (-s.Q + a1 * (2.0 * s.disp - s.disp_pre)
                + a2 * s.disp_pre) / (a1 + a2)
    ampv = amplitude_values(base, ct)
    fac = jnp.where(hm.bc_amp >= 0, ampv[jnp.clip(hm.bc_amp, 0, None)], 1.0)
    disp_new = jnp.where(hm.bc_mask, hm.bc_value * fac, disp_new)
    disp_new = jnp.where(hm.node_exists, disp_new, 0.0)

    d_disp = disp_new - s.disp
    velo = d_disp / dt
    position = hm.coord + disp_new

    pos_w = _exchange_window(position, H)
    dd_w = _exchange_window(d_disp, H)

    # reuse the single-chip element kernel on the window with a local model
    lm = dataclasses.replace(
        base, elem=hm.elem_w, mat_id=hm.mat_id, G_e=hm.G_e, lam_e=hm.lam_e,
        has_plastic_e=hm.has_plastic_e, yield0_e=hm.yield0_e,
        plan_pos=None, plan_asm=None, asm_mask=None, asm_vl=0)
    res = element_update(lm, pos_w, dd_w, s.stress, s.strain, s.eq_ps,
                         s.yield_s, s.element_flag)
    W = hm.No + 2 * H
    fw = jnp.zeros((3, W), base.dtype).at[:, hm.elem_w].add(res.Qe)
    Q = _return_ghosts(fw, H)

    triax = triax_stress(res.stress)
    flag = s.element_flag
    stress, strain = res.stress, res.strain
    if base.fracture_enabled:
        er = erode(lm, stress, strain, res.eq_ps, triax, flag)
        flag, stress, strain = er.element_flag, er.stress, er.strain

    return s.replace(t=t, disp=disp_new, disp_pre=s.disp, velo=velo, Q=Q,
                     stress=stress, strain=strain, eq_ps=res.eq_ps,
                     yield_s=res.yield_s, triax=triax, element_flag=flag)


def make_halo_step(hm: HaloModel, mesh: Mesh, n_steps: int = 1):
    S = hm.n_shards
    if mesh.devices.size != S:
        raise ValueError("mesh size must equal n_shards")

    def spec_of(rank):
        return P(*(["dp"] + [None] * (rank - 1)))

    mspec = dataclasses.replace(
        hm,
        base=jax.tree_util.tree_map(lambda _: P(), hm.base),
        **{f.name: spec_of(np.ndim(getattr(hm, f.name)))
           for f in dataclasses.fields(hm)
           if f.name != "base" and not f.metadata.get("static")})
    sspec = HaloState(
        t=P(), **{f.name: spec_of(np.ndim(getattr(init_halo_state(hm),
                                                  f.name)))
                  for f in dataclasses.fields(HaloState) if f.name != "t"})

    def body(m, st):
        # strip the leading shard axis (size 1 per device) inside shard_map
        def unlead(x):
            return x[0] if hasattr(x, "shape") and x.ndim >= 1 else x
        mm = dataclasses.replace(
            m, **{f.name: unlead(getattr(m, f.name))
                  for f in dataclasses.fields(m)
                  if f.name != "base" and not f.metadata.get("static")})
        stt = HaloState(t=st.t, **{f.name: unlead(getattr(st, f.name))
                                   for f in dataclasses.fields(HaloState)
                                   if f.name != "t"})
        out = jax.lax.fori_loop(0, n_steps, lambda _, x: _halo_step(mm, x),
                                stt)
        relead = lambda x: x[None] if hasattr(x, "shape") else x
        return HaloState(t=out.t, **{f.name: relead(getattr(out, f.name))
                                     for f in dataclasses.fields(HaloState)
                                     if f.name != "t"})

    fn = jax.shard_map(body, mesh=mesh, in_specs=(mspec, sspec),
                       out_specs=sspec, check_vma=False)
    jitted = jax.jit(fn)
    return lambda st: jitted(hm, st)


def gather_state(hm: HaloModel, s: HaloState) -> SimState:
    """Host-side reassembly into a single-chip SimState view: node fields
    are concatenated shard-major; element fields scatter back to global
    element order through the shard->global permutation kept at
    partition time (elem_gid), so halo runs can emit full VTK frames."""
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
    )
