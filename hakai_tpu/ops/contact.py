"""Penalty contact: node-vs-triangle narrow phase with AABB + uniform-grid
cell culling.

Re-design of ``cal_contact_force`` (HAKAI-v0.0.2/Julia/HAKAI_j.jl:2248-2706)
and its CUDA twin (``gpu_contact``, :2899-3157) with static shapes:

  * the *complete* face inventory (with twin links) was pre-enumerated at
    lowering; per step, activity is a mask over it — a mask flip replaces the
    reference's dynamic surface appends (add_surface_triangle, :2167-2245);
  * all per-step data movement uses *static* index sets (triangle vertices,
    candidate nodes), so positions/velocities stream through the Pallas
    blocked-gather (ops/gather_pallas.py) with plans built at lowering —
    no dynamic gathers anywhere;
  * the reference's culls are reproduced exactly: AABB-overlap early-out
    (:2284-2307), per-axis triangle range cull (:2403-2421), node range cull
    (:2516-2521), circumradius cull (:2525-2528), and the +-1 uniform-grid
    cell test (:2331-2363, 2487-2492) with cell = ceil((p-min)/ddiv),
    ddiv = 1.1*elementMaxSize (0.6 for self-contact);
  * the narrow phase solves [v1 v2 -n] x = p-q0 in closed form
    (my3SolveAb, :3342-3372), accepts 0<=x1, 0<=x2, x1+x2<=1, 0<d<=0.3*minsize
    (:2553-2554), then applies penalty + damping + Coulomb friction
    (:2576-2618) with k = young*S/Lmax*kc;
  * the (triangle-block x node-block) narrow phase runs only over blocks
    that contain active in-range work: block-activity lists are compacted and
    the loops use *dynamic trip counts*, so compute tracks the true contact
    region while every shape stays static;
  * scatter of +f to the node and -f/3 to the triangle vertices
    (:2653-2667) is a deterministic scatter-add over static index arrays —
    no per-thread Float128 buffers or atomics needed.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.lowering import ContactPairArrays, LoweredModel
from .gather_pallas import blocked_gather


def _node_active(flag, init, twins):
    tw_dead = (twins >= 0) & ~flag[jnp.clip(twins, 0, None)]
    return init | tw_dead.any(axis=1)


def pair_activity(pair: ContactPairArrays, flag):
    """(tri_active, ni_active, nj_active) masks over the static inventory —
    pure function of the element life mask (the reference's dynamic surface
    appends, add_surface_triangle HAKAI_j.jl:2167-2245, as mask flips).

    None on statically-culled pairs (fracture-free decks: the inventory was
    culled at lowering and activity is compile-time all-true)."""
    if pair.static_activity:
        return None
    twin_dead = ((pair.tri_twin >= 0)
                 & ~flag[jnp.clip(pair.tri_twin, 0, None)])
    tri_active = (pair.tri_init | twin_dead) & flag[pair.tri_elem]  # (2F,)
    ni_active = _node_active(flag, pair.cand_init, pair.cand_twin)  # (Ci,)
    nj_active = _node_active(flag, pair.jnode_init, pair.jnode_twin)
    return tri_active, ni_active, nj_active


def contact_activity(model: LoweredModel, flag):
    """Per-pair activity masks for the whole model (see pair_activity).

    Because these are pure functions of ``flag`` — which only erosion ever
    writes (HAKAI_j.jl:684-764) — callers that step many times can compute
    them ONCE and re-derive only on steps where a deletion actually fired
    (solver.explicit carries them through the chunk loop under a
    ``lax.cond`` on the erosion delete mask)."""
    return tuple(pair_activity(p, flag) for p in model.pairs)


def _compact(mask: jnp.ndarray, cap: int) -> jnp.ndarray:
    """Indices of the first ``cap`` True entries (in order), 0-padded.

    cumsum+scatter formulation — compiles leaner on TPU than jnp.nonzero.
    """
    F = mask.shape[0]
    pos = jnp.cumsum(mask) - 1
    tgt = jnp.where(mask, pos, cap)
    return jnp.zeros(cap, jnp.int32).at[tgt].set(
        jnp.arange(F, dtype=jnp.int32), mode="drop")


def _masked_minmax(x, valid):
    if valid is None:
        return x.min(axis=-1), x.max(axis=-1)
    big = jnp.asarray(jnp.inf, x.dtype)
    mn = jnp.where(valid, x, big).min(axis=-1)
    mx = jnp.where(valid, x, -big).max(axis=-1)
    return mn, mx


def _gather(src, plan, idx):
    """Static-index gather: Pallas plan when usable, XLA otherwise."""
    if plan is not None:
        return blocked_gather(src, plan)
    return src[:, idx]


def _pad_last(a, n_to, fill=0):
    pad = [(0, 0)] * (a.ndim - 1) + [(0, n_to - a.shape[-1])]
    return jnp.pad(a, pad, constant_values=fill)


def _pair_force(model: LoweredModel, pair: ContactPairArrays,
                position, velo, flag, axis_name=None, activity=None,
                kin=None, ksl=None):
    cfgc = model.config.contact
    dt = position.dtype
    N = position.shape[1]
    kc = cfgc.kc_self if pair.is_self else cfgc.kc
    Cr = cfgc.Cr_self if pair.is_self else cfgc.Cr
    ddiv = model.element_max_size * (cfgc.ddiv_scale_self if pair.is_self
                                     else cfgc.ddiv_scale)
    d_lim = model.element_min_size * cfgc.d_lim_scale
    myu = cfgc.myu

    F2 = pair.tri_nodes.shape[1]          # full triangle inventory (2F)
    Ci = pair.cand_nodes.shape[0]
    Cj = pair.jnode_nodes.shape[0]

    # --- activity masks over the static inventory (compile-time all-true
    # on fracture-free decks: the inventory was culled at lowering) ---
    if pair.static_activity:
        tri_active = ni_active = nj_active = None
    elif activity is not None:
        # chunk-carried masks (see contact_activity): recomputed by the
        # caller only on steps where erosion fired
        tri_active, ni_active, nj_active = activity
    else:
        tri_active, ni_active, nj_active = pair_activity(pair, flag)

    # --- static-plan gathers of the step's kinematics ---
    if kin is not None:
        # slices of the ONE merged posvel gather (model.plan_ckin) the
        # caller ran for all pairs — no per-pair gather launches
        (t0s, t0e), (t1s, t1e), (t2s, t2e), (cs, ce), (js, je) = ksl
        q0, q1, q2 = kin[:3, t0s:t0e], kin[:3, t1s:t1e], kin[:3, t2s:t2e]
        vel_j0 = kin[3:, t0s:t0e]
        pos_i, vel_i = kin[:3, cs:ce], kin[3:, cs:ce]
        pos_jn = kin[:3, js:je]
    else:
        posvel = jnp.concatenate([position, velo], axis=0)           # (6, N)
        pv_i = _gather(posvel, pair.plan_inode, pair.cand_nodes)     # (6, Ci)
        pos_i, vel_i = pv_i[:3], pv_i[3:]
        pos_jn = _gather(position, pair.plan_jnode, pair.jnode_nodes)  # (3, Cj)
        if pair.plan_tpos is not None:
            q_flat = blocked_gather(position, pair.plan_tpos)
            (a0, b0), (a1, b1), (a2, b2) = pair.tpos_bounds
            q0 = q_flat[:, a0:b0]
            q1 = q_flat[:, a1:b1]
            q2 = q_flat[:, a2:b2]
        else:
            q0 = position[:, pair.tri_nodes[0]]
            q1 = position[:, pair.tri_nodes[1]]
            q2 = position[:, pair.tri_nodes[2]]
        vel_j0 = _gather(velo, pair.plan_tvel, pair.tri_nodes[0])    # (3, 2F)

    # --- AABBs over the two active node sets (HAKAI_j.jl:2284-2315) ---
    min_i, max_i = _masked_minmax(
        pos_i, None if ni_active is None else ni_active[None])
    min_j, max_j = _masked_minmax(
        pos_jn, None if nj_active is None else nj_active[None])
    range_min = jnp.maximum(min_i, min_j)
    range_max = jnp.minimum(max_i, max_j)
    overlap = jnp.all(range_min <= range_max)
    if tri_active is not None:
        overlap &= tri_active.any() & ni_active.any()
    all_min = jnp.minimum(min_i, min_j)              # (3,)

    TB = min(cfgc.tri_block_self if pair.is_self else cfgc.tri_block, F2)
    nbc = cfgc.node_block_self if pair.is_self else cfgc.node_block
    nb = max(min(nbc, Ci, (1 << 21) // TB), 8)
    tri_chunks = -(-F2 // TB)
    n_chunks = -(-Ci // nb)
    Tp, Cp = tri_chunks * TB, n_chunks * nb

    def compute(_):
        # --- O(F) prologue: only the range cull and block AABBs touch the
        # full inventory; all heavier per-triangle geometry (normals,
        # adjugate rows, circumradius, penalty stiffness) happens *inside*
        # the narrow-phase loop on (3, TB) slices — per trip that's ~50k
        # flops next to the (TB, nb) narrow phase's millions, and it keeps
        # the prologue from scaling with inventories like the 127k-triangle
        # car surface when only a handful of blocks have work. ---
        # range cull (:2403-2421)
        t_out_lo = ((q0 < range_min[:, None]) & (q1 < range_min[:, None])
                    & (q2 < range_min[:, None])).any(axis=0)
        t_out_hi = ((q0 > range_max[:, None]) & (q1 > range_max[:, None])
                    & (q2 > range_max[:, None])).any(axis=0)
        tri_in = ~(t_out_lo | t_out_hi)                              # (2F,)
        if tri_active is not None:
            tri_in &= tri_active

        cell_i = jnp.ceil((pos_i - all_min[:, None]) / ddiv).astype(jnp.int32)
        node_in = ((pos_i >= range_min[:, None])
                   & (pos_i <= range_max[:, None])).all(axis=0)
        if ni_active is not None:
            node_in &= ni_active

        # --- hierarchical broad phase over (triangle-block, node-block)
        # pairs.  The reference's 3-D uniform grid (HAKAI_j.jl:2324-2363)
        # gives O(cell) candidates per triangle; the static-shape analogue is
        # a block-level cull: per-block AABBs (q0-based on the triangle side,
        # because the narrow phase's +-1 cell test keys on vertex 0) overlap-
        # tested with a conservative 2*ddiv pad (|cell diff| <= 1 implies
        # |q0 - p| < 2*ddiv per axis), then only surviving pairs run the
        # dense (TB, nb) narrow phase.  With bandwidth-ordered numbering
        # (core/renumber.py) blocks are spatially local, so surviving pairs
        # track the true contact region instead of the full cross product. ---
        tri_blk_any = _pad_last(tri_in, Tp, False).reshape(tri_chunks, TB
                                                           ).any(axis=1)
        n_blk_any = _pad_last(node_in, Cp, False).reshape(n_chunks, nb
                                                          ).any(axis=1)
        big = jnp.asarray(jnp.inf, dt)
        q0_p = _pad_last(q0, Tp)
        tin_f = _pad_last(tri_in, Tp, False)
        bmin_t = jnp.where(tin_f, q0_p, big).reshape(3, tri_chunks, TB
                                                     ).min(axis=2)
        bmax_t = jnp.where(tin_f, q0_p, -big).reshape(3, tri_chunks, TB
                                                      ).max(axis=2)
        pos_pp = _pad_last(pos_i, Cp)
        nin_f = _pad_last(node_in, Cp, False)
        bmin_n = jnp.where(nin_f, pos_pp, big).reshape(3, n_chunks, nb
                                                       ).min(axis=2)
        bmax_n = jnp.where(nin_f, pos_pp, -big).reshape(3, n_chunks, nb
                                                        ).max(axis=2)
        pad = 2.0 * ddiv
        pair_ok = ((bmin_t[:, :, None] - pad <= bmax_n[:, None, :])
                   & (bmin_n[:, None, :] - pad <= bmax_t[:, :, None])
                   ).all(axis=0)                      # (tri_chunks, n_chunks)
        pair_ok &= tri_blk_any[:, None] & n_blk_any[None, :]
        n_pairs = tri_chunks * n_chunks
        pair_ids = _compact(pair_ok.reshape(-1), n_pairs)
        act_p = pair_ok.sum()

        # padded per-tri / per-node data for dynamic slicing
        tri_vec = [_pad_last(x, Tp) for x in (q0, q1, q2, vel_j0)]  # (3, Tp)
        young_p = _pad_last(
            jnp.broadcast_to(jnp.asarray(pair.young, dt), (F2,)), Tp)
        tin_p = _pad_last(tri_in, Tp, False)
        en_p = (_pad_last(pair.tri_enodes, Tp) if pair.is_self else None)

        pos_p = _pad_last(pos_i, Cp)
        vel_p = _pad_last(vel_i, Cp)
        cell_p = _pad_last(cell_i, Cp, -9)
        nin_p = _pad_last(node_in, Cp, False)
        ids_p = _pad_last(pair.cand_nodes, Cp)
        mi_p = _pad_last(pair.cand_mass, Cp)

        def blk_pair(pi, carry):
            force_i, force_t = carry
            z = jnp.zeros((), jnp.int32)
            pid = pair_ids[pi]
            t0 = (pid // n_chunks) * TB
            c0 = (pid % n_chunks) * nb
            q0c, q1c, q2c, vj0c = (
                jax.lax.dynamic_slice(x, (z, t0), (3, TB)) for x in tri_vec)
            youngc = jax.lax.dynamic_slice(young_p, (t0,), (TB,))
            tinc = jax.lax.dynamic_slice(tin_p, (t0,), (TB,))
            enc = (jax.lax.dynamic_slice(en_p, (z, t0), (8, TB))
                   if pair.is_self else None)

            # --- per-triangle geometry for this block only ---
            ctrc = (q0c + q1c + q2c) / 3.0
            Rmaxc = jnp.sqrt(jnp.maximum(jnp.maximum(
                ((q0c - ctrc) ** 2).sum(0), ((q1c - ctrc) ** 2).sum(0)),
                ((q2c - ctrc) ** 2).sum(0)))
            v1 = q1c - q0c
            v2 = q2c - q0c
            L1 = jnp.sqrt((v1 ** 2).sum(0))
            L2 = jnp.sqrt((v2 ** 2).sum(0))
            safe_L = jnp.where(jnp.maximum(L1, L2) == 0, 1.0,
                               jnp.maximum(L1, L2))
            cr = jnp.stack([v1[1] * v2[2] - v1[2] * v2[1],
                            v1[2] * v2[0] - v1[0] * v2[2],
                            v1[0] * v2[1] - v1[1] * v2[0]])
            mag_n = jnp.sqrt((cr ** 2).sum(0))
            nrmc = cr / jnp.where(mag_n == 0, 1.0, mag_n)     # (3, TB)
            d12 = (v1 * v2).sum(0)
            S = 0.5 * jnp.sqrt(jnp.maximum(L1**2 * L2**2 - d12**2, 0.0))
            kpenc = youngc * S / safe_L * kc                  # (TB,)
            cellj0c = jnp.ceil((q0c - all_min[:, None]) / ddiv
                               ).astype(jnp.int32)

            # det(A), adjugate rows of A=[v1 v2 -n] (my3SolveAb, :3342-3372)
            A = (v1, v2, -nrmc)
            detA = (A[0][0] * A[1][1] * A[2][2] + A[1][0] * A[2][1] * A[0][2]
                    + A[2][0] * A[0][1] * A[1][2]
                    - A[0][0] * A[2][1] * A[1][2]
                    - A[1][0] * A[0][1] * A[2][2]
                    - A[2][0] * A[1][1] * A[0][2])
            safe_det = jnp.where(detA == 0, 1.0, detA)

            def inv_row(r):
                c1, c2 = (r + 1) % 3, (r + 2) % 3
                return jnp.stack([
                    A[c1][1] * A[c2][2] - A[c2][1] * A[c1][2],
                    A[c2][0] * A[c1][2] - A[c1][0] * A[c2][2],
                    A[c1][0] * A[c2][1] - A[c2][0] * A[c1][1],
                ]) / safe_det                                 # (3, TB)
            im0c, im1c, im2c = inv_row(0), inv_row(1), inv_row(2)

            p = jax.lax.dynamic_slice(pos_p, (z, c0), (3, nb))
            vi = jax.lax.dynamic_slice(vel_p, (z, c0), (3, nb))
            ci = jax.lax.dynamic_slice(cell_p, (z, c0), (3, nb))
            nin = jax.lax.dynamic_slice(nin_p, (c0,), (nb,))
            ids = jax.lax.dynamic_slice(ids_p, (c0,), (nb,))
            mi = jax.lax.dynamic_slice(mi_p, (c0,), (nb,))

            # pair masks (TB, nb); +-1 uniform-grid cell test (:2487-2492)
            cell_ok = (jnp.abs(cellj0c[:, :, None] - ci[:, None, :]) <= 1
                       ).all(axis=0)
            m = tinc[:, None] & nin[None, :] & cell_ok
            if pair.is_self:
                own = (enc[:, :, None] == ids[None, None, :]).any(axis=0)
                m &= ~own
            dpc = jnp.sqrt(((p[:, None, :] - ctrc[:, :, None]) ** 2).sum(0))
            m &= dpc < Rmaxc[:, None]

            b = p[:, None, :] - q0c[:, :, None]               # (3, TB, nb)
            x1 = (im0c[:, :, None] * b).sum(0)
            x2 = (im1c[:, :, None] * b).sum(0)
            d = (im2c[:, :, None] * b).sum(0)
            m &= (x1 >= 0.0) & (x2 >= 0.0) & (x1 + x2 <= 1.0) \
                & (d > 0.0) & (d <= d_lim)

            F = jnp.where(m, kpenc[:, None] * d, 0.0)         # (TB, nb)
            vrel = vi[:, None, :] - vj0c[:, :, None]          # (3, TB, nb)
            mag_v = jnp.sqrt((vrel ** 2).sum(0))
            ve = vrel / jnp.where(mag_v == 0, 1.0, mag_v)
            ve = jnp.where(mag_v > 0, ve, 0.0)
            dot_vn = (ve * nrmc[:, :, None]).sum(0)
            vs = ve - dot_vn * nrmc[:, :, None]
            Cd = 2.0 * jnp.sqrt(mi[None, :] * kpenc[:, None]) * Cr
            f = (F * nrmc[:, :, None]
                 - myu * F * vs
                 - jnp.where(m, Cd, 0.0) * vrel)              # (3, TB, nb)
            f = jnp.where(m[None], f, 0.0)

            fi = jax.lax.dynamic_slice(force_i, (z, c0), (3, nb))
            force_i = jax.lax.dynamic_update_slice(
                force_i, fi + f.sum(axis=1), (z, c0))
            ft = jax.lax.dynamic_slice(force_t, (z, t0), (3, TB))
            force_t = jax.lax.dynamic_update_slice(
                force_t, ft + f.sum(axis=2) / 3.0, (z, t0))
            return force_i, force_t

        if axis_name is not None:
            # partitioned narrow phase under shard_map: device d takes every
            # n-th surviving block pair (round-robin over the compacted
            # list), partial compact forces are psum'd, and the epilogue
            # below runs replicated.  Communication is the small compact
            # (3, Cp)+(3, Tp) arrays, not the (3, N) force — and the
            # O(TB*nb) narrow-phase flops split n ways (the reference's
            # only contact parallelism is shared-memory @floop,
            # HAKAI_j.jl:2370).
            n_dev = jax.lax.axis_size(axis_name)
            d_idx = jax.lax.axis_index(axis_name)
            trips = (act_p + n_dev - 1 - d_idx) // n_dev

            def blk_pair_strided(i, carry):
                return blk_pair(d_idx + i * n_dev, carry)

            force_i, force_t = jax.lax.fori_loop(
                0, trips, blk_pair_strided,
                (jnp.zeros((3, Cp), dt), jnp.zeros((3, Tp), dt)))
            force_i = jax.lax.psum(force_i, axis_name)
            force_t = jax.lax.psum(force_t, axis_name)
        else:
            force_i, force_t = jax.lax.fori_loop(
                0, act_p, blk_pair,
                (jnp.zeros((3, Cp), dt), jnp.zeros((3, Tp), dt)))
        if pair.plan_fgi is not None:
            # scatter-as-gather: each node sums its (masked) contributions in
            # lanes — XLA's scatter-add is serial on TPU (~0.9 ms per vertex
            # scatter on the 22k car deck; this path is ~50x cheaper)
            fi = _pad_last(force_i[:, :Ci], pair.fgi_src)
            gi = blocked_gather(fi, pair.plan_fgi)       # (3, VLi*N)
            gi = gi.reshape(3, -1, N)
            g = jnp.where(pair.fgi_mask[None], gi, 0.0).sum(axis=1)
            # triangle reactions: accumulate in the compact touched-node
            # space (Nt << N), then one 1-lane expansion gather to (3, N)
            ft = _pad_last(force_t[:, :F2], pair.fgt_src)
            if pair.fgt_segmask is not None:
                # sorted-contribution segmented tree-sum (big surfaces):
                # gather into node-sorted order, Hillis-Steele suffix sum
                # within key segments, pick each segment's start slot
                c = blocked_gather(ft, pair.plan_fgt)    # (3, 3F) sorted
                for si, s in enumerate(pair.fgt_strides):
                    sh = jnp.pad(c[:, s:], ((0, 0), (0, s)))
                    c = c + jnp.where(pair.fgt_segmask[si][None], sh, 0.0)
                c = _pad_last(c, pair.fgt_k)
                f_tn = blocked_gather(c, pair.plan_pick)  # (3, Nt)
                f_tn = jnp.where(pair.fgt_tnvalid[None], f_tn, 0.0)
            else:
                gt = blocked_gather(ft, pair.plan_fgt)   # (3, VLt*Nt)
                gt = gt.reshape(3, pair.fgt_vl, pair.fgt_n)
                f_tn = jnp.where(pair.fgt_mask[None], gt, 0.0).sum(axis=1)
            fx = blocked_gather(f_tn, pair.plan_fx)[:, :N]
            g = g - jnp.where(pair.fx_mask[None], fx, 0.0)
            return g

        force_i = force_i[:, :Ci]
        force_t = force_t[:, :F2]

        g = jnp.zeros((3, N), dt)
        g = g.at[:, pair.cand_nodes].add(force_i, mode="drop")
        for v in range(3):
            g = g.at[:, pair.tri_nodes[v]].add(-force_t, mode="drop")
        return g

    return jax.lax.cond(overlap, compute,
                        lambda _: jnp.zeros((3, N), dt), None)


def contact_forces_pv(model: LoweredModel, position, velo, element_flag,
                      axis_name=None, activity=None) -> jnp.ndarray:
    """Sum of all directional contact-pair forces from explicit kinematics
    ((3, N) position/velocity in edtype and the (E,) global life mask).

    Callers that own only part of the node state (parallel/halo.py) build
    ``position``/``velo`` arrays that are valid at the contact-relevant
    nodes only — every read in the pair force touches cand/tri/jnode ids
    exclusively, so garbage elsewhere is never observed."""
    total = jnp.zeros_like(position)
    kin = None
    if model.pairs and model.plan_ckin is not None:
        # ONE merged gather feeds every pair's kinematics slices
        kin = blocked_gather(
            jnp.concatenate([position, velo], axis=0), model.plan_ckin)
    for i, pair in enumerate(model.pairs):
        act = None if activity is None else activity[i]
        ksl = model.ckin_slices[i] if kin is not None else None
        total = total + _pair_force(model, pair, position, velo,
                                    element_flag, axis_name, act,
                                    kin=kin, ksl=ksl)
    return total.astype(model.dtype)


def contact_forces(model: LoweredModel, state, axis_name=None,
                   activity=None) -> jnp.ndarray:
    """Sum of all directional contact-pair forces, (3, N) in the kinematic
    dtype (narrow phase runs in edtype — f32 in mixed mode).

    ``axis_name`` (inside shard_map) partitions each pair's narrow-phase
    block loop round-robin across the mesh axis and psums the compact
    per-pair forces — distributed contact compute without all-gathering
    any (3, N) array."""
    edt = model.edtype
    position = (model.coord + state.disp).astype(edt)
    velo = state.velo.astype(edt)
    return contact_forces_pv(model, position, velo, state.element_flag,
                             axis_name, activity)
