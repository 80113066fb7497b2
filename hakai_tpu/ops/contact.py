"""Penalty contact: node-vs-triangle narrow phase with AABB + uniform-grid
cell culling.

Re-design of ``cal_contact_force`` (HAKAI-v0.0.2/Julia/HAKAI_j.jl:2248-2706)
and its CUDA twin (``gpu_contact``, :2899-3157) with static shapes:

  * the *complete* face inventory (with twin links) was pre-enumerated at
    lowering; per step the active triangles/nodes are compacted to fixed
    capacities with ``jnp.nonzero(size=...)`` — a mask flip replaces the
    reference's dynamic surface appends;
  * the reference's culls are reproduced exactly: AABB-overlap early-out
    (:2284-2307), per-axis triangle range cull (:2403-2421), node range cull
    (:2516-2521), circumradius cull (:2525-2528), and the +-1 uniform-grid
    cell test (:2331-2363, 2487-2492) with cell = ceil((p-min)/ddiv),
    ddiv = 1.1*elementMaxSize (0.6 for self-contact);
  * the narrow phase solves [v1 v2 -n] x = p-q0 in closed form
    (my3SolveAb, :3342-3372), accepts 0<=x1, 0<=x2, x1+x2<=1, 0<d<=0.3*minsize
    (:2553-2554), then applies penalty + damping + Coulomb friction
    (:2576-2618) with k = young*S/Lmax*kc;
  * scatter of +f to the node and -f/3 to the triangle vertices
    (:2653-2667) is a deterministic on-device scatter-add — no per-thread
    Float128 buffers or atomics needed.

Narrow phase runs in (triangle x node-tile) blocks to bound memory.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.lowering import ContactPairArrays, LoweredModel


def _node_active(flag, init, twins):
    tw_dead = (twins >= 0) & ~flag[jnp.clip(twins, 0, None)]
    return init | tw_dead.any(axis=1)


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
    big = jnp.asarray(jnp.inf, x.dtype)
    mn = jnp.where(valid, x, big).min(axis=-1)
    mx = jnp.where(valid, x, -big).max(axis=-1)
    return mn, mx


def _pair_force(model: LoweredModel, pair: ContactPairArrays,
                position, velo, flag):
    cfgc = model.config.contact
    dt = position.dtype
    N = position.shape[1]
    kc = cfgc.kc_self if pair.is_self else cfgc.kc
    Cr = cfgc.Cr_self if pair.is_self else cfgc.Cr
    ddiv = model.element_max_size * (cfgc.ddiv_scale_self if pair.is_self
                                     else cfgc.ddiv_scale)
    d_lim = model.element_min_size * cfgc.d_lim_scale
    myu = cfgc.myu

    # --- activity + compaction ---
    twin_dead = (pair.tri_twin >= 0) & ~flag[jnp.clip(pair.tri_twin, 0, None)]
    tri_active = (pair.tri_init | twin_dead) & flag[pair.tri_elem]
    ni_active = _node_active(flag, pair.cand_init, pair.cand_twin)
    nj_active = _node_active(flag, pair.jnode_init, pair.jnode_twin)

    T = pair.tri_capacity
    tri_sel = _compact(tri_active, T)
    tvalid = jnp.arange(T) < tri_active.sum()
    tn = pair.tri_nodes[:, tri_sel]                  # (3 vert, T)
    telem = pair.tri_elem[tri_sel]                   # (T,)

    C = pair.node_capacity
    nsel = _compact(ni_active, C)
    nvalid = jnp.arange(C) < ni_active.sum()
    n_ids = pair.cand_nodes[nsel]                    # (C,)

    Cj = pair.jnode_capacity
    jsel = _compact(nj_active, Cj)
    jvalid = jnp.arange(Cj) < nj_active.sum()
    j_ids = pair.jnode_nodes[jsel]

    # --- AABBs over the two active node sets (HAKAI_j.jl:2284-2315) ---
    pos_i = position[:, n_ids]                       # (3, C)
    pos_jn = position[:, j_ids]
    min_i, max_i = _masked_minmax(pos_i, nvalid[None])
    min_j, max_j = _masked_minmax(pos_jn, jvalid[None])
    range_min = jnp.maximum(min_i, min_j)
    range_max = jnp.minimum(max_i, max_j)
    overlap = jnp.all(range_min <= range_max) & (tri_active.sum() > 0) \
        & (ni_active.sum() > 0)
    all_min = jnp.minimum(min_i, min_j)              # (3,)

    def compute(_):
        # --- second compaction: AABB range culls move the surviving
        # triangles/nodes to the front so the narrow-phase loops below run
        # only ceil(active/block) iterations (dynamic trip counts) ---
        q_all = position[:, tn]                      # (3, 3vert, T)
        # per-axis range cull (:2403-2421)
        below = (q_all < range_min[:, None, None]).all(axis=1)
        above = (q_all > range_max[:, None, None]).all(axis=1)
        tri_in_mask = ~(below.any(axis=0) | above.any(axis=0)) & tvalid
        tsel2 = _compact(tri_in_mask, T)
        t_cnt = tri_in_mask.sum()
        tn2 = tn[:, tsel2]
        telem2 = telem[tsel2]
        tri_in = jnp.arange(T) < t_cnt               # (T,) front-packed

        node_in_mask = ((pos_i >= range_min[:, None])
                        & (pos_i <= range_max[:, None])).all(axis=0) & nvalid
        csel2 = _compact(node_in_mask, C)
        c_cnt = node_in_mask.sum()
        n_ids2 = n_ids[csel2]
        node_in = jnp.arange(C) < c_cnt

        # --- triangle geometry (front-packed order) ---
        q = position[:, tn2]                         # (3, 3vert, T)
        q0, q1, q2 = q[:, 0], q[:, 1], q[:, 2]

        ctr = (q0 + q1 + q2) / 3.0
        Rmax = jnp.sqrt(jnp.maximum(jnp.maximum(
            ((q0 - ctr) ** 2).sum(0), ((q1 - ctr) ** 2).sum(0)),
            ((q2 - ctr) ** 2).sum(0)))
        v1 = q1 - q0
        v2 = q2 - q0
        L1 = jnp.sqrt((v1 ** 2).sum(0))
        L2 = jnp.sqrt((v2 ** 2).sum(0))
        Lmax = jnp.maximum(L1, L2)
        safe_L = jnp.where(Lmax == 0, 1.0, Lmax)
        cr = jnp.stack([v1[1] * v2[2] - v1[2] * v2[1],
                        v1[2] * v2[0] - v1[0] * v2[2],
                        v1[0] * v2[1] - v1[1] * v2[0]])
        mag_n = jnp.sqrt((cr ** 2).sum(0))
        nrm = cr / jnp.where(mag_n == 0, 1.0, mag_n)          # (3, T)
        d12 = (v1 * v2).sum(0)
        S = 0.5 * jnp.sqrt(jnp.maximum(L1**2 * L2**2 - d12**2, 0.0))
        k_pen = pair.young * S / safe_L * kc                  # (T,)
        cell_j0 = jnp.ceil((q0 - all_min[:, None]) / ddiv).astype(jnp.int32)
        enodes = model.elem[:, telem2]                        # (8, T)
        vel_j0 = velo[:, tn2[0]]                              # (3, T)
        pos_i2 = position[:, n_ids2]                          # (3, C)
        mass_i = model.diag_M[n_ids2]                         # (C,)

        # det(A) and adjugate rows of A = [v1 v2 -n] (my3SolveAb, :3342-3372)
        A = (v1, v2, -nrm)
        detA = (A[0][0] * A[1][1] * A[2][2] + A[1][0] * A[2][1] * A[0][2]
                + A[2][0] * A[0][1] * A[1][2] - A[0][0] * A[2][1] * A[1][2]
                - A[1][0] * A[0][1] * A[2][2] - A[2][0] * A[1][1] * A[0][2])
        safe_det = jnp.where(detA == 0, 1.0, detA)
        # inverse rows (im[r][c]) via cofactors
        def inv_row(r):
            c1, c2 = (r + 1) % 3, (r + 2) % 3
            return jnp.stack([
                A[c1][1] * A[c2][2] - A[c2][1] * A[c1][2],
                A[c2][0] * A[c1][2] - A[c1][0] * A[c2][2],
                A[c1][0] * A[c2][1] - A[c2][0] * A[c1][1],
            ]) / safe_det                                     # (3, T)
        im0, im1, im2 = inv_row(0), inv_row(1), inv_row(2)

        cell_i = jnp.ceil((pos_i2 - all_min[:, None]) / ddiv).astype(jnp.int32)
        vel_i = velo[:, n_ids2]

        TB = min(512, T)
        nb = max(min(cfgc.node_block, C, (1 << 21) // TB), 8)
        tri_chunks = -(-T // TB)
        n_chunks = -(-C // nb)
        Tp, Cp = tri_chunks * TB, n_chunks * nb

        def padl(a, n_to, fill=0):   # pad last axis
            pad = [(0, 0)] * (a.ndim - 1) + [(0, n_to - a.shape[-1])]
            return jnp.pad(a, pad, constant_values=fill)

        pos_p = padl(pos_i2, Cp)
        vel_p = padl(vel_i, Cp)
        cell_p = padl(cell_i, Cp, -9)
        nin_p = padl(node_in, Cp, False)
        ids_p = padl(n_ids2, Cp)
        mi_p = padl(mass_i, Cp)

        tri_data = [padl(x, Tp) for x in
                    (q0, ctr, nrm, im0, im1, im2, vel_j0)]     # (3, Tp) each
        tri_scal = [padl(x, Tp) for x in (Rmax, k_pen)]        # (Tp,)
        tin_p = padl(tri_in, Tp, False)
        en_p = padl(enodes, Tp)

        # dynamic trip counts: work scales with the in-range counts
        act_tri_chunks = jnp.minimum((t_cnt + TB - 1) // TB, tri_chunks)
        act_n_chunks = jnp.minimum((c_cnt + nb - 1) // nb, n_chunks)

        def tri_chunk(tc, carry):
            force_i, force_t = carry
            t0 = tc * TB
            q0c, ctrc, nrmc, im0c, im1c, im2c, vj0c = (
                jax.lax.dynamic_slice(x, (0, t0), (3, TB)) for x in tri_data)
            Rmaxc, kpenc = (jax.lax.dynamic_slice(x, (t0,), (TB,))
                            for x in tri_scal)
            tinc = jax.lax.dynamic_slice(tin_p, (t0,), (TB,))
            cellj0c = jnp.ceil((q0c - all_min[:, None]) / ddiv
                               ).astype(jnp.int32)
            enc = jax.lax.dynamic_slice(en_p, (0, t0), (8, TB))

            def node_chunk(nc, carry2):
                force_i, ft_blk = carry2
                c0 = nc * nb
                p = jax.lax.dynamic_slice(pos_p, (0, c0), (3, nb))
                vi = jax.lax.dynamic_slice(vel_p, (0, c0), (3, nb))
                ci = jax.lax.dynamic_slice(cell_p, (0, c0), (3, nb))
                nin = jax.lax.dynamic_slice(nin_p, (c0,), (nb,))
                ids = jax.lax.dynamic_slice(ids_p, (c0,), (nb,))
                mi = jax.lax.dynamic_slice(mi_p, (c0,), (nb,))

                # pair masks (TB, nb); uniform-grid +-1 cell test (:2487-2492)
                cell_ok = (jnp.abs(cellj0c[:, :, None] - ci[:, None, :]) <= 1
                           ).all(axis=0)
                m = tinc[:, None] & nin[None, :] & cell_ok
                if pair.is_self:
                    own = (enc[:, :, None] == ids[None, None, :]).any(axis=0)
                    m &= ~own
                dpc = jnp.sqrt(((p[:, None, :] - ctrc[:, :, None]) ** 2
                                ).sum(0))
                m &= dpc < Rmaxc[:, None]

                b = p[:, None, :] - q0c[:, :, None]           # (3, TB, nb)
                x1 = (im0c[:, :, None] * b).sum(0)
                x2 = (im1c[:, :, None] * b).sum(0)
                d = (im2c[:, :, None] * b).sum(0)
                m &= (x1 >= 0.0) & (x2 >= 0.0) & (x1 + x2 <= 1.0) \
                    & (d > 0.0) & (d <= d_lim)

                F = jnp.where(m, kpenc[:, None] * d, 0.0)     # (TB, nb)
                vrel = vi[:, None, :] - vj0c[:, :, None]      # (3, TB, nb)
                mag_v = jnp.sqrt((vrel ** 2).sum(0))
                ve = vrel / jnp.where(mag_v == 0, 1.0, mag_v)
                ve = jnp.where(mag_v > 0, ve, 0.0)
                dot_vn = (ve * nrmc[:, :, None]).sum(0)
                vs = ve - dot_vn * nrmc[:, :, None]
                Cd = 2.0 * jnp.sqrt(mi[None, :] * kpenc[:, None]) * Cr
                f = (F * nrmc[:, :, None]
                     - myu * F * vs
                     - jnp.where(m, Cd, 0.0) * vrel)          # (3, TB, nb)
                f = jnp.where(m[None], f, 0.0)

                fi = jax.lax.dynamic_slice(force_i, (0, c0), (3, nb))
                force_i = jax.lax.dynamic_update_slice(
                    force_i, fi + f.sum(axis=1), (0, c0))
                return force_i, ft_blk + f.sum(axis=2) / 3.0

            force_i, ft_blk = jax.lax.fori_loop(
                0, act_n_chunks, node_chunk,
                (force_i, jnp.zeros((3, TB), dt)))
            ft = jax.lax.dynamic_slice(force_t, (0, t0), (3, TB))
            force_t = jax.lax.dynamic_update_slice(force_t, ft + ft_blk,
                                                   (0, t0))
            return force_i, force_t

        force_i, force_t = jax.lax.fori_loop(
            0, act_tri_chunks, tri_chunk,
            (jnp.zeros((3, Cp), dt), jnp.zeros((3, Tp), dt)))
        force_i = force_i[:, :C]
        force_t = force_t[:, :T]

        g = jnp.zeros((3, N), dt)
        g = g.at[:, n_ids2].add(force_i, mode="drop")
        for v in range(3):
            g = g.at[:, tn2[v]].add(-force_t, mode="drop")
        return g

    return jax.lax.cond(overlap, compute,
                        lambda _: jnp.zeros((3, N), dt), None)


def contact_forces(model: LoweredModel, state) -> jnp.ndarray:
    """Sum of all directional contact-pair forces, (3, N)."""
    position = model.coord + state.disp
    total = jnp.zeros_like(position)
    for pair in model.pairs:
        total = total + _pair_force(model, pair, position, state.velo,
                                    state.element_flag)
    return total
