"""Blocked mesh gather — the TPU-native replacement for XLA's generic gather.

Unstructured-FEM hot loops are gather/scatter bound: the nodal->element
gather (``position[:, elem]``) and the element->nodal internal-force assembly
dominate the step on TPU (XLA's generic gather runs at ~1 G elem/s on v5e;
the arithmetic is ~20x cheaper).  Because the mesh topology is *static*, the
indices are known at lowering time, and a locality plan can be precomputed:

  * outputs are processed in tiles of ``r_tile`` consecutive indices;
  * for each tile, all indices fall inside a contiguous *window* of the
    source array (true for bandwidth-ordered meshes; the lowering verifies it
    and falls back to XLA gather otherwise);
  * the kernel DMAs each tile's window into VMEM (pipelined by Pallas) and
    resolves the within-window lookup with lane-wise ``take_along_axis``
    (Mosaic ``dynamic_gather``) plus a select over the window's 128-wide
    chunks.

This turns a scalar-rate gather into sequential DMA + VPU work.  The same
primitive serves both directions: assembly is expressed as a *gather* of
slot-pure element contributions (Q[n] = sum_v Qe[slot_v(n), e_v(n)]), so no
scatter/atomics are needed anywhere (SURVEY.md §2 race-handling row).
"""
from __future__ import annotations

import dataclasses
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128


def _I0():
    # int32 zero for BlockSpec index maps (plain 0 promotes to i64 under
    # x64 mode, which Mosaic cannot legalize)
    return jnp.asarray(0, jnp.int32)


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class GatherPlan:
    """Precomputed locality plan for a static index set."""
    r: int = dataclasses.field(metadata=dict(static=True), default=0)
    r_pad: int = dataclasses.field(metadata=dict(static=True), default=0)
    r_tile: int = dataclasses.field(metadata=dict(static=True), default=0)
    w_rows: int = dataclasses.field(metadata=dict(static=True), default=0)
    n_tiles: int = dataclasses.field(metadata=dict(static=True), default=0)
    ok: bool = dataclasses.field(metadata=dict(static=True), default=False)
    # subgroup merging: sg windows share one DMA per grid step (DMA-issue
    # latency dominates the kernel; merged windows cut it ~3x)
    sg: int = dataclasses.field(metadata=dict(static=True), default=1)
    m_w_rows: int = dataclasses.field(metadata=dict(static=True), default=0)
    # in-kernel accumulation: vl consecutive tiles sum (masked) into one
    # output block — used for internal-force assembly (output is (C, r/vl))
    vl: int = dataclasses.field(metadata=dict(static=True), default=0)
    # diagonal mode: each output row s of a tile uses window base starts+s
    # (linear in s), so the kernel selects over only dk diagonal slices
    # instead of all w_rows chunks (dk=0 disables; see plan_blocked_gather)
    dk: int = dataclasses.field(metadata=dict(static=True), default=0)
    # static scratch front-pad for diag plans whose first tiles would need
    # window rows before source row 0 (index drift slope < 1 near the origin)
    pad: int = dataclasses.field(metadata=dict(static=True), default=0)
    d_off: jnp.ndarray = None      # (n_m,) int32 scratch DMA dest offsets
    mask_tiles: jnp.ndarray = None   # (r_pad//LANE, LANE) f32 0/1
    starts: jnp.ndarray = None     # (n_tiles,) int32 window starts (row units)
    local_idx: jnp.ndarray = None  # (r_pad//LANE, LANE) int32 idx - starts*128
    global_idx: jnp.ndarray = None  # (r_pad//LANE, LANE) int32 (XLA fallback)
    m_starts: jnp.ndarray = None   # (n_m,) int32 merged-window starts
    sub_off: jnp.ndarray = None    # (n_m*sg,) int32 window offset in merged
    #   window, flattened 1-D (2-D SMEM prefetch arrays pad to 512 B/row)


def plan_blocked_gather(indices: np.ndarray, source_len: int,
                        valid: np.ndarray | None = None,
                        r_tile: int = 2048,
                        max_w_rows: int = 64,
                        subgroups: int = 1,
                        diag_max_k: int = 6,
                        min_w_rows: int = 1,
                        min_m_w_rows: int = 0,
                        m_w_cap: int = 192,
                        min_dk: int = 0,
                        min_pad: int = 0) -> GatherPlan:
    """Build a :class:`GatherPlan` for gathering ``indices`` (R,) out of a
    source of length ``source_len`` (must be a multiple of 128).

    ``valid`` masks entries whose value is ignored by the caller; they are
    repointed inside the tile window.  ``ok=False`` (XLA fallback) when any
    tile's index spread exceeds ``max_w_rows``*128 source elements.

    ``min_dk`` / ``min_pad`` / ``min_m_w_rows`` force diagonal-mode static
    meta up to a caller-chosen floor so per-shard plans can share one kernel
    template (see :func:`plan_sharded_gather`); they never shrink a plan.
    """
    idx = np.asarray(indices, np.int64).ravel()
    r = idx.shape[0]
    if valid is None:
        valid = np.ones(r, bool)
    else:
        valid = np.asarray(valid, bool).ravel()
    r_pad = max(-(-r // r_tile) * r_tile, r_tile)
    idxp = np.zeros(r_pad, np.int64)
    idxp[:r] = np.where(valid, idx, -1)
    validp = np.zeros(r_pad, bool)
    validp[:r] = valid

    n_tiles = r_pad // r_tile
    starts = np.zeros(n_tiles, np.int32)
    w_rows = 1
    ok = source_len % LANE == 0
    tiles = idxp.reshape(n_tiles, r_tile)
    vtiles = validp.reshape(n_tiles, r_tile)
    for t in range(n_tiles):
        tv = tiles[t][vtiles[t]]
        if tv.size == 0:
            starts[t] = 0
            continue
        lo = int(tv.min()) // LANE
        hi = int(tv.max())
        starts[t] = lo
        rows = hi // LANE - lo + 1
        w_rows = max(w_rows, rows)
    if w_rows > max_w_rows:
        ok = False
    # forced minima let per-shard plans share one kernel template (uniform
    # static meta across shards; see plan_sharded_gather)
    w_rows = max(w_rows, min(min_w_rows, max(source_len // LANE, 1)))
    # clamp starts so windows stay in range
    src_rows = source_len // LANE
    starts = np.minimum(starts, max(src_rows - w_rows, 0)).astype(np.int32)
    local = tiles - (starts[:, None].astype(np.int64) * LANE)
    local = np.where(vtiles, local, 0).astype(np.int32)
    glob = np.where(validp, idxp, 0).astype(np.int32)

    # --- diagonal mode: when the index drift within each tile is near-linear
    # (~1 source chunk per 128 outputs — true for bandwidth-ordered meshes),
    # give output row s the window base starts[t]+s.  The kernel then reads
    # dk static diagonal slices scratch[base+d : base+d+rows] instead of
    # selecting over all w_rows chunks: VPU lookup work drops w_rows/dk-fold.
    dk = 0
    pad = 0
    d_off = None
    rows_t = r_tile // LANE
    w_cap = rows_t + max(diag_max_k, 1) - 1
    if ok and diag_max_k > 0 and src_rows >= w_cap:
        chunks = (tiles >> 7).reshape(n_tiles, rows_t, LANE)
        vt3 = vtiles.reshape(n_tiles, rows_t, LANE)
        s_col = np.arange(rows_t)[:, None]
        cmin = np.where(vt3, chunks, np.iinfo(np.int64).max).min(axis=2)
        row_used = cmin < np.iinfo(np.int64).max
        base_rows = np.where(row_used, cmin - s_col.T, np.iinfo(np.int64).max)
        w0 = base_rows.min(axis=1)                       # (n_tiles,)
        w0 = np.where(w0 == np.iinfo(np.int64).max, 0, w0)   # empty tiles
        # w0 may run past EITHER end of the source (index drift slope < 1
        # near the origin / > "needed" at the top): the DMA below clamps the
        # copy range and re-aligns with a dynamic scratch dest offset, so no
        # clamp is applied to w0 itself (which would break linearity).
        d_rel = chunks - (w0[:, None, None] + s_col[None])
        d_rel = np.where(vt3, d_rel, 0)
        k = int(d_rel.max()) + 1
        if d_rel.min() >= 0 and k <= diag_max_k:
            dk = max(k, min(min_dk, diag_max_k))
            legacy = (w_rows, starts, local)     # restored if merge fails
            w_rows = rows_t + dk - 1
            starts = w0.astype(np.int32)
            base_lane = ((w0[:, None, None] + s_col[None]) * LANE)
            local = np.where(vt3, tiles.reshape(n_tiles, rows_t, LANE)
                             - base_lane, 0).astype(np.int32)

    local = local.reshape(-1)
    sg = max(int(subgroups), 1)
    m_starts = sub_off = None
    m_w = 0
    if dk > 0:
        # Merge sg subtile windows per grid step in VIRTUAL row space
        # (virtual row = source row + lead, lead = -min(w0)): the DMA copies
        # m_w real rows to a dynamic dest offset that clamps the copy inside
        # the source at both ends; scratch rows outside the copy are stale
        # but only read by select-discarded lanes.
        lead = int(max(0, -starts.min()))
        w0v_t = starts.astype(np.int64) + lead
        # groups that straddle index-segment boundaries (e.g. assembly lanes)
        # inflate the merged window; shrink sg until the window is modest
        while True:
            n_m = -(-n_tiles // sg)
            w0v = np.concatenate(
                [w0v_t, np.repeat(w0v_t[-1:], n_m * sg - n_tiles)])
            s2 = w0v.reshape(n_m, sg)
            mv = s2.min(axis=1)
            m_w = int((s2 + w_rows - mv[:, None]).max())
            if m_w <= min(src_rows, max(4 * w_rows, m_w_cap)) or sg == 1:
                break
            sg //= 2
        m_w = max(m_w, min_m_w_rows)     # sharded-plan meta unification
        if m_w > src_rows:
            dk = 0                       # source too small for static copies
            w_rows, starts, local = legacy
            m_w = 0
        else:
            sub_off_a = (s2 - mv[:, None]).astype(np.int64)
            src_start = np.clip(mv - lead, 0, src_rows - m_w)
            dst_raw = lead + src_start - mv
            dst_clamped = np.maximum(dst_raw, 0)
            sub_off_a += (dst_clamped - dst_raw)[:, None]
            pad = max(int(dst_clamped.max()), min_pad)  # scratch rows > m_w
            r_pad2 = n_m * sg * r_tile
            if r_pad2 > r_pad:
                local = np.concatenate(
                    [local, np.zeros(r_pad2 - r_pad, np.int32)])
                glob = np.concatenate(
                    [glob, np.zeros(r_pad2 - r_pad, np.int32)])
                r_pad = r_pad2
            m_starts = jnp.asarray(src_start.astype(np.int32))
            sub_off = jnp.asarray(sub_off_a.astype(np.int32).reshape(-1))
            d_off = jnp.asarray(dst_clamped.astype(np.int32))
    if dk == 0 and sg > 1:
        n_m = -(-n_tiles // sg)
        starts_pad = np.concatenate(
            [starts, np.repeat(starts[-1:], n_m * sg - n_tiles)])
        s2 = starts_pad.reshape(n_m, sg)
        m_start = s2.min(axis=1)
        m_w = int((s2 + w_rows - m_start[:, None]).max())
        m_w = max(m_w, min_m_w_rows)
        m_w = min(m_w, src_rows)
        m_start = np.minimum(m_start, max(src_rows - m_w, 0))
        sub_off_a = (s2 - m_start[:, None]).astype(np.int32)
        if (sub_off_a + w_rows > m_w).any() \
                or m_w > max(4 * w_rows, m_w_cap, min_m_w_rows):
            sg = 1          # merged window cannot cover; fall back to legacy
        else:
            # pad index blocks to the merged grid
            r_pad2 = n_m * sg * r_tile
            if r_pad2 > r_pad:
                local = np.concatenate(
                    [local, np.zeros(r_pad2 - r_pad, np.int32)])
                glob = np.concatenate(
                    [glob, np.zeros(r_pad2 - r_pad, np.int32)])
                r_pad = r_pad2
            m_starts = jnp.asarray(m_start.astype(np.int32))
            sub_off = jnp.asarray(sub_off_a.reshape(-1))

    return GatherPlan(
        r=r, r_pad=r_pad, r_tile=r_tile, w_rows=int(w_rows),
        n_tiles=n_tiles, ok=bool(ok), dk=int(dk), pad=int(pad),
        sg=sg, m_w_rows=int(m_w) if (sg > 1 or dk > 0) else 0,
        starts=jnp.asarray(starts),
        local_idx=jnp.asarray(np.asarray(local).reshape(r_pad // LANE, LANE)),
        global_idx=jnp.asarray(np.asarray(glob).reshape(r_pad // LANE, LANE)),
        m_starts=m_starts, sub_off=sub_off, d_off=d_off,
    )


def plan_assemble(idx_grouped: np.ndarray, mask_grouped: np.ndarray,
                  source_len: int, vl: int, r_tile: int = 2048,
                  max_w_rows: int = 64, diag_max_k: int = 6) -> GatherPlan:
    """Plan a gather-and-accumulate: indices are ordered so that ``vl``
    consecutive tiles target the same output block; the kernel sums their
    masked values in place (used for slot-pure internal-force assembly —
    the (C, vl*N) intermediate never materializes)."""
    plan = plan_blocked_gather(idx_grouped, source_len,
                               valid=mask_grouped, r_tile=r_tile,
                               max_w_rows=max_w_rows, subgroups=1,
                               diag_max_k=diag_max_k)
    r_pad = plan.r_pad
    mt = np.zeros(r_pad, np.float32)
    mt[:len(mask_grouped)] = np.asarray(mask_grouped, np.float32)
    return dataclasses.replace(
        plan, vl=int(vl),
        mask_tiles=jnp.asarray(mt.reshape(r_pad // LANE, LANE)))


def plan_segmented(segments, source_len: int, r_tile: int = 2048,
                   max_w_rows: int = 64):
    """Plan a gather of several index segments concatenated; each segment is
    padded (masked) to a tile multiple so tiles never straddle segments.

    Returns (plan, slices) where ``slices[k]`` recovers segment k from the
    gathered (C, plan.r) output."""
    idx_parts = []
    valid_parts = []
    slices = []
    off = 0
    for seg in segments:
        seg = np.asarray(seg, np.int64).ravel()
        n = len(seg)
        n_pad = max(-(-n // r_tile) * r_tile, r_tile)
        idx_parts.append(np.concatenate([seg, np.zeros(n_pad - n, np.int64)]))
        valid_parts.append(np.concatenate(
            [np.ones(n, bool), np.zeros(n_pad - n, bool)]))
        slices.append(slice(off, off + n))
        off += n_pad
    plan = plan_blocked_gather(np.concatenate(idx_parts), source_len,
                               valid=np.concatenate(valid_parts),
                               r_tile=r_tile, max_w_rows=max_w_rows)
    return plan, slices


def _lane_lookup(row_b: jnp.ndarray, lane: jnp.ndarray) -> jnp.ndarray:
    """out[s, l] = row_b[s, lane[s, l]] — Mosaic dynamic_gather over lanes.

    Direct lax.gather (what jnp.take_along_axis lowers to) — the jnp wrapper's
    nested jit trips a lowering-cache bug when two Pallas kernels share inner
    call shapes."""
    dnums = jax.lax.GatherDimensionNumbers(
        offset_dims=(), collapsed_slice_dims=(1,), start_index_map=(1,),
        operand_batching_dims=(0,), start_indices_batching_dims=(0,))
    return jax.lax.gather(row_b, lane[..., None], dnums, slice_sizes=(1, 1))


def _make_gather_kernel(C: int, w_rows: int):
    """Double-buffered window gather.

    The source is channel-interleaved — (S/128 rows, C, 128) — so each tile's
    whole window is ONE contiguous DMA (DMA issue latency, not bandwidth or
    the lane lookups, dominates this kernel; per-channel copies cost ~3x)."""
    def kernel(starts_ref, lidx_ref, src_hbm, out_ref, scratch, sems):
        i = pl.program_id(0)
        n = pl.num_programs(0)
        slot = jax.lax.rem(i, jnp.int32(2))
        nxt = jax.lax.rem(i + jnp.int32(1), jnp.int32(2))

        def dma(slot_idx, tile):
            return pltpu.make_async_copy(
                src_hbm.at[pl.ds(starts_ref[tile], w_rows)],
                scratch.at[slot_idx], sems.at[slot_idx])

        @pl.when(i == 0)
        def _():
            dma(slot, i).start()

        @pl.when(i + 1 < n)
        def _():
            dma(nxt, i + 1).start()

        lidx = lidx_ref[:]                          # (rows, 128)
        lane = lidx & (LANE - 1)
        crow = lidx >> 7
        rows = lidx.shape[0]
        dma(slot, i).wait()
        # channel-independent crow masks hoisted; raw lax.select (not
        # jnp.where) — the closed_call wrapper trips the lowering cache
        # inside Pallas bodies
        masks = [crow == c for c in range(w_rows - 1)]
        for ch in range(C):
            vals = []
            for c in range(w_rows):
                row = scratch[slot, c, ch, :]
                row_b = jnp.broadcast_to(row[None, :], (rows, LANE))
                vals.append(_lane_lookup(row_b, lane))
            acc = vals[w_rows - 1]
            for c in reversed(range(w_rows - 1)):
                acc = jax.lax.select(masks[c], vals[c], acc)
            out_ref[ch] = acc
    return kernel


def _make_merged_kernel(C: int, w_rows: int, m_w: int, sg: int,
                        rows_sub: int):
    """sg windows per grid step share ONE contiguous window DMA; per-window
    row offsets come from SMEM (sub_off)."""
    def kernel(mstarts_ref, suboff_ref, lidx_ref, src_hbm, out_ref,
               scratch, sems):
        i = pl.program_id(0)
        n = pl.num_programs(0)
        slot = jax.lax.rem(i, jnp.int32(2))
        nxt = jax.lax.rem(i + jnp.int32(1), jnp.int32(2))

        def dma(s, t):
            return pltpu.make_async_copy(
                src_hbm.at[pl.ds(mstarts_ref[t], m_w)],
                scratch.at[s], sems.at[s])

        @pl.when(i == 0)
        def _():
            dma(slot, i).start()

        @pl.when(i + 1 < n)
        def _():
            dma(nxt, i + 1).start()

        lidx = lidx_ref[:]                          # (sg*rows_sub, 128)
        lane = lidx & (LANE - 1)
        crow = lidx >> 7
        dma(slot, i).wait()
        # g outer / ch inner: the crow==c masks are channel-independent —
        # one mask set per subgroup serves all C channels (the select-into
        # -acc chain stays: crow may exceed w_rows-1 only for repointed
        # invalid lanes, which still land inside the window by plan)
        for g in range(sg):
            sl = slice(g * rows_sub, (g + 1) * rows_sub)
            lane_g = lane[sl]
            crow_g = crow[sl]
            masks = [crow_g == c for c in range(w_rows - 1)]
            off = suboff_ref[i * jnp.int32(sg) + jnp.int32(g)]
            for ch in range(C):
                vals = []
                for c in range(w_rows):
                    row = scratch[slot, off + c, ch, :]
                    row_b = jnp.broadcast_to(row[None, :],
                                             (rows_sub, LANE))
                    vals.append(_lane_lookup(row_b, lane_g))
                acc = vals[w_rows - 1]
                for c in reversed(range(w_rows - 1)):
                    acc = jax.lax.select(masks[c], vals[c], acc)
                out_ref[ch, sl] = acc
    return kernel


def _make_diag_kernel(C: int, dk: int, m_w: int, sg: int, rows_sub: int):
    """Linear-base window gather: output row s of (sub)tile g reads window
    rows base_g+s .. base_g+s+dk-1, so the chunk resolve is dk static
    *diagonal* slices scratch[off+d : off+d+rows] (row s of the slice is
    window row off+d+s) instead of a select over all w_rows chunks.

    Scratch is channel-major so each diagonal slice is one contiguous
    (rows, 128) block; ALL C channels ride ONE strided window copy per
    grid step (the kernel is DMA-issue bound — per-channel copies cost
    ~3x the issues; same trick as the phys-asm kernel).  The DMA dest
    offset (d_off) realizes the plan's virtual front pad: scratch rows
    before it are stale, but only lanes the select discards ever read
    them."""
    def kernel(srcstart_ref, dstoff_ref, suboff_ref, lidx_ref, src_hbm,
               out_ref, scratch, sems):
        i = pl.program_id(0)
        n = pl.num_programs(0)
        slot = jax.lax.rem(i, jnp.int32(2))
        nxt = jax.lax.rem(i + jnp.int32(1), jnp.int32(2))
        pad = scratch.shape[2] - m_w

        def dma(s, t):
            return pltpu.make_async_copy(
                src_hbm.at[:, pl.ds(srcstart_ref[t], m_w)],
                scratch.at[s, :, pl.ds(dstoff_ref[t], m_w)],
                sems.at[s])

        @pl.when(i == 0)
        def _():
            if pad > 0:
                # stale rows (outside each step's DMA copy) are read by
                # select-discarded lanes only; zero once so they can never
                # hold NaN bit patterns from uninitialized VMEM
                scratch[...] = jnp.zeros(scratch.shape, scratch.dtype)
            dma(slot, i).start()

        @pl.when(i + 1 < n)
        def _():
            dma(nxt, i + 1).start()

        lidx = lidx_ref[:]                          # (sg*rows_sub, 128)
        lane = lidx & (LANE - 1)
        drow = lidx >> 7                            # diagonal index in [0,dk)
        dma(slot, i).wait()
        # g outer / ch inner: the drow==d masks depend on (g) only, so one
        # mask set serves all C channels; the mux tree (drow is ALWAYS in
        # [0,dk) by construction) replaces the compare+select-into-acc
        # chain — measured VPU-bound at 1M (608 us vs a 170 us HBM floor),
        # this cuts the per-(ch,g) op count ~30%
        for g in range(sg):
            sl = slice(g * rows_sub, (g + 1) * rows_sub)
            lane_g = lane[sl]
            drow_g = drow[sl]
            masks = [drow_g == d for d in range(dk - 1)]
            off = suboff_ref[i * jnp.int32(sg) + jnp.int32(g)]
            for ch in range(C):
                vals = [_lane_lookup(
                    scratch[slot, ch, pl.ds(off + jnp.int32(d), rows_sub), :],
                    lane_g) for d in range(dk)]
                acc = vals[dk - 1]
                for d in reversed(range(dk - 1)):
                    acc = jax.lax.select(masks[d], vals[d], acc)
                out_ref[ch, sl] = acc
    return kernel


def _make_diag_asm_kernel(C: int, dk: int, m_w: int, rows_sub: int, vl: int):
    """Diagonal-slice gather + masked accumulation of vl consecutive tiles
    into one output block (TPU grids are sequential: race-free, fixed
    order).  The (C, vl*N) gathered intermediate never reaches HBM."""
    def kernel(srcstart_ref, dstoff_ref, suboff_ref, lidx_ref, mask_ref,
               src_hbm, out_ref, scratch, sems):
        i = pl.program_id(0)
        n = pl.num_programs(0)
        slot = jax.lax.rem(i, jnp.int32(2))
        nxt = jax.lax.rem(i + jnp.int32(1), jnp.int32(2))
        pad = scratch.shape[2] - m_w

        def dma(s, t):
            # ONE strided copy carries all C channels (DMA-issue bound;
            # see _make_diag_kernel)
            return pltpu.make_async_copy(
                src_hbm.at[:, pl.ds(srcstart_ref[t], m_w)],
                scratch.at[s, :, pl.ds(dstoff_ref[t], m_w)],
                sems.at[s])

        @pl.when(i == 0)
        def _():
            if pad > 0:
                scratch[...] = jnp.zeros(scratch.shape, scratch.dtype)
            dma(slot, i).start()

        @pl.when(i + 1 < n)
        def _():
            dma(nxt, i + 1).start()

        lidx = lidx_ref[:]
        lane = lidx & (LANE - 1)
        drow = lidx >> 7
        mask = mask_ref[:]
        first = jax.lax.rem(i, jnp.int32(vl)) == 0
        dma(slot, i).wait()
        # drow==d masks are channel-independent: hoist them, mux-tree the
        # diagonal picks (drow always lands in [0,dk); invalid lanes are
        # zeroed by the assembly mask below) — see _make_diag_kernel
        dmasks = [drow == d for d in range(dk - 1)]
        for ch in range(C):
            off = suboff_ref[i]
            vals = [_lane_lookup(
                scratch[slot, ch, pl.ds(off + jnp.int32(d), rows_sub), :],
                lane) for d in range(dk)]
            acc = vals[dk - 1]
            for d in reversed(range(dk - 1)):
                acc = jax.lax.select(dmasks[d], vals[d], acc)
            acc = acc * mask

            @pl.when(first)
            def _(ch=ch, acc=acc):
                out_ref[ch] = acc

            @pl.when(jnp.logical_not(first))
            def _(ch=ch, acc=acc):
                out_ref[ch] = out_ref[ch] + acc
    return kernel


def _make_asm_kernel(C: int, w_rows: int, vl: int):
    """Window gather + masked in-place accumulation of vl consecutive tiles
    into one output block (grid revisits the block; TPU grids are
    sequential, so the reduction is race-free and fixed-order)."""
    def kernel(starts_ref, lidx_ref, mask_ref, src_hbm, out_ref,
               scratch, sems):
        i = pl.program_id(0)
        n = pl.num_programs(0)
        slot = jax.lax.rem(i, jnp.int32(2))
        nxt = jax.lax.rem(i + jnp.int32(1), jnp.int32(2))

        def dma(s, t):
            return pltpu.make_async_copy(
                src_hbm.at[pl.ds(starts_ref[t], w_rows)],
                scratch.at[s], sems.at[s])

        @pl.when(i == 0)
        def _():
            dma(slot, i).start()

        @pl.when(i + 1 < n)
        def _():
            dma(nxt, i + 1).start()

        lidx = lidx_ref[:]
        lane = lidx & (LANE - 1)
        crow = lidx >> 7
        rows = lidx.shape[0]
        mask = mask_ref[:]
        first = jax.lax.rem(i, jnp.int32(vl)) == 0
        dma(slot, i).wait()
        for ch in range(C):
            acc = jnp.zeros(lidx.shape, scratch.dtype)
            for c in range(w_rows):
                row = scratch[slot, c, ch, :]
                row_b = jnp.broadcast_to(row[None, :], (rows, LANE))
                val = _lane_lookup(row_b, lane)
                acc = jax.lax.select(crow == c, val, acc)
            acc = acc * mask

            @pl.when(first)
            def _(ch=ch, acc=acc):
                out_ref[ch] = acc

            @pl.when(jnp.logical_not(first))
            def _(ch=ch, acc=acc):
                out_ref[ch] = out_ref[ch] + acc
    return kernel


def blocked_assemble(src: jnp.ndarray, plan: GatherPlan) -> jnp.ndarray:
    """Gather-and-accumulate ``src (C, S) -> (C, plan.r_pad // plan.vl)``
    (caller slices to the true output length).

    XLA fallback: plain gather + masked per-block sum."""
    C, S = src.shape
    vl = plan.vl
    if not plan.ok or jax.default_backend() != "tpu" or src.dtype.itemsize > 4:
        flat = plan.global_idx.reshape(-1)
        vals = src[:, flat] * plan.mask_tiles.reshape(-1).astype(src.dtype)
        nblk = plan.r_pad // (vl * plan.r_tile)
        return vals.reshape(C, nblk, vl, plan.r_tile).sum(axis=2
                                                          ).reshape(C, -1)
    if plan.dk > 0:
        src3 = src.reshape(C, S // LANE, LANE)       # channel-major
        rows_sub = plan.r_tile // LANE
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(plan.n_tiles,),
            in_specs=[
                pl.BlockSpec((rows_sub, LANE),
                             lambda i, ss, do, so: (i, _I0())),
                pl.BlockSpec((rows_sub, LANE),
                             lambda i, ss, do, so: (i, _I0())),
                pl.BlockSpec(memory_space=pltpu.ANY),
            ],
            out_specs=pl.BlockSpec(
                (C, rows_sub, LANE),
                lambda i, ss, do, so: (_I0(), i // plan.vl, _I0())),
            scratch_shapes=[
                pltpu.VMEM((2, C, plan.pad + plan.m_w_rows, LANE), src.dtype),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        )
        out = pl.pallas_call(
            _make_diag_asm_kernel(C, plan.dk, plan.m_w_rows, rows_sub,
                                  plan.vl),
            out_shape=jax.ShapeDtypeStruct(
                (C, plan.r_pad // vl // LANE, LANE), src.dtype),
            grid_spec=grid_spec,
        )(plan.m_starts, plan.d_off, plan.sub_off, plan.local_idx,
          plan.mask_tiles, src3)
        return out.reshape(C, plan.r_pad // vl)
    src3 = src.reshape(C, S // LANE, LANE).transpose(1, 0, 2)
    rows_per_tile = plan.r_tile // LANE
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(plan.n_tiles,),
        in_specs=[
            pl.BlockSpec((rows_per_tile, LANE),
                         lambda i, starts: (i, _I0())),
            pl.BlockSpec((rows_per_tile, LANE),
                         lambda i, starts: (i, _I0())),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((C, rows_per_tile, LANE),
                               lambda i, starts: (_I0(), i // plan.vl, _I0())),
        scratch_shapes=[
            pltpu.VMEM((2, plan.w_rows, C, LANE), src.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out = pl.pallas_call(
        _make_asm_kernel(C, plan.w_rows, vl),
        out_shape=jax.ShapeDtypeStruct((C, plan.r_pad // vl // LANE, LANE),
                                       src.dtype),
        grid_spec=grid_spec,
    )(plan.starts, plan.local_idx, plan.mask_tiles, src3)
    return out.reshape(C, plan.r_pad // vl)


def blocked_gather(src: jnp.ndarray, plan: GatherPlan) -> jnp.ndarray:
    """Gather ``src (C, S) -> (C, plan.r)`` using the precomputed plan.

    Falls back to XLA's gather when the plan is not usable (CPU backend or
    window overflow)."""
    C, S = src.shape
    # f64 cannot enter TPU custom calls (XLA's x64 rewrite pass does not
    # handle them); fall back to the XLA gather for wide dtypes
    if not plan.ok or jax.default_backend() != "tpu" or src.dtype.itemsize > 4:
        flat = plan.global_idx.reshape(-1)[:plan.r]
        return src[:, flat]

    if plan.dk > 0:
        src3 = src.reshape(C, S // LANE, LANE)       # channel-major, no copy
        rows_sub = plan.r_tile // LANE
        n_m = plan.m_starts.shape[0]
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(n_m,),
            in_specs=[
                pl.BlockSpec((plan.sg * rows_sub, LANE),
                             lambda i, ss, do, so: (i, _I0())),
                pl.BlockSpec(memory_space=pltpu.ANY),
            ],
            out_specs=pl.BlockSpec((C, plan.sg * rows_sub, LANE),
                                   lambda i, ss, do, so: (_I0(), i, _I0())),
            scratch_shapes=[
                pltpu.VMEM((2, C, plan.pad + plan.m_w_rows, LANE), src.dtype),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        )
        out = pl.pallas_call(
            _make_diag_kernel(C, plan.dk, plan.m_w_rows, plan.sg, rows_sub),
            out_shape=jax.ShapeDtypeStruct((C, plan.r_pad // LANE, LANE),
                                           src.dtype),
            grid_spec=grid_spec,
        )(plan.m_starts, plan.d_off, plan.sub_off, plan.local_idx, src3)
        return out.reshape(C, plan.r_pad)[:, :plan.r]

    if plan.sg > 1:
        src3 = src.reshape(C, S // LANE, LANE).transpose(1, 0, 2)
        rows_sub = plan.r_tile // LANE
        n_m = plan.m_starts.shape[0]
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(n_m,),
            in_specs=[
                pl.BlockSpec((plan.sg * rows_sub, LANE),
                             lambda i, ms, so: (i, _I0())),
                pl.BlockSpec(memory_space=pltpu.ANY),
            ],
            out_specs=pl.BlockSpec((C, plan.sg * rows_sub, LANE),
                                   lambda i, ms, so: (_I0(), i, _I0())),
            scratch_shapes=[
                pltpu.VMEM((2, plan.m_w_rows, C, LANE), src.dtype),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        )
        out = pl.pallas_call(
            _make_merged_kernel(C, plan.w_rows, plan.m_w_rows, plan.sg,
                                rows_sub),
            out_shape=jax.ShapeDtypeStruct((C, plan.r_pad // LANE, LANE),
                                           src.dtype),
            grid_spec=grid_spec,
        )(plan.m_starts, plan.sub_off, plan.local_idx, src3)
        return out.reshape(C, plan.r_pad)[:, :plan.r]

    # channel-interleaved view: (S/128, C, 128) so windows are contiguous
    src3 = src.reshape(C, S // LANE, LANE).transpose(1, 0, 2)
    rows_per_tile = plan.r_tile // LANE
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(plan.n_tiles,),
        in_specs=[
            pl.BlockSpec((rows_per_tile, LANE),
                         lambda i, starts: (i, _I0())),
            pl.BlockSpec(memory_space=pltpu.ANY),    # src stays in HBM
        ],
        out_specs=pl.BlockSpec((C, rows_per_tile, LANE),
                               lambda i, starts: (_I0(), i, _I0())),
        scratch_shapes=[
            pltpu.VMEM((2, plan.w_rows, C, LANE), src.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out = pl.pallas_call(
        _make_gather_kernel(C, plan.w_rows),
        out_shape=jax.ShapeDtypeStruct((C, plan.r_pad // LANE, LANE),
                                       src.dtype),
        grid_spec=grid_spec,
    )(plan.starts, plan.local_idx, src3)
    return out.reshape(C, plan.r_pad)[:, :plan.r]


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class AsmPhysPlan:
    """Plan for the physical-layout internal-force assembly kernel.

    The (3, 8, E) Qe array keeps its natural T(8,128) tiling (Gauss slot on
    sublanes): windows are *element-block* ranges sliced straight out of the
    last axis, so no channel concats or row-major relayouts ever happen (the
    1M profile showed ~1.3 ms/step of pure relayout copies feeding the
    row-space assembly gather).  One grid step per 2048-node output tile
    gathers ALL (slot, dup) contributions from an (8, w) VMEM window with
    per-sublane lane lookups, accumulates across `rounds` dup-rounds and dk
    diagonal block offsets, reduces over the 8 slot sublanes in-register,
    and writes each output block exactly once — no (3, vl*N) intermediate,
    no output revisit, ~8x fewer DMA issues than the row-space plan.
    """
    rows: int = dataclasses.field(metadata=dict(static=True), default=16)
    dk: int = dataclasses.field(metadata=dict(static=True), default=0)
    rounds: int = dataclasses.field(metadata=dict(static=True), default=1)
    n_tiles: int = dataclasses.field(metadata=dict(static=True), default=0)
    w_blocks: int = dataclasses.field(metadata=dict(static=True), default=0)
    k0: int = dataclasses.field(metadata=dict(static=True), default=0)
    scratch_blocks: int = dataclasses.field(metadata=dict(static=True),
                                            default=0)
    ok: bool = dataclasses.field(metadata=dict(static=True), default=False)
    N: int = dataclasses.field(metadata=dict(static=True), default=0)
    # per-slot block-aligned pads (front, in lanes) aligning every slot's
    # windows: the 8 local corners of a hex mesh reference elements offset
    # by up to +-ny*nz from each other — without the alignment the shared
    # window would have to span that whole range.  The pads are VIRTUAL:
    # the kernel never materializes a padded source (measured 1.5 ms/step
    # of the 2.7 ms assembly at 1M elements was the pad+stack copy) —
    # instead the window DMA reads the raw (C, 8, E) Qe with a per
    # slot-GROUP source offset (slots sharing a pad form contiguous runs),
    # landing each group at its aligned scratch position.
    slot_pad: tuple = dataclasses.field(metadata=dict(static=True),
                                        default=())
    src_len: int = dataclasses.field(metadata=dict(static=True), default=0)
    # contiguous runs of equal slot pads: ((pad_blocks, slot_lo, slot_hi)..)
    pad_groups: tuple = dataclasses.field(metadata=dict(static=True),
                                          default=())
    # static scratch front margin absorbing the per-group source clamping
    # (a group's unclamped window can run past either end of the raw source
    # by up to max(pad) blocks); lane reads shift by the same margin
    margin: int = dataclasses.field(metadata=dict(static=True), default=0)
    E: int = dataclasses.field(metadata=dict(static=True), default=0)
    # effective diagonal depth after the per-(tile, s) rebase: row s of tile
    # t reads merged blocks s_off[t*rows+s] + [0, dke) instead of the full
    # [0, dk) at static column s — dke = max per-(tile,s) SPAN of the
    # diagonal indices (3-4 at 1M vs dk=5), so the kernel's d-loop shrinks
    # by dk/dke with zero runtime cost
    dke: int = dataclasses.field(metadata=dict(static=True), default=0)
    starts: jnp.ndarray = None    # (n_tiles,) int32 virtual src block start
    shifts: jnp.ndarray = None    # (n_tiles,) int32 virtual dest block off
    g_starts: jnp.ndarray = None  # (n_tiles*n_groups,) int32 clamped raw-
    #                               source block starts per (tile, group)
    g_shifts: jnp.ndarray = None  # (n_tiles*n_groups,) int32 scratch dest
    #                               block offsets per (tile, group)
    lidx: jnp.ndarray = None      # (n_tiles*rounds*rows*8, 128) int32
    s_off: jnp.ndarray = None     # (n_tiles*rows,) int32 rebased merged-
    #                               block base per output row (k0m-relative)


_PHYS_SENTINEL = 127 * 128      # drow 127: never selected (dk <= 32)


def plan_assemble_phys(elem: np.ndarray, nE: int, E: int, N: int,
                       r_tile: int = 2048, dk_max: int = 8,
                       rounds_max: int = 4, force_pads=None,
                       min_dk: int = 0, min_rounds: int = 0,
                       min_k0: int = 0, min_dke: int = 0) -> AsmPhysPlan:
    """Build an :class:`AsmPhysPlan` from the (8, E) connectivity.

    ``ok=False`` when the mesh numbering defeats the diagonal-window
    assumption (node tile's incident elements drift nonlinearly) or a node
    has more than ``rounds_max`` incident elements on one local corner.

    ``force_pads``/``min_dk``/``min_rounds``/``min_k0`` override the
    data-derived values upward so several per-shard plans can share one set
    of static fields (see :func:`plan_sharded_assemble_phys`) — all are
    sound to raise: extra dk rounds select nothing, extra dup rounds are
    sentinel rows, a larger k0 just shifts every window inside a larger
    scratch.
    """
    rows = r_tile // LANE
    if N % r_tile or E % LANE:
        return AsmPhysPlan(ok=False)
    n_tiles = N // r_tile
    Eblk = E // LANE

    # (slot, dup) -> element per node
    flat_nodes = elem[:, :nE].reshape(-1)
    flat_slot = np.repeat(np.arange(8), nE)
    flat_e = np.tile(np.arange(nE), 8)
    order = np.argsort(flat_nodes, kind="stable")
    sn = flat_nodes[order]
    # dup rank within (node, slot) groups
    key = sn * 8 + flat_slot[order]
    starts_g = np.concatenate([[0], np.nonzero(np.diff(key))[0] + 1]) \
        if len(key) else np.zeros(0, np.int64)
    grp = np.repeat(starts_g, np.diff(np.concatenate([starts_g, [len(key)]]))) \
        if len(key) else np.zeros(0, np.int64)
    dup = np.arange(len(key)) - grp
    rounds = int(dup.max()) + 1 if len(key) else 1
    if rounds > rounds_max:
        return AsmPhysPlan(ok=False)
    rounds = max(rounds, min_rounds)

    # dense (N, rounds, 8) element table, -1 invalid
    tbl = np.full((N, rounds, 8), -1, np.int64)
    tbl[sn, dup, flat_slot[order]] = flat_e[order]
    valid0 = tbl >= 0

    # block-aligned per-slot alignment shift: slot i's elements sit at a
    # roughly constant offset from the node id (the 8 local corners differ
    # by up to ny*nz element ids); shifting each slot by its median offset
    # collapses all slots into one narrow shared window
    node_blk = (np.arange(N) >> 7)
    rel = np.where(valid0, (tbl >> 7) - node_blk[:, None, None], 0)
    if force_pads is not None:
        pad_i = np.asarray(force_pads, np.int64)   # front pad/slot, blocks
    else:
        shift_i = np.zeros(8, np.int64)
        for i in range(8):
            v = rel[:, :, i][valid0[:, :, i]]
            shift_i[i] = np.median(v) if v.size else 0
        pad_i = (shift_i.max() - shift_i)          # front pad/slot, blocks
    src_len = E + int(pad_i.max()) * LANE
    tbl_s = np.where(valid0, tbl + pad_i[None, None, :] * LANE, -1)

    e_blk = np.where(valid0, tbl_s >> 7, 0)
    s_of_n = (np.arange(N) % r_tile) // LANE                 # (N,)
    vbase = np.where(valid0, e_blk - s_of_n[:, None, None],
                     np.iinfo(np.int64).max)
    vb_t = vbase.reshape(n_tiles, -1).min(axis=1)            # (n_tiles,)
    vb_t = np.where(vb_t == np.iinfo(np.int64).max, 0, vb_t)
    base_n = np.repeat(vb_t, r_tile) + s_of_n                # (N,)
    delta = np.where(valid0, e_blk - base_n[:, None, None], 0)
    dk = int(delta.max()) + 1 if valid0.any() else 1
    if delta.min() < 0 or dk > dk_max:
        return AsmPhysPlan(ok=False)
    dk = max(dk, min_dk)

    Eblk = src_len // LANE
    w_blocks = rows + dk - 1
    if Eblk < w_blocks or E // LANE < w_blocks:
        return AsmPhysPlan(ok=False)
    src_start = np.clip(vb_t, 0, Eblk - w_blocks)
    k0 = max(int(max((vb_t - src_start).max(), 0)), min_k0)
    shifts = k0 - (vb_t - src_start)

    # --- per slot-group clamped windows on the RAW (unpadded) source.
    # Padded position q = pad_i[i]*LANE + e, so a group with pad P reads raw
    # blocks [start - P, start - P + w); clamping into [0, E/128 - w] keeps
    # the copy in range, and the dest offset absorbs the clamp so every
    # element still lands at its virtual scratch block (start-relative) +
    # margin.  Stale scratch outside a clamped copy is only read by lanes
    # whose delta points outside the raw element range, i.e. invalid lanes
    # the select discards.
    runs = []
    lo = 0
    for i in range(1, 9):
        if i == 8 or pad_i[i] != pad_i[lo]:
            runs.append((int(pad_i[lo]), lo, i))
            lo = i
    margin = int(pad_i.max())
    Eblk_u = E // LANE
    n_groups = len(runs)
    g_starts = np.zeros((n_tiles, n_groups), np.int64)
    g_shifts = np.zeros((n_tiles, n_groups), np.int64)
    for g, (pad_g, _, _) in enumerate(runs):
        raw = src_start - pad_g
        cs = np.clip(raw, 0, Eblk_u - w_blocks)
        g_starts[:, g] = cs
        g_shifts[:, g] = shifts + margin + (cs - raw)
    scratch_blocks = max(int(g_shifts.max()) + w_blocks,
                         k0 + margin + rows + dk - 1)

    # --- per-(tile, s) diagonal rebase: the kernel's static column base
    # (k0m + s) forces a d-loop over the GLOBAL diagonal depth dk; rebasing
    # each output row to its own min diagonal (a prefetched scalar) shrinks
    # the loop to the max SPAN dke (3-4 vs dk=5 at 1M).  base is clamped to
    # w_blocks - dke so every merged-block read stays in [0, w_blocks);
    # the clamp keeps drow in [0, dke) because b_hi = k0m + rows + dk - 1
    # >= k0m + s + dmax_ts + 1 for every (t, s).
    d5 = delta.reshape(n_tiles, rows, LANE, rounds, 8)
    v5 = valid0.reshape(n_tiles, rows, LANE, rounds, 8)
    dmin_ts = np.where(v5, d5, np.iinfo(np.int64).max).min(axis=(2, 3, 4))
    dmax_ts = np.where(v5, d5, -1).max(axis=(2, 3, 4))
    dmin_ts = np.where(dmax_ts >= 0, dmin_ts, 0)
    dke = max(int((dmax_ts - dmin_ts + 1).max()), 1) if valid0.any() else 1
    dke = max(dke, min_dke)
    s_arr = np.arange(rows)[None, :]
    base_rel = np.minimum(s_arr + dmin_ts, w_blocks - dke)   # (n_tiles, rows)
    off_n = (base_rel - s_arr).reshape(-1)[np.arange(N) // LANE]   # (N,)
    delta2 = delta - off_n[:, None, None]

    # lidx[(t, r, s, i), l] = rebased-delta*128 + e%128, sentinel if invalid
    lidx = np.full((N, rounds, 8), _PHYS_SENTINEL, np.int64)
    lidx[valid0] = delta2[valid0] * LANE + (tbl_s[valid0] & (LANE - 1))
    # (N, rounds, 8) -> (n_tiles, rounds, rows, 8, LANE)
    lidx = lidx.reshape(n_tiles, rows, LANE, rounds, 8)
    lidx = lidx.transpose(0, 3, 1, 4, 2).reshape(-1, LANE)

    return AsmPhysPlan(
        rows=rows, dk=dk, rounds=rounds, n_tiles=n_tiles, w_blocks=w_blocks,
        k0=k0, scratch_blocks=scratch_blocks, ok=True, N=N,
        slot_pad=tuple(int(p) * LANE for p in pad_i), src_len=src_len,
        pad_groups=tuple(runs), margin=margin, E=E,
        starts=jnp.asarray(src_start.astype(np.int32)),
        shifts=jnp.asarray(shifts.astype(np.int32)),
        g_starts=jnp.asarray(g_starts.astype(np.int32).reshape(-1)),
        g_shifts=jnp.asarray(g_shifts.astype(np.int32).reshape(-1)),
        lidx=jnp.asarray(lidx.astype(np.int32)),
        dke=int(dke), s_off=jnp.asarray(base_rel.astype(np.int32).reshape(-1)),
    )


def _make_phys_asm_kernel(C: int, dke: int, rounds: int, rows: int,
                          w_blocks: int, scratch_blocks: int, k0: int,
                          pad_groups, margin: int):
    n_groups = len(pad_groups)
    k0m = k0 + margin

    def kernel(gs_ref, gsh_ref, soff_ref, lidx_ref, src_hbm, out_ref,
               scratch, merged, sems):
        i = pl.program_id(0)
        n = pl.num_programs(0)
        slot = jax.lax.rem(i, jnp.int32(2))
        nxt = jax.lax.rem(i + jnp.int32(1), jnp.int32(2))

        def dma(s, t, g):
            # per slot-group copy straight out of the raw (C, 8, E) source:
            # the virtual per-slot alignment pads are realized by the
            # per-group source/dest offsets, never materialized.  Each
            # group gets its own full-8-row scratch plane — sub-slicing the
            # sublane-tiled slot dim in a DMA is a Mosaic alignment error
            # (tile 8), so the copy moves all 8 rows at group g's offset
            # and compute selects the rows that belong to the group.  All C
            # channels ride ONE strided copy (the kernel is DMA-issue
            # bound: 531 tiles x 3 ch x 2 groups was 3186 issues/step at
            # 1M elements; this cuts it 3x).
            tg = t * jnp.int32(n_groups) + jnp.int32(g)
            return pltpu.make_async_copy(
                src_hbm.at[:, :, pl.ds(gs_ref[tg] * LANE,
                                       w_blocks * LANE)],
                scratch.at[s, :, jnp.asarray(g, jnp.int32), :,
                           pl.ds(gsh_ref[tg] * LANE, w_blocks * LANE)],
                sems.at[s, jnp.asarray(g, jnp.int32)])

        @pl.when(i == 0)
        def _():
            # stale scratch (outside a clamped group copy) is read only by
            # select-discarded lanes; zero once so it can never hold NaN
            # bit patterns from uninitialized VMEM
            scratch[...] = jnp.zeros(scratch.shape, scratch.dtype)
            for g in range(n_groups):
                dma(slot, i, g).start()

        @pl.when(i + 1 < n)
        def _():
            for g in range(n_groups):
                dma(nxt, i + 1, g).start()

        lidx = lidx_ref[:]                  # (rounds*rows*8, 128)
        lane = lidx & (LANE - 1)
        drow = lidx >> 7
        # static row->group selector: row r of the combined window comes
        # from the plane of the group containing slot r
        row = jax.lax.broadcasted_iota(jnp.int32, (8, LANE), 0)
        for g in range(n_groups):
            dma(slot, i, g).wait()
        # group-merge pass: collapse the per-group scratch planes into ONE
        # block-major buffer (w_blocks dynamic-indexable blocks) with a
        # single static select cascade per column — the old kernel re-did
        # the cascade per (ch, s, d) use, ~rows*dk times per column
        for ch in range(C):
            for b in range(w_blocks):
                col = pl.ds((k0m + b) * LANE, LANE)
                V = scratch[slot, ch, 0, :, col]
                for g in range(1, n_groups):
                    _, lo, _ = pad_groups[g]
                    V = jax.lax.select(
                        row >= lo, scratch[slot, ch, g, :, col], V)
                merged[ch, b] = V
        # s outer / ch inner: the drow masks depend on (s, r) only, so one
        # mask set serves all C channels; the per-row rebased base comes
        # from SMEM (plan.s_off) and the d-loop runs dke <= dk iterations
        for s in range(rows):
            base = soff_ref[i * jnp.int32(rows) + jnp.int32(s)]
            accs = [None] * C
            for r in range(rounds):
                sl = slice((r * rows + s) * 8, (r * rows + s) * 8 + 8)
                lane_g = lane[sl]           # (8, 128)
                drow_g = drow[sl]
                masks = [drow_g == d for d in range(dke - 1)]
                valid = drow_g < jnp.int32(dke)     # sentinel rows drop out
                for ch in range(C):
                    vals = [_lane_lookup(merged[ch, base + jnp.int32(d)],
                                         lane_g) for d in range(dke)]
                    v = vals[dke - 1]
                    for d in reversed(range(dke - 1)):
                        v = jax.lax.select(masks[d], vals[d], v)
                    v = jax.lax.select(valid, v, jnp.zeros_like(v))
                    accs[ch] = v if accs[ch] is None else accs[ch] + v
            for ch in range(C):
                out_ref[ch, s, :] = jnp.sum(accs[ch], axis=0)
    return kernel


def blocked_assemble_phys(qe, plan: AsmPhysPlan) -> jnp.ndarray:
    """Qe -> (C, N) assembled nodal force via the physical-layout plan.

    ``qe`` is the raw (C, 8, E) internal-force array (or a [b][i] list of
    (E,) rows, stacked here).  It is passed to the kernel UNPADDED — the
    per-slot alignment pads live only in the plan's per-group DMA offsets.
    (The previous padded-source build cost 1.5 ms/step of the 2.7 ms
    assembly at 1M elements: a full (C, 8, E+pad) copy per call.)
    """
    if isinstance(qe, (list, tuple)):
        src = jnp.stack([jnp.stack(list(qb)) for qb in qe])
    else:
        src = qe
    C = src.shape[0]
    rows = plan.rows
    dke = plan.dke or plan.dk      # plans built before the rebase: dke=dk
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(plan.n_tiles,),
        in_specs=[
            pl.BlockSpec((plan.rounds * rows * 8, LANE),
                         lambda i, ss, sh, so: (i, _I0())),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((C, rows, LANE),
                               lambda i, ss, sh, so: (_I0(), i, _I0())),
        scratch_shapes=[
            pltpu.VMEM((2, C, len(plan.pad_groups), 8,
                        plan.scratch_blocks * LANE), src.dtype),
            # group-merged block-major window (dynamic block indexing)
            pltpu.VMEM((C, plan.w_blocks, 8, LANE), src.dtype),
            # one DMA semaphore per (slot, group): all C channels ride a
            # single strided copy, so the semaphore must be scalar per copy
            # (jax >= 0.9 rejects signaling on a non-()-shaped semaphore)
            pltpu.SemaphoreType.DMA((2, len(plan.pad_groups))),
        ],
    )
    out = pl.pallas_call(
        _make_phys_asm_kernel(C, dke, plan.rounds, rows, plan.w_blocks,
                              plan.scratch_blocks, plan.k0,
                              plan.pad_groups, plan.margin),
        out_shape=jax.ShapeDtypeStruct((C, plan.N // LANE, LANE), src.dtype),
        grid_spec=grid_spec,
    )(plan.g_starts, plan.g_shifts, plan.s_off, plan.lidx, src)
    return out.reshape(C, plan.N)


def plan_sharded_assemble_phys(elem_per_shard, nE_per_shard, E: int, N: int,
                               r_tile: int = 2048) -> AsmPhysPlan | None:
    """Per-shard physical-layout assembly plans with *uniform* static meta,
    stacked on a leading shard axis (use :func:`plan_local` on the
    device-local slice inside shard_map, exactly like sharded gather plans).

    The per-shard meta differs only through window-boundary effects (a
    boundary shard's per-slot median offset can land one block off), so the
    plans are re-built with a common pad vector and the max dk / rounds /
    k0 forced; scratch_blocks is then maxed post-hoc (it only sizes the
    VMEM scratch).  Returns None when any shard's plan is not ok — callers
    keep the lane-plan fallback."""
    S = len(elem_per_shard)

    def plan_all(**kw):
        return [plan_assemble_phys(elem_per_shard[d], nE_per_shard[d], E, N,
                                   r_tile=r_tile, **kw) for d in range(S)]

    def meta_set(ps):
        return {(p.rows, p.dk, p.rounds, p.n_tiles, p.w_blocks, p.k0,
                 p.scratch_blocks, p.N, p.slot_pad, p.src_len,
                 p.pad_groups, p.margin, p.E, p.dke) for p in ps}

    plans = plan_all()
    if not all(p.ok for p in plans):
        return None
    if len(meta_set(plans)) != 1:      # boundary shards drifted — force
        pads = np.max([np.asarray(p.slot_pad, np.int64) // LANE
                       for p in plans], axis=0)
        plans = plan_all(force_pads=pads)
        if not all(p.ok for p in plans):
            return None
        plans = plan_all(force_pads=pads,
                         min_dk=max(p.dk for p in plans),
                         min_rounds=max(p.rounds for p in plans),
                         min_k0=max(p.k0 for p in plans),
                         min_dke=max(p.dke for p in plans))
        if not all(p.ok for p in plans):
            return None
    scratch = max(p.scratch_blocks for p in plans)
    plans = [dataclasses.replace(p, scratch_blocks=scratch) for p in plans]
    if len(meta_set(plans)) != 1:
        return None
    return dataclasses.replace(
        plans[0],
        starts=jnp.stack([p.starts for p in plans]),
        shifts=jnp.stack([p.shifts for p in plans]),
        g_starts=jnp.stack([p.g_starts for p in plans]),
        g_shifts=jnp.stack([p.g_shifts for p in plans]),
        lidx=jnp.stack([p.lidx for p in plans]),
        s_off=jnp.stack([p.s_off for p in plans]))


def _stack_plans(plans) -> GatherPlan:
    """Stack per-shard plans (identical static meta) on a leading shard
    axis across every non-static array field."""
    rep = {}
    for f in dataclasses.fields(GatherPlan):
        if f.metadata.get("static"):
            continue
        vals = [getattr(p, f.name) for p in plans]
        rep[f.name] = (None if any(v is None for v in vals)
                       else jnp.stack(vals))
    return dataclasses.replace(plans[0], **rep)


def _plan_sharded_diag(indices_per_shard, source_len, valid_per_shard,
                       r_tile, max_w_rows, subgroups, diag_max_k,
                       m_w_cap) -> GatherPlan | None:
    """Diagonal-mode sharded plans: every shard on the dk-slice kernel with
    one static meta (dk, pad, m_w_rows, sg forced to the across-shard max /
    min).  Returns None unless every shard qualifies for diag mode and the
    meta converges — callers fall back to chunk-select."""
    S = len(indices_per_shard)

    def plan_all(sg, min_dk=0, min_mw=0, min_pad=0):
        return [plan_blocked_gather(indices_per_shard[d], source_len,
                                    valid=valid_per_shard[d], r_tile=r_tile,
                                    max_w_rows=max_w_rows, subgroups=sg,
                                    diag_max_k=diag_max_k, min_dk=min_dk,
                                    min_m_w_rows=min_mw, min_pad=min_pad,
                                    m_w_cap=m_w_cap)
                for d in range(S)]

    def meta_set(ps):
        return {(p.r, p.r_pad, p.w_rows, p.m_w_rows, p.sg, p.n_tiles,
                 p.dk, p.pad) for p in ps}

    plans = plan_all(subgroups)
    for _ in range(4):
        if not all(p.ok and p.dk > 0 for p in plans):
            return None
        if len(meta_set(plans)) == 1:
            return _stack_plans(plans)
        plans = plan_all(min(p.sg for p in plans),
                         min_dk=max(p.dk for p in plans),
                         min_mw=max(p.m_w_rows for p in plans),
                         min_pad=max(p.pad for p in plans))
    return None


def plan_sharded_gather(indices_per_shard, source_len: int,
                        valid_per_shard=None, r_tile: int = 2048,
                        max_w_rows: int = 64,
                        subgroups: int = 4,
                        diag_max_k: int = 6,
                        m_w_cap: int = 192) -> GatherPlan:
    """Per-shard plans with *uniform* static meta, stacked on a leading
    shard axis.

    Inside ``shard_map`` every device runs the same program, so the plan's
    static fields (w_rows, sg, m_w_rows, n_tiles, …) must agree across
    shards while the index arrays differ.  Diagonal mode is tried first
    (each shard planned independently, then re-planned with the max
    dk/pad/m_w and min sg forced — the fast dk-slice kernel); when any
    shard fails to qualify, every shard is re-planned in chunk-select mode
    with the max window sizes forced, and the arrays stacked.  Use
    :func:`plan_local` on the device-local slice inside the shard_map body.

    Falls back to ``ok=False`` (XLA gather via ``global_idx``) when any
    shard's plan does.
    """
    S = len(indices_per_shard)
    if valid_per_shard is None:
        valid_per_shard = [None] * S

    def plan_all(min_w, min_mw, sg):
        return [plan_blocked_gather(indices_per_shard[d], source_len,
                                    valid=valid_per_shard[d], r_tile=r_tile,
                                    max_w_rows=max_w_rows, subgroups=sg,
                                    diag_max_k=0, min_w_rows=min_w,
                                    min_m_w_rows=min_mw)
                for d in range(S)]

    if len({len(np.ravel(ix)) for ix in indices_per_shard}) != 1:
        raise ValueError("per-shard index lists must have equal length")

    if diag_max_k > 0:
        diag = _plan_sharded_diag(indices_per_shard, source_len,
                                  valid_per_shard, r_tile, max_w_rows,
                                  subgroups, diag_max_k, m_w_cap)
        if diag is not None:
            return diag

    plans = plan_all(1, 0, subgroups)
    uniform_ok = all(p.ok for p in plans)
    if uniform_ok:
        sg = min(p.sg for p in plans)         # any sg=1 fallback wins
        plans = plan_all(max(p.w_rows for p in plans),
                         max(p.m_w_rows for p in plans), sg)
        uniform_ok = (all(p.ok for p in plans)
                      and len({(p.r, p.r_pad, p.w_rows, p.m_w_rows, p.sg,
                                p.n_tiles) for p in plans}) == 1)
    if not uniform_ok:
        # per-shard sg/merge divergence (e.g. one shard's subgroup merge
        # falling back while another keeps sg=4): retry everywhere with
        # sg=1 — no merge padding, so r_pad is uniform given equal r, and
        # the chunk-select kernel still runs (slower than merged windows,
        # far faster than the XLA gather)
        plans = plan_all(max(p.w_rows for p in plans), 0, 1)
        uniform_ok = (all(p.ok for p in plans)
                      and len({(p.r, p.r_pad, p.w_rows, p.m_w_rows, p.sg,
                                p.n_tiles) for p in plans}) == 1)
    if not uniform_ok:
        # XLA-gather fallback across all shards; the stacked index arrays
        # must still share one shape (forced max window rows, sg=1) so the
        # --devices path degrades instead of raising at jnp.stack
        import logging
        meta = [(p.ok, p.r, p.r_pad, p.w_rows, p.m_w_rows, p.sg, p.n_tiles)
                for p in plans]
        logging.getLogger(__name__).warning(
            "plan_sharded_gather: non-uniform per-shard plans; multi-chip "
            "path will use the XLA-gather fallback (3-5x slower); per-shard "
            "(ok, r, r_pad, w_rows, m_w_rows, sg, n_tiles) = %s", meta)
        plans = plan_all(max(p.w_rows for p in plans), 0, 1)

    def stack(field):
        vals = [getattr(p, field) for p in plans]
        if any(v is None for v in vals):
            return None
        return jnp.stack(vals)

    meta = plans[0]
    return GatherPlan(
        r=meta.r, r_pad=meta.r_pad, r_tile=meta.r_tile, w_rows=meta.w_rows,
        n_tiles=meta.n_tiles, ok=bool(uniform_ok), dk=0, pad=0,
        sg=meta.sg if uniform_ok else 1,
        m_w_rows=meta.m_w_rows if uniform_ok else 0,
        starts=stack("starts"), local_idx=stack("local_idx"),
        global_idx=stack("global_idx"),
        m_starts=stack("m_starts") if uniform_ok else None,
        sub_off=stack("sub_off") if uniform_ok else None,
    )


def plan_local(plan: GatherPlan) -> GatherPlan:
    """Device-local view of a stacked per-shard plan inside shard_map
    (arrays arrive with a leading shard axis of size 1)."""
    rep = {}
    for f in dataclasses.fields(plan):
        v = getattr(plan, f.name)
        if not f.metadata.get("static") and v is not None:
            rep[f.name] = v[0]
    return dataclasses.replace(plan, **rep)


# ---------------------------------------------------------------------------
# Fused element-kernel gather plan ("gather-phys"): per element-KERNEL tile
# windows over the nodal source, per-slot diagonal bases, so the MXU packed
# element kernel can resolve disp/dprev element copies from small VMEM
# windows instead of streaming materialized (24, E) arrays from HBM.
#
# Motivation (docs/PERF.md round-5 session 3): the packed kernel is
# DMA-bandwidth bound at ~410 GB/s duplex; the disp_e/dprev_e streams are
# 200 MB/step at 1M and the standalone gather's merged windows re-read the
# nodal source ~25x (slot rows interleave).  One window per element tile
# serves all 8 slots of both sources for ~80 MB/step total.
# ---------------------------------------------------------------------------

@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class GatherPhysPlan:
    """Window plan for the fused in-kernel nodal gather.

    Kernel contract (see element_pallas._make_mxu_kernel, fused mode): for
    element-kernel tile t (TE elements = ``rows_c`` 128-lane chunks):

    - ONE async copy per source: interleaved nodal array (N/128, C, 128)
      rows [win_start[t], +w_copy) -> window scratch.
    - V2 build: V2[ch, w][i, :] = window[s_off[t*8+i] + w, ch, :] — the
      per-slot diagonal bases collapse into sublane-interleaved planes.
    - resolve chunk c of output row (b, i): lane/drow from ``lidx``;
      value = V2[b, c + drow][i, lane] with drow in [0, dke).
    """
    te: int = dataclasses.field(metadata=dict(static=True), default=0)
    rows_c: int = dataclasses.field(metadata=dict(static=True), default=0)
    n_tiles: int = dataclasses.field(metadata=dict(static=True), default=0)
    dke: int = dataclasses.field(metadata=dict(static=True), default=0)
    w_copy: int = dataclasses.field(metadata=dict(static=True), default=0)
    w_v2: int = dataclasses.field(metadata=dict(static=True), default=0)
    N: int = dataclasses.field(metadata=dict(static=True), default=0)
    E: int = dataclasses.field(metadata=dict(static=True), default=0)
    ok: bool = dataclasses.field(metadata=dict(static=True), default=False)
    win_start: jnp.ndarray = None   # (n_tiles,) int32 raw source block start
    s_off: jnp.ndarray = None       # (n_tiles*8,) int32 per-slot V2 base
    #                                 relative to win_start (window rows)
    lidx: jnp.ndarray = None        # (n_tiles*rows_c*8, 128) int32
    #                                 lane | drow<<7; sublane = slot


def plan_gather_phys(elem: np.ndarray, N: int, E: int, te: int,
                     dk_max: int = 8) -> GatherPhysPlan:
    """Build a :class:`GatherPhysPlan` from (8, E) 0-based connectivity.

    ``ok=False`` when the mesh numbering defeats the per-slot diagonal
    assumption (node-block drift within one slot's tile span exceeds
    ``dk_max``) or the window would span more than ~1/4 of the source.
    Padding elements must reference node 0 (they gather real values that
    the element flag later masks).
    """
    if E % te or N % LANE or te % LANE:
        return GatherPhysPlan(ok=False)
    rows_c = te // LANE
    n_tiles = E // te
    src_rows = N // LANE

    nb = np.asarray(elem, np.int64) >> 7                 # (8, E)
    s_of_e = (np.arange(E) % te) >> 7                    # chunk in tile
    vbase = nb - s_of_e[None, :]                         # (8, E)
    vb = vbase.reshape(8, n_tiles, te)
    base_ti = vb.min(axis=2)                             # (8, n_tiles)
    drow0 = vbase - base_ti[:, (np.arange(E) // te)]     # (8, E) >= 0
    dke = int(drow0.max()) + 1
    if dke > dk_max:
        return GatherPhysPlan(ok=False)
    w_v2 = rows_c + dke - 1

    lo_t = base_ti.min(axis=0)                           # (n_tiles,)
    hi_t = (base_ti + w_v2).max(axis=0)                  # exclusive
    w_copy = int((hi_t - lo_t).max())
    if w_copy > max(src_rows, 1) or w_copy > 4 * (rows_c + dke) + 64:
        return GatherPhysPlan(ok=False)
    win_start = np.clip(lo_t, 0, max(src_rows - w_copy, 0))
    s_off = (base_ti - win_start[None, :])               # (8, n_tiles)
    if (s_off < 0).any() or (s_off + w_v2 > w_copy).any():
        # clamp pushed a window past a slot's range (mesh edge) — bail to
        # the unfused path rather than reason about margins
        return GatherPhysPlan(ok=False)

    lane = (np.asarray(elem, np.int64) & (LANE - 1))
    lidx = lane + (drow0 << 7)                           # (8, E)
    # -> (n_tiles, rows_c, 8, LANE): sublane = slot, lanes = elements
    lidx = lidx.reshape(8, n_tiles, rows_c, LANE).transpose(1, 2, 0, 3)

    return GatherPhysPlan(
        te=te, rows_c=rows_c, n_tiles=n_tiles, dke=int(dke),
        w_copy=int(w_copy), w_v2=int(w_v2), N=N, E=E, ok=True,
        win_start=jnp.asarray(win_start.astype(np.int32)),
        s_off=jnp.asarray(s_off.T.reshape(-1).astype(np.int32)),
        lidx=jnp.asarray(lidx.reshape(-1, LANE).astype(np.int32)),
    )
