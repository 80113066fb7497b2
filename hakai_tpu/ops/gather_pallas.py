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
    starts: jnp.ndarray = None     # (n_tiles,) int32 window starts (row units)
    local_idx: jnp.ndarray = None  # (r_pad//LANE, LANE) int32 idx - starts*128
    global_idx: jnp.ndarray = None  # (r_pad//LANE, LANE) int32 (XLA fallback)


def plan_blocked_gather(indices: np.ndarray, source_len: int,
                        valid: np.ndarray | None = None,
                        r_tile: int = 2048,
                        max_w_rows: int = 64) -> GatherPlan:
    """Build a :class:`GatherPlan` for gathering ``indices`` (R,) out of a
    source of length ``source_len`` (must be a multiple of 128).

    ``valid`` masks entries whose value is ignored by the caller; they are
    repointed inside the tile window.  ``ok=False`` (XLA fallback) when any
    tile's index spread exceeds ``max_w_rows``*128 source elements.
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
    # clamp starts so windows stay in range
    src_rows = source_len // LANE
    starts = np.minimum(starts, max(src_rows - w_rows, 0)).astype(np.int32)
    local = tiles - (starts[:, None].astype(np.int64) * LANE)
    local = np.where(vtiles, local, 0).astype(np.int32)
    glob = np.where(validp, idxp, 0).astype(np.int32)
    return GatherPlan(
        r=r, r_pad=r_pad, r_tile=r_tile, w_rows=int(w_rows),
        n_tiles=n_tiles, ok=bool(ok),
        starts=jnp.asarray(starts),
        local_idx=jnp.asarray(local.reshape(r_pad // LANE, LANE)),
        global_idx=jnp.asarray(glob.reshape(r_pad // LANE, LANE)),
    )


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
        slot = jax.lax.rem(i, 2)
        nxt = jax.lax.rem(i + 1, 2)

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
        for ch in range(C):
            acc = jnp.zeros(lidx.shape, scratch.dtype)
            for c in range(w_rows):
                row = scratch[slot, c, ch, :]
                row_b = jnp.broadcast_to(row[None, :], (rows, LANE))
                val = _lane_lookup(row_b, lane)
                # raw lax.select: jnp.where's closed_call wrapper trips the
                # lowering cache inside Pallas bodies
                acc = jax.lax.select(crow == c, val, acc)
            out_ref[ch] = acc
    return kernel


def blocked_gather(src: jnp.ndarray, plan: GatherPlan) -> jnp.ndarray:
    """Gather ``src (C, S) -> (C, plan.r)`` using the precomputed plan.

    Falls back to XLA's gather when the plan is not usable (CPU backend or
    window overflow)."""
    C, S = src.shape
    if not plan.ok or jax.default_backend() != "tpu":
        flat = plan.global_idx.reshape(-1)[:plan.r]
        return src[:, flat]

    # channel-interleaved view: (S/128, C, 128) so windows are contiguous
    src3 = src.reshape(C, S // LANE, LANE).transpose(1, 0, 2)
    rows_per_tile = plan.r_tile // LANE
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(plan.n_tiles,),
        in_specs=[
            pl.BlockSpec((rows_per_tile, LANE), lambda i, starts: (i, 0)),
            pl.BlockSpec(memory_space=pltpu.ANY),    # src stays in HBM
        ],
        out_specs=pl.BlockSpec((C, rows_per_tile, LANE),
                               lambda i, starts: (0, i, 0)),
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
