"""Probe the per-(tile, subgroup) diagonal-index spans of the gather and
phys-asm plans: the kernels run dk (x rounds) static iterations per tile,
but if most tiles only USE a span of 1-2 diagonals, pl.when gating on a
prefetched per-tile range skips most of the vector work.

CPU-only (reads the numpy plan arrays; no TPU needed).

Env: NX NY NZ (default 32x32x128 = 131k; use 64x64x256 for the 1M shape).
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax

jax.config.update("jax_platforms", "cpu")
import numpy as np

from hakai_tpu.config import SolverConfig
from hakai_tpu.core.lowering import lower
from hakai_tpu.pre.synthetic import bar_model

NX = int(os.environ.get("NX", 32))
NY = int(os.environ.get("NY", 32))
NZ = int(os.environ.get("NZ", 128))

cfg = SolverConfig(dtype="float32", node_pad=128, elem_pad=128,
                   element_kernel="pallas_mxu")
model = lower(bar_model(nx=NX, ny=NY, nz=NZ, d_time=1e-8, end_time=1.0), cfg)


def span_hist(lidx, group_rows, dk, sentinel_row=None, label=""):
    """lidx: (T*group_rows, 128) int32 (lane | drow<<7). Histogram the
    per-group (min drow, max drow) span width actually used."""
    lidx = np.asarray(lidx)
    drow = lidx >> 7
    G = lidx.shape[0] // group_rows
    d = drow.reshape(G, group_rows * 128)
    if sentinel_row is not None:
        valid = d != sentinel_row
        # group with no valid lane: span 0
        dmin = np.where(valid, d, 10**6).min(axis=1)
        dmax = np.where(valid, d, -1).max(axis=1)
        span = np.maximum(dmax - dmin + 1, 0)
    else:
        span = d.max(axis=1) - d.min(axis=1) + 1
    hist = np.bincount(span, minlength=dk + 2)
    mean_span = span.mean()
    print(f"{label}: dk={dk} groups={G} mean_span={mean_span:.2f} "
          f"hist(span->count)={dict((i, int(c)) for i, c in enumerate(hist) if c)}",
          flush=True)
    return span


p = model.plan_pos           # disp_e gather plan
print(f"gather plan: mode={'diag' if p.dk else 'chunk'} dk={p.dk} sg={p.sg} "
      f"local_idx={p.local_idx.shape} w={p.w_rows} n_tiles={p.n_tiles}")
if p.dk:
    # kernel d-loop granularity: one subtile = one r_tile tile = rows_t rows
    rows_t = p.r_tile // 128
    span_hist(p.local_idx, rows_t, p.dk, label="gather subtile")

ap = model.plan_asm2         # phys-asm plan
print(f"asm plan: ok={ap.ok} dk={ap.dk} rounds={ap.rounds} rows={ap.rows} "
      f"n_tiles={ap.n_tiles} groups={ap.pad_groups} w_blocks={ap.w_blocks}")
if ap.ok:
    # lidx layout: (n_tiles * rounds * rows * 8, 128); drow sentinel = 127
    # per (tile, s): the kernel loops rounds*dk; probe the span per
    # (tile, round, s) 8-sublane group (the unit the d-loop covers)
    span_hist(ap.lidx, 8, ap.dk, sentinel_row=127, label="asm (tile,r,s)")
    # and per (tile, s) across rounds: how many rounds actually carry lanes
    lidx = np.asarray(ap.lidx).reshape(ap.n_tiles, ap.rounds, ap.rows * 8, 128)
    live = (lidx >> 7) != 127
    live_rounds = live.reshape(ap.n_tiles, ap.rounds, -1).any(axis=2).sum(axis=1)
    print(f"asm live rounds per tile: mean={live_rounds.mean():.2f} "
          f"hist={np.bincount(live_rounds, minlength=ap.rounds + 1).tolist()}")
    live_rs = live.any(axis=3).reshape(ap.n_tiles, ap.rounds, ap.rows, 8)
    live_per_rs = live_rs.any(axis=3)  # (tiles, rounds, rows)
    frac = live_per_rs.mean()
    print(f"asm live (round,s) fraction: {frac:.3f} "
          f"(kernel executes all -> {1/max(frac,1e-9):.1f}x waste from dead rounds/rows)")
