"""Decompose the phys-asm kernel cost at 1M: DMA+merge floor, lane-lookup
cost, mux/select cost — the kernel measures 1.29 ms vs a ~0.6 ms op-count
model and a 0.14 ms HBM floor; find the gap.

Variants (monkeypatched kernel factory, same plan/DMA pattern):
  full      — the product kernel
  nolookup  — _lane_lookup replaced by identity (drops the dynamic gather)
  nomux     — mux/valid selects dropped (sum of raw lookups)
  mergeonly — out written straight from the merged buffer (no s-loop work)
  nomerge   — merge pass skipped, inner reads group-0 scratch plane direct
              (static cols, old-style) — prices the merge pass itself
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
import jax.numpy as jnp

from hakai_tpu.config import SolverConfig
from hakai_tpu.core.lowering import lower
from hakai_tpu.ops import gather_pallas as gp
from hakai_tpu.pre.synthetic import bar_model

NX = int(os.environ.get("NX", 64))
NY = int(os.environ.get("NY", 64))
NZ = int(os.environ.get("NZ", 256))
N1, N2 = 20, 120
LANE = gp.LANE

cfg = SolverConfig(dtype="float32", node_pad=128, elem_pad=128,
                   element_kernel="pallas_mxu")
model = lower(bar_model(nx=NX, ny=NY, nz=NZ, d_time=1e-8, end_time=1.0), cfg)
plan = model.plan_asm2
print(f"E={model.E} N={plan.N} dk={plan.dk} dke={plan.dke} rows={plan.rows} "
      f"rounds={plan.rounds} n_tiles={plan.n_tiles} groups={plan.pad_groups}",
      flush=True)

qe = jax.random.normal(jax.random.PRNGKey(0), (3, 8, model.E), jnp.float32)

_orig = gp._make_phys_asm_kernel


def make_variant(mode):
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def _factory(C, dke, rounds, rows, w_blocks, scratch_blocks, k0,
                 pad_groups, margin):
        n_groups = len(pad_groups)
        k0m = k0 + margin

        def kernel(gs_ref, gsh_ref, soff_ref, lidx_ref, src_hbm, out_ref,
                   scratch, merged, sems):
            i = pl.program_id(0)
            n = pl.num_programs(0)
            slot = jax.lax.rem(i, jnp.int32(2))
            nxt = jax.lax.rem(i + jnp.int32(1), jnp.int32(2))

            def dma(s, t, g):
                tg = t * jnp.int32(n_groups) + jnp.int32(g)
                return pltpu.make_async_copy(
                    src_hbm.at[:, :, pl.ds(gs_ref[tg] * LANE,
                                           w_blocks * LANE)],
                    scratch.at[s, :, jnp.asarray(g, jnp.int32), :,
                               pl.ds(gsh_ref[tg] * LANE, w_blocks * LANE)],
                    sems.at[s, jnp.asarray(g, jnp.int32)])

            @pl.when(i == 0)
            def _():
                scratch[...] = jnp.zeros(scratch.shape, scratch.dtype)
                for g in range(n_groups):
                    dma(slot, i, g).start()

            @pl.when(i + 1 < n)
            def _():
                for g in range(n_groups):
                    dma(nxt, i + 1, g).start()

            lidx = lidx_ref[:]
            lane = lidx & (LANE - 1)
            drow = lidx >> 7
            row = jax.lax.broadcasted_iota(jnp.int32, (8, LANE), 0)
            for g in range(n_groups):
                dma(slot, i, g).wait()
            if mode != "nomerge":
                for ch in range(C):
                    for b in range(w_blocks):
                        col = pl.ds((k0m + b) * LANE, LANE)
                        V = scratch[slot, ch, 0, :, col]
                        for g in range(1, n_groups):
                            _, lo, _ = pad_groups[g]
                            V = jax.lax.select(
                                row >= lo, scratch[slot, ch, g, :, col], V)
                        merged[ch, b] = V
            if mode == "mergeonly":
                for s in range(rows):
                    for ch in range(C):
                        out_ref[ch, s, :] = jnp.sum(merged[ch, 0], axis=0)
                return
            for s in range(rows):
                base = soff_ref[i * jnp.int32(rows) + jnp.int32(s)]
                accs = [None] * C
                for r in range(rounds):
                    sl = slice((r * rows + s) * 8, (r * rows + s) * 8 + 8)
                    lane_g = lane[sl]
                    drow_g = drow[sl]
                    masks = [drow_g == d for d in range(dke - 1)]
                    valid = drow_g < jnp.int32(dke)
                    for ch in range(C):
                        if mode == "nomerge":
                            vals = [gp._lane_lookup(
                                scratch[slot, ch, 0, :,
                                        pl.ds((k0m + s + d) * LANE, LANE)],
                                lane_g) for d in range(dke)]
                        elif mode == "nolookup":
                            vals = [merged[ch, base + jnp.int32(d)]
                                    for d in range(dke)]
                        else:
                            vals = [gp._lane_lookup(
                                merged[ch, base + jnp.int32(d)], lane_g)
                                for d in range(dke)]
                        if mode == "nomux":
                            v = vals[0]
                            for d in range(1, dke):
                                v = v + vals[d]
                        else:
                            v = vals[dke - 1]
                            for d in reversed(range(dke - 1)):
                                v = jax.lax.select(masks[d], vals[d], v)
                            v = jax.lax.select(valid, v, jnp.zeros_like(v))
                        accs[ch] = v if accs[ch] is None else accs[ch] + v
                for ch in range(C):
                    out_ref[ch, s, :] = jnp.sum(accs[ch], axis=0)
        return kernel
    return _factory


def timed(tag, factory):
    gp._make_phys_asm_kernel = factory

    @jax.jit
    def chunk(q, n):
        def body(_, q):
            out = gp.blocked_assemble_phys(q, plan)
            return q + 1e-30 * out.sum()
        return jax.lax.fori_loop(0, n, body, q)

    try:
        out = {}
        for k in (N1, N2):
            r = chunk(qe, k)
            float(jnp.sum(r))
            t0 = time.perf_counter()
            r = chunk(qe, k)
            float(jnp.sum(r))
            out[k] = time.perf_counter() - t0
        per = (out[N2] - out[N1]) / (N2 - N1)
        print(f"{tag:10s}{per*1e6:9.1f} us/step", flush=True)
    finally:
        gp._make_phys_asm_kernel = _orig


timed("full", _orig)
for mode in ("nolookup", "nomux", "mergeonly", "nomerge"):
    timed(mode, make_variant(mode))
