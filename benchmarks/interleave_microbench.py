"""Mosaic sublane-interleave microbenchmark.

The fused-gather design (PERF.md round-5 session 3, lever #1) needs, per
(channel, window-row): an (8, 128) vreg whose sublane i comes from a
DIFFERENT dynamically-offset row of a VMEM window (slot i's diagonal).
This prices that primitive against a plain copy:

  copy      — read (8,128), write it (baseline: 2 ops)
  stackrows — out = stack of 8 dynamically-offset (128,) rows
  selrows   — out = select-cascade of 8 broadcast rows on a sublane iota
  gatherrow — dynamic_gather on (8,128) with per-sublane lane ids
              (the resolve step itself, for reference)

Grid mimics the 1M fused shape: 512 tiles x (3 ch x 20 rows) builds.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N_TILES = int(os.environ.get("N_TILES", 512))
BUILDS = int(os.environ.get("BUILDS", 60))    # builds per tile (3ch x 20w)
W = 64
LANE = 128


def run(tag, mode):
    def kernel(off_ref, src_ref, o_ref):
        acc = jnp.zeros((8, LANE), jnp.float32)
        row_i = jax.lax.broadcasted_iota(jnp.int32, (8, LANE), 0)
        for b in range(BUILDS):
            if mode == "copy":
                v = src_ref[b % W]
            elif mode == "stackrows":
                v = jnp.stack([src_ref[off_ref[i] + (b % 16), i % 8, :]
                               for i in range(8)])
            elif mode == "selrows":
                v = jnp.zeros((8, LANE), jnp.float32)
                for i in range(8):
                    r = src_ref[off_ref[i] + (b % 16), i % 8, :]
                    v = jax.lax.select(row_i == i,
                                       jnp.broadcast_to(r[None], (8, LANE)),
                                       v)
            elif mode == "gatherrow":
                lane = (row_i * 7 + b) % LANE
                dn = jax.lax.GatherDimensionNumbers(
                    offset_dims=(), collapsed_slice_dims=(1,),
                    start_index_map=(1,), operand_batching_dims=(0,),
                    start_indices_batching_dims=(0,))
                v = jax.lax.gather(src_ref[b % W], lane[..., None], dn,
                                   slice_sizes=(1, 1))
            acc = acc + v
        o_ref[:] = acc

    off = jnp.arange(8, dtype=jnp.int32) % 4
    src = jnp.ones((W, 8, LANE), jnp.float32)
    f = pl.pallas_call(
        kernel,
        grid=(N_TILES,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec((W, 8, LANE), lambda i: (0, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((8, LANE), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N_TILES * 8, LANE), jnp.float32),
    )

    @jax.jit
    def loop(s, n):
        def body(_, v):
            return v * 0.0 + f(off, v)[:W]
        return jax.lax.fori_loop(0, n, body, s[:, 0, :][:W] * 0 + s[:W, 0])

    # simpler chained loop: rebuild src each iter to defeat caching
    @jax.jit
    def loop2(s, n):
        def body(_, v):
            out = f(off, v)
            return v + 1e-30 * out[:1, :1]
        return jax.lax.fori_loop(0, n, body, s)

    out = {}
    for k in (20, 120):
        r = loop2(src, k)
        float(jnp.sum(r))
        t0 = time.perf_counter()
        r = loop2(src, k)
        float(jnp.sum(r))
        out[k] = time.perf_counter() - t0
    per = (out[120] - out[20]) / 100
    per_build_ns = per / (N_TILES * BUILDS) * 1e9
    print(f"{tag:10s}{per*1e6:9.1f} us/pass  {per_build_ns:7.1f} ns/build",
          flush=True)


run("copy", "copy")
run("selrows", "selrows")
run("stackrows", "stackrows")
run("gatherrow", "gatherrow")
