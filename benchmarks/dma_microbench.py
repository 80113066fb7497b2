"""HBM streaming microbenchmark: why does the packed element kernel's
dmaonly floor run at ~420 GB/s (half of v5e's 819)?

Hypothesis: a BlockSpec (rows, TE) slice of a (rows, E) array is `rows`
strided bursts of TE*4 bytes at stride E*4 (~8-16 KB at ~4 MB stride);
HBM/DMA efficiency may be far below a contiguous stream.

Cases (all move the same 288 MB in + 288 MB out per pass):
  strided   — in (72, E) BlockSpec (72, TE): 72 x 8KB strided bursts/tile
  tilemajor — in (n_tiles, 72, TE) BlockSpec (1, 72, TE): one 576 KB
              contiguous burst/tile
  flat      — in (E*72/128, 128)? simple 2-D contiguous row blocks

Env: E (default 1048576), TE (default 2048), N1/N2 slope reps.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

E = int(os.environ.get("E", 1048576))
TE = int(os.environ.get("TE", 2048))
N1 = int(os.environ.get("N1", 20))
N2 = int(os.environ.get("N2", 120))
ROWS = 72
n_tiles = E // TE
GB = ROWS * E * 4 / 1e9


def copy_kernel(x_ref, o_ref):
    o_ref[:] = x_ref[:] + 1.0


def run(tag, shape, block, index_map):
    x = jnp.zeros(shape, jnp.float32)

    f = pl.pallas_call(
        copy_kernel,
        grid=(n_tiles,),
        in_specs=[pl.BlockSpec(block, index_map, memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(block, index_map, memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(shape, jnp.float32),
    )

    @jax.jit
    def loop(x, n):
        return jax.lax.fori_loop(0, n, lambda _, v: f(v), x)

    out = {}
    for k in (N1, N2):
        r = loop(x, k)
        float(jnp.sum(r))
        t0 = time.perf_counter()
        r = loop(x, k)
        float(jnp.sum(r))
        out[k] = time.perf_counter() - t0
    per = (out[N2] - out[N1]) / (N2 - N1)
    print(f"{tag:10s}{per*1e6:9.1f} us/pass  "
          f"{2 * GB / per:7.1f} GB/s (r+w)", flush=True)


I0 = lambda: jnp.asarray(0, jnp.int32)
run("strided", (ROWS, E), (ROWS, TE), lambda i: (I0(), i))
run("tilemajor", (n_tiles, ROWS, TE), (1, ROWS, TE),
    lambda i: (i, I0(), I0()))
run("flat", (ROWS * n_tiles, TE), (ROWS, TE), lambda i: (i, I0()))
