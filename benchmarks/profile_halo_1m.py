"""Locate the halo-path overhead at 1M elements, S shards (default 1).

Round-3 measured the halo step +11% over the single-chip step at 1M on one
shard — the floor any real multi-chip run pays on top of compute.  This
script slope-times:

  single     — run_chunk (single-chip product step)
  halo       — make_halo_step chunk (the pod product step)
  halo nocol — same, with the ring collectives monkeypatched out
               (_exchange_window -> zero-pad concat, _return_ghosts ->
               slice+add of self rows): isolates ppermute cost from the
               window-materialization/plan overhead

Env: NX NY NZ (default 64x64x256), SHARDS, N1 N2.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
import jax.numpy as jnp

from hakai_tpu.config import SolverConfig
from hakai_tpu.core.lowering import lower
from hakai_tpu.core.state import init_state
from hakai_tpu.pre.synthetic import bar_model
from hakai_tpu.solver import explicit as ex

NX = int(os.environ.get("NX", 64))
NY = int(os.environ.get("NY", 64))
NZ = int(os.environ.get("NZ", 256))
N1 = int(os.environ.get("N1", 20))
N2 = int(os.environ.get("N2", 120))
S = int(os.environ.get("SHARDS", 1))

cfg = SolverConfig(dtype="float32", node_pad=128 * S, elem_pad=128 * S,
                   renumber="always",
                   element_kernel=os.environ.get("EKERNEL", "pallas_mxu"),
                   mxu_precision=os.environ.get("MXU_PRECISION", "highest"))
model = lower(bar_model(nx=NX, ny=NY, nz=NZ, d_time=1e-8, end_time=1.0), cfg)
state = ex.run_chunk(model, init_state(model), 50)
float(jnp.sum(state.disp))
print(f"E={model.n_element} N={model.n_node}", flush=True)


def slope(fn, init, label):
    out = {}
    for k in (N1, N2):
        r = fn(init, k)
        float(jnp.sum(r.disp if hasattr(r, "disp") else r))
        t0 = time.perf_counter()
        r = fn(init, k)
        float(jnp.sum(r.disp if hasattr(r, "disp") else r))
        out[k] = time.perf_counter() - t0
    per = (out[N2] - out[N1]) / (N2 - N1)
    print(f"{label:14s}{per*1e6:9.1f} us/step", flush=True)
    return per


single = jax.jit(lambda s, n: ex.run_chunk(model, s, n).disp, static_argnums=1)
t_single = slope(single, state, "single:")

from hakai_tpu.parallel import halo as H
from hakai_tpu.parallel.sharding import make_mesh

hm = H.partition(model, S)
print(f"S={S} No={hm.No} El={hm.El} H={hm.H}", flush=True)
mesh = make_mesh(S)
hs0 = H.init_halo_state(hm)
steppers = {k: H.make_halo_step(hm, mesh, n_steps=k) for k in (N1, N2)}
# warm
float(jnp.sum(steppers[N1](hs0).disp))


def halo_run(s, n):
    return steppers[n](s)


t_halo = slope(halo_run, hs0, "halo:")

# --- collectives stubbed: window from self-zeros, ghosts self-added ---
_exchange_real = H._exchange_window
_return_real = H._return_ghosts


def _exchange_stub(x, h):
    z = jnp.zeros(x.shape[:-1] + (h,), x.dtype)
    return jnp.concatenate([z, x, z], axis=-1)


def _return_stub(fw, h):
    return fw[..., h:-h]


H._exchange_window = _exchange_stub
H._return_ghosts = _return_stub
try:
    st2 = {k: H.make_halo_step(hm, mesh, n_steps=k) for k in (N1, N2)}
    float(jnp.sum(st2[N1](hs0).disp))
    t_nocol = slope(lambda s, n: st2[n](s), hs0, "halo nocol:")
finally:
    H._exchange_window = _exchange_real
    H._return_ghosts = _return_real

print(f"overhead: halo/single = {t_halo/t_single:.3f}  "
      f"nocol/single = {t_nocol/t_single:.3f}", flush=True)
