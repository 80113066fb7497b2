"""Per-phase slope profile of the 1M-element bar step on the MXU packed
kernel (f32, fracture-free — the pod-shard regime).

Locates the gap between the measured step (~8 ms) and the speed-of-light
budget (~2.1 ms, docs/PERF.md): each phase runs in its own chained
fori_loop (state fed back through the output so the tunnel's async
dispatch can't shave iterations — the round-2 protocol).

  full     — run_chunk (the product step)
  kernel   — packed_element_step alone, P chained
  gather   — gather_disp_e alone, disp chained through the output
  asm      — assemble_internal_force alone, qe chained
  integ    — _integrate + state swap alone (no element math)

Env: NX NY NZ (default 64x64x256 = 1.05M), N1 N2 slope chunk sizes.
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
from hakai_tpu.ops.element import assemble_internal_force, gather_disp_e
from hakai_tpu.ops.element_pallas import packed_element_step
from hakai_tpu.pre.synthetic import bar_model
from hakai_tpu.solver import explicit as ex

NX = int(os.environ.get("NX", 64))
NY = int(os.environ.get("NY", 64))
NZ = int(os.environ.get("NZ", 256))
N1 = int(os.environ.get("N1", 20))
N2 = int(os.environ.get("N2", 120))

cfg = SolverConfig(dtype="float32", node_pad=128, elem_pad=128,
                   element_kernel=os.environ.get("EKERNEL", "pallas_mxu"),
                   mxu_precision=os.environ.get("MXU_PRECISION", "highest"))
model = lower(bar_model(nx=NX, ny=NY, nz=NZ, d_time=1e-8, end_time=1.0), cfg)
state = init_state(model)
E, N = model.E, model.coord.shape[1]
print(f"E={model.n_element} (pad {E}) N={model.n_node} "
      f"kernel={model.config.element_kernel}", flush=True)

state = ex.run_chunk(model, state, 50)
float(jnp.sum(state.disp))


def slope(fn, init, label):
    out = {}
    for k in (N1, N2):
        r = fn(init, k)
        float(jnp.sum(r[0] if isinstance(r, tuple) else r))
        t0 = time.perf_counter()
        r = fn(init, k)
        float(jnp.sum(r[0] if isinstance(r, tuple) else r))
        out[k] = time.perf_counter() - t0
    per = (out[N2] - out[N1]) / (N2 - N1)
    print(f"{label:12s}{per*1e6:9.1f} us/step", flush=True)
    return per


full = jax.jit(lambda s, n: ex.run_chunk(model, s, n).disp, static_argnums=1)
slope(full, state, "full:")

disp_e0 = gather_disp_e(model, state.disp)
P0 = ex.pack_gauss_state(state, E)
eps = jnp.asarray(1e-30, model.edtype)


@jax.jit
def kernel_loop(P, n):
    def body(_, p):
        P_new, qe, triax, flag = packed_element_step(
            model, model.coord_e, disp_e0, disp_e0, p, state.element_flag)
        return P_new
    return jax.lax.fori_loop(0, n, body, P)


slope(lambda p, n: kernel_loop(p, n), P0, "kernel:")


@jax.jit
def gather_loop(d, n):
    def body(_, dd):
        de = gather_disp_e(model, dd)
        return dd.at[:, :E].add(eps * de[:, 0, :])
    return jax.lax.fori_loop(0, n, body, d)


slope(lambda d, n: gather_loop(d, n), state.disp, "gather:")

qe0 = disp_e0.astype(model.edtype)


@jax.jit
def asm_loop(qe, n):
    def body(_, q):
        Q = assemble_internal_force(model, q)
        return q + eps * Q[:, None, :1]
    return jax.lax.fori_loop(0, n, body, qe)


slope(lambda q, n: asm_loop(q, n), qe0, "asm:")


@jax.jit
def integ_loop(s, n):
    def body(_, st):
        t, disp_new, velo, cforce, _ = ex._integrate(model, st)
        return st.replace(t=t, disp=disp_new, disp_pre=st.disp, velo=velo,
                          contact_force=cforce)
    return jax.lax.fori_loop(0, n, body, s)


slope(lambda s, n: integ_loop(s, n).disp, state, "integ:")
