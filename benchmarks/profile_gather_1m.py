"""Gather-plan parameter sweep at the 1M-element regime.

The round-4 profile puts the disp_e gather at ~1.37 ms/step at 1M — 5x its
~0.27 ms HBM floor (windows ~100 MB + output 100 MB).  PERF.md's diag-plan
analysis says the kernel is DMA-*issue* bound once the lane lookup is
diagonal, so the lever is fewer grid steps x fewer copies: bigger r_tile
and/or bigger merge subgroups (sg), bounded by the merged-window VMEM cap.

Sweeps (r_tile, subgroups, m_w_cap) over the 1M bar's plan_pos index set
and slope-times blocked_gather standalone for each.

Env: NX NY NZ (default 64x64x256), N1 N2 (slope chunk sizes).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
import jax.numpy as jnp
import numpy as np

from hakai_tpu.config import SolverConfig
from hakai_tpu.core.lowering import lower
from hakai_tpu.core.state import init_state
from hakai_tpu.ops.gather_pallas import blocked_gather, plan_blocked_gather

NX = int(os.environ.get("NX", 64))
NY = int(os.environ.get("NY", 64))
NZ = int(os.environ.get("NZ", 256))
N1 = int(os.environ.get("N1", 20))
N2 = int(os.environ.get("N2", 120))

from hakai_tpu.pre.synthetic import bar_model

cfg = SolverConfig(dtype="float32", node_pad=128, elem_pad=128,
                   element_kernel="pallas_mxu")
model = lower(bar_model(nx=NX, ny=NY, nz=NZ, d_time=1e-8, end_time=1.0), cfg)
state = init_state(model)
E, N = model.E, model.coord.shape[1]
elem = np.asarray(model.elem)
elem_exists = np.asarray(model.elem_exists if hasattr(model, "elem_exists")
                         else np.ones(E, bool))
valid = np.tile(np.ones(E, bool), 8)
print(f"E={model.n_element} (pad {E}) N={model.n_node}", flush=True)

disp = state.disp + 0.0
eps = jnp.asarray(1e-30, disp.dtype)


def slope(fn, init, label):
    out = {}
    for k in (N1, N2):
        r = fn(init, k)
        float(jnp.sum(r))
        t0 = time.perf_counter()
        r = fn(init, k)
        float(jnp.sum(r))
        out[k] = time.perf_counter() - t0
    per = (out[N2] - out[N1]) / (N2 - N1)
    print(f"{label:38s}{per*1e6:9.1f} us/step", flush=True)
    return per


def time_plan(plan, label):
    n_m = plan.m_starts.shape[0] if plan.m_starts is not None else plan.n_tiles
    info = (f"dk={plan.dk} sg={plan.sg} w={plan.w_rows} m_w={plan.m_w_rows} "
            f"grid={n_m}")

    @jax.jit
    def loop(d, n):
        def body(_, dd):
            g = blocked_gather(dd, plan)
            return dd.at[:, :E].add(eps * g[:, :E])
        return jax.lax.fori_loop(0, n, body, d)

    slope(lambda d, n: loop(d, n), disp, f"{label} [{info}]")


base = plan_blocked_gather(elem.reshape(-1), N, valid=valid, subgroups=4)
time_plan(base, "r2048 sg4 cap192 (current)")

SWEEP = [(2048, 8, 384, 64), (2048, 16, 768, 64), (4096, 4, 384, 64),
         (4096, 8, 768, 64), (8192, 2, 384, 160), (8192, 4, 768, 160),
         (2048, 32, 1536, 64), (2048, 64, 3072, 64), (4096, 16, 1536, 64),
         (8192, 8, 1536, 160)]
if os.environ.get("SWEEP2"):
    SWEEP = [(2048, 32, 1536, 64), (2048, 64, 3072, 64),
             (4096, 16, 1536, 64), (8192, 8, 1536, 160),
             (8192, 16, 3072, 160)]
for (rt, sg, cap, mwr) in SWEEP:
    p = plan_blocked_gather(elem.reshape(-1), N, valid=valid, subgroups=sg,
                            r_tile=rt, m_w_cap=cap, max_w_rows=mwr)
    if not p.ok:
        print(f"r{rt} sg{sg} cap{cap}: plan not ok", flush=True)
        continue
    time_plan(p, f"r{rt} sg{sg} cap{cap}")
