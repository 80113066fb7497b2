"""Decompose the 1M phys-asm assembly cost: src pad/stack materialization
vs the Pallas kernel vs the legacy lane-plan path vs raw XLA scatter."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
import jax.numpy as jnp

from hakai_tpu.config import SolverConfig
from hakai_tpu.core.lowering import lower
from hakai_tpu.core.state import init_state
from hakai_tpu.ops.gather_pallas import blocked_assemble_phys, blocked_gather
from hakai_tpu.pre.synthetic import bar_model

NX = int(os.environ.get("NX", 64))
NY = int(os.environ.get("NY", 64))
NZ = int(os.environ.get("NZ", 256))
N1, N2 = 20, 120

cfg = SolverConfig(dtype="float32", node_pad=128, elem_pad=128,
                   element_kernel="pallas_mxu")
model = lower(bar_model(nx=NX, ny=NY, nz=NZ, d_time=1e-8, end_time=1.0), cfg)
E, N = model.E, model.coord.shape[1]
plan = model.plan_asm2
print(f"E={E} N={N} plan: rows={plan.rows} dk={plan.dk} rounds={plan.rounds} "
      f"n_tiles={plan.n_tiles} w_blocks={plan.w_blocks} "
      f"scratch_blocks={plan.scratch_blocks} src_len={plan.src_len} "
      f"slot_pad={plan.slot_pad}", flush=True)

key = jax.random.PRNGKey(0)
qe = jax.random.normal(key, (3, 8, E), jnp.float32)
eps = jnp.asarray(1e-30, jnp.float32)


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
    print(f"{label:18s}{per*1e6:9.1f} us/step", flush=True)
    return per


# 1. full phys-asm (src build + kernel)
@jax.jit
def full_loop(q, n):
    def body(_, qq):
        Q = blocked_assemble_phys(qq, plan)
        return qq + eps * Q[:, None, :1]
    return jax.lax.fori_loop(0, n, body, q)


slope(full_loop, qe, "phys full:")



# 3. legacy lane-plan path
if model.plan_asm is not None:
    mask = model.asm_mask

    @jax.jit
    def lane_loop(q, n):
        def body(_, qq):
            qf = qq.reshape(3, -1)
            vals = blocked_gather(qf, model.plan_asm)
            vals = vals.reshape(3, model.asm_vl, model.N)
            Q = jnp.where(mask[None], vals, 0.0).sum(axis=1)
            return qq + eps * Q[:, None, :1]
        return jax.lax.fori_loop(0, n, body, q)

    slope(lane_loop, qe, "lane plan:")


# NB: an XLA scatter-add probe at this size crashed the TPU worker
# ("kernel fault", 2026-08-19) — do not re-add it.

# correctness vs the lane-plan reference on this mesh
Q_phys = blocked_assemble_phys(qe, plan)[:, :model.N]
qf = qe.reshape(3, -1)
vals = blocked_gather(qf, model.plan_asm).reshape(3, model.asm_vl, model.N)
Q_lane = jnp.where(model.asm_mask[None], vals, 0.0).sum(axis=1)
import numpy as np
np.testing.assert_allclose(np.asarray(Q_phys), np.asarray(Q_lane),
                           rtol=1e-5, atol=1e-5)
print("phys == lane assembly: ok", flush=True)
