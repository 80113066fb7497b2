"""Per-phase slope profile of a FRACTURE contact deck (default
bullet-impact) — scopes the VERDICT #4 question: how much of the step do
the per-step contact activity masks (tri_active / ni_active / nj_active,
flag-derived, recomputed every step on fracture decks because erosion can
fire) actually cost?

Phases (chained fori_loops, round-2 protocol):
  full     — run_chunk (the product step)
  contact  — contact_forces_pv alone
  masks    — the activity-mask computation alone (3 flag gathers + bool
             logic per pair), chained through a float cast

Env: DECK, N_WARM, N1, N2, PRECISION (default mixed).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
jax.config.update("jax_enable_x64", True)
if os.environ.get("PLATFORM"):   # the axon plugin ignores JAX_PLATFORMS;
    jax.config.update("jax_platforms", os.environ["PLATFORM"])
import jax.numpy as jnp

from hakai_tpu.config import SolverConfig
from hakai_tpu.core.lowering import lower
from hakai_tpu.core.state import init_state
from hakai_tpu.io.inp import read_inp_file
from hakai_tpu.ops.contact import contact_forces_pv, _node_active
from hakai_tpu.solver import explicit as ex

DECK = os.environ.get(
    "DECK", "/root/reference/HAKAI-v0.0.0/input/bullet-impact.inp")
N_WARM = int(os.environ.get("N_WARM", 2000))
N1 = int(os.environ.get("N1", 200))
N2 = int(os.environ.get("N2", 1200))

model = lower(read_inp_file(DECK),
              SolverConfig(dtype=os.environ.get("PRECISION", "mixed")))
print(f"E={model.n_element} N={model.n_node} pairs={len(model.pairs)} "
      f"fracture={model.fracture_enabled}", flush=True)
for pi, pair in enumerate(model.pairs):
    print(f"  pair{pi}: F2={pair.tri_nodes.shape[1]} "
          f"Ci={pair.cand_nodes.shape[0]} Cj={pair.jnode_nodes.shape[0]} "
          f"self={pair.is_self} static={pair.static_activity}", flush=True)

state = ex.run_chunk(model, init_state(model), N_WARM)
float(jnp.sum(state.disp))
print(f"alive after warm: {int(state.element_flag.sum())}/{model.E}",
      flush=True)


def slope(fn, init, label):
    out = {}
    for k in (N1, N2):
        r = fn(init, k)
        float(jnp.sum(getattr(r, "disp", r)))
        t0 = time.perf_counter()
        r = fn(init, k)
        float(jnp.sum(getattr(r, "disp", r)))
        out[k] = time.perf_counter() - t0
    per = (out[N2] - out[N1]) / (N2 - N1)
    print(f"{label:16s}{per*1e6:8.1f} us/step", flush=True)
    return per


full = jax.jit(lambda s, n: ex.run_chunk(model, s, n), static_argnums=1)
slope(full, state, "full step:")

edt = model.edtype
pos0 = (model.coord + state.disp).astype(edt)
vel0 = state.velo.astype(edt)
flag0 = state.element_flag


@jax.jit
def contact_loop(pos, n):
    def body(_, p):
        f = contact_forces_pv(model, p, vel0, flag0)
        return p + jnp.asarray(1e-30, edt) * f.astype(edt)
    return jax.lax.fori_loop(0, n, body, pos)


slope(lambda p, n: contact_loop(p, n), pos0, "contact (all):")


@jax.jit
def masks_loop(x, n):
    def body(_, f):
        flag = f > 0.5
        acc = jnp.zeros((), edt)
        for pair in model.pairs:
            if pair.static_activity:
                continue
            twin_dead = ((pair.tri_twin >= 0)
                         & ~flag[jnp.clip(pair.tri_twin, 0, None)])
            tri_active = ((pair.tri_init | twin_dead)
                          & flag[pair.tri_elem])
            ni = _node_active(flag, pair.cand_init, pair.cand_twin)
            nj = _node_active(flag, pair.jnode_init, pair.jnode_twin)
            acc = acc + (tri_active.sum() + ni.sum() + nj.sum()).astype(edt)
        return f + 1e-30 * acc / (acc + 1.0)
    return jax.lax.fori_loop(0, n, body, x)


slope(lambda f, n: masks_loop(f, n), flag0.astype(edt), "masks (all):")
