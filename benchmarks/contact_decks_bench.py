"""Contact-deck step timings across the reference's crash family, with a
JSON artifact for the driver/judge (round-4 verdict #4).

Slope-timed ((T(n2) - T(n1)) / (n2 - n1), mixed precision — the validated
fast configuration for the fracture-free crash decks).  Reference workload:
cal_contact_force, HAKAI-v0.0.2/Julia/HAKAI_j.jl:2248-2706; the demo videos
are all contact decks, so this is the user-visible speed.

Env:
  DECKS=N2k,N22k,N43k,tube   subset selector (default: all present)
  N1/N2                      slope chunk sizes (default 200/1200)
  OUT                        JSON artifact path
                             (default BENCH_CONTACT.json at repo root)
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax

jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp

from hakai_tpu.config import SolverConfig
from hakai_tpu.core.lowering import lower
from hakai_tpu.core.state import init_state
from hakai_tpu.io.inp import read_inp_file
from hakai_tpu.solver.explicit import run_chunk

DECKS = {
    "N2k": "/root/reference/HAKAI-v0.0.2/input/car-crash-N2k.inp",
    "N22k": "/root/reference/HAKAI-v0.0.2/input/car-crash-N22k.inp",
    "N43k": "/root/reference/HAKAI-v0.0.2/input/carx2-crash-N43k.inp",
    "tube": "/root/reference/HAKAI-v0.0.1/input/crash-tube-80-350-solid-glmsh.inp",
}

sel = [s for s in os.environ.get("DECKS", ",".join(DECKS)).split(",") if s]
N1 = int(os.environ.get("N1", 200))
N2 = int(os.environ.get("N2", 1200))


def _cfg():
    cfg = SolverConfig(dtype="mixed")
    tb = int(os.environ.get("TRI_BLOCK", 0))
    nb = int(os.environ.get("NODE_BLOCK", 0))
    if tb or nb:
        import dataclasses
        rep = {}
        if tb:
            rep.update(tri_block=tb, tri_block_self=tb)
        if nb:
            rep.update(node_block=nb, node_block_self=nb)
        cfg = dataclasses.replace(
            cfg, contact=dataclasses.replace(cfg.contact, **rep))
    return cfg
out_path = os.environ.get(
    "OUT", os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "BENCH_CONTACT.json"))

results = {}
for name in sel:
    path = DECKS[name]
    if not os.path.exists(path):
        print(f"{name}: deck missing, skipped", flush=True)
        continue
    t_setup = time.perf_counter()
    model = lower(read_inp_file(path), _cfg())
    state = run_chunk(model, init_state(model), 2000)   # warm contact state
    float(jnp.sum(state.disp))
    ts = {}
    for k in (N1, N2):
        s = run_chunk(model, state, k)
        float(jnp.sum(s.disp))                           # compile
        t0 = time.perf_counter()
        s = run_chunk(model, state, k)
        float(jnp.sum(s.disp))
        ts[k] = time.perf_counter() - t0
    per = (ts[N2] - ts[N1]) / (N2 - N1)
    results[name] = {
        "us_per_step": per * 1e6,
        "elem_steps_per_sec": model.n_element / per,
        "n_element": model.n_element,
        "n_node": model.n_node,
        "precision": "mixed",
    }
    print(f"{name}: {per*1e6:.0f} us/step "
          f"({model.n_element/per:.2e} elem-steps/s, "
          f"E={model.n_element}, setup {time.perf_counter()-t_setup:.0f}s)",
          flush=True)

with open(out_path, "w") as f:
    json.dump({"metric": "contact_deck_us_per_step", "decks": results}, f,
              indent=1)
print(f"wrote {out_path}", flush=True)
