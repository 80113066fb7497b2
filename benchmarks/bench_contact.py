"""Contact-deck benchmark: ms/step on the reference crash decks.

The driver's bench.py times the no-contact headline bar; the reference's
actual workload is the contact decks (cal_contact_force, HAKAI_j.jl:2248-2706
— hot loop #2).  This script slope-times the product step on the crash decks
in the validated ``mixed`` precision and writes a JSON artifact so contact
progress is captured per round next to the headline.

Usage:  python benchmarks/bench_contact.py [--out BENCH_CONTACT.json]
Env:    DECKS (comma-sep deck names), N1/N2 slope chunks, N_WARM.
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DECK_DIR = "/root/reference/HAKAI-v0.0.2/input"
DEFAULT_DECKS = ["car-crash-N2k", "car-wall-N22k", "carx2-crash-N43k"]


def bench_deck(name, n_warm, n1, n2):
    import jax
    import jax.numpy as jnp

    from hakai_tpu.config import SolverConfig
    from hakai_tpu.core.lowering import lower
    from hakai_tpu.core.state import init_state
    from hakai_tpu.io.inp import read_inp_file
    from hakai_tpu.solver import explicit as ex

    path = os.path.join(DECK_DIR, f"{name}.inp")
    model = lower(read_inp_file(path), SolverConfig(dtype="mixed"))
    state = ex.run_chunk(model, init_state(model), n_warm)
    float(jnp.sum(state.disp))

    full = jax.jit(lambda s, n: ex.run_chunk(model, s, n), static_argnums=1)
    out = {}
    for k in (n1, n2):
        float(jnp.sum(full(state, k).disp))
        t0 = time.perf_counter()
        float(jnp.sum(full(state, k).disp))
        out[k] = time.perf_counter() - t0
    per = (out[n2] - out[n1]) / (n2 - n1)
    return dict(deck=name, n_element=model.n_element, n_node=model.n_node,
                pairs=len(model.pairs), precision="mixed",
                us_per_step=per * 1e6,
                elem_steps_per_sec=model.n_element / per)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="BENCH_CONTACT.json")
    args = ap.parse_args()
    decks = os.environ.get("DECKS", ",".join(DEFAULT_DECKS)).split(",")
    n_warm = int(os.environ.get("N_WARM", 5000))
    n1 = int(os.environ.get("N1", 200))
    n2 = int(os.environ.get("N2", 1200))
    results = []
    for d in decks:
        r = bench_deck(d, n_warm, n1, n2)
        print(json.dumps(r), flush=True)
        results.append(r)
    with open(args.out, "w") as f:
        json.dump(results, f, indent=1)
    print(f"wrote {args.out}", flush=True)


if __name__ == "__main__":
    main()
