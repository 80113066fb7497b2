"""Headline benchmark: hex8 element-steps/second on the flagship
elastoplastic tensile bar (no contact — the element kernel is the reference's
hot loop #1, cal_stress_hexa at HAKAI_j.jl:1033).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} with
vs_baseline = value / 1e9 (the BASELINE.json north-star for a v5e-8;
this runs on however many chips are visible).
"""
import json
import os
import time

import jax


def main():
    from hakai_tpu.config import SolverConfig
    from hakai_tpu.core.lowering import lower
    from hakai_tpu.core.state import init_state
    from hakai_tpu.pre.synthetic import bar_model
    from hakai_tpu.solver.explicit import run_chunk

    nx = int(os.environ.get("BENCH_NX", 32))
    ny = int(os.environ.get("BENCH_NY", 32))
    nz = int(os.environ.get("BENCH_NZ", 128))
    steps = int(os.environ.get("BENCH_STEPS", 100))
    cfg = SolverConfig(dtype="float32", node_pad=128, elem_pad=128)
    model = lower(bar_model(nx=nx, ny=ny, nz=nz, d_time=1e-8, end_time=1.0),
                  cfg)
    n_elem = model.n_element
    state = init_state(model)

    # warmup + compile
    state = run_chunk(model, state, steps)
    state.disp.block_until_ready()

    t0 = time.perf_counter()
    reps = 3
    for _ in range(reps):
        state = run_chunk(model, state, steps)
    state.disp.block_until_ready()
    dt = (time.perf_counter() - t0) / reps

    eps = n_elem * steps / dt
    print(json.dumps({
        "metric": "hex8_element_steps_per_sec",
        "value": eps,
        "unit": "elem*steps/s",
        "vs_baseline": eps / 1e9,
    }))


if __name__ == "__main__":
    main()
