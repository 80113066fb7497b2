"""Headline benchmark: hex8 element-steps/second on the flagship
elastoplastic tensile bar (the element kernel is the reference's hot loop #1,
cal_stress_hexa at HAKAI_j.jl:1033; no contact in this config).

Timing is slope-based — (T(n2 steps) - T(n1 steps)) / (n2 - n1) — so constant
dispatch/transfer latency cancels.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} with
vs_baseline = value / 1e9 (BASELINE.json north-star for a v5e-8).  With one
visible device this times the single-chip step; with >1 devices it times the
element-sharded multi-chip step over a jax.sharding.Mesh.
"""
import json
import os
import time


def main():
    import jax
    import jax.numpy as jnp

    from hakai_tpu.config import SolverConfig
    from hakai_tpu.core.lowering import lower
    from hakai_tpu.core.state import init_state
    from hakai_tpu.pre.synthetic import bar_model
    from hakai_tpu.solver.explicit import run_chunk

    nx = int(os.environ.get("BENCH_NX", 32))
    ny = int(os.environ.get("BENCH_NY", 32))
    nz = int(os.environ.get("BENCH_NZ", 128))
    n1 = int(os.environ.get("BENCH_N1", 50))
    n2 = int(os.environ.get("BENCH_N2", 400))
    n_dev = len(jax.devices())
    cfg = SolverConfig(dtype="float32", node_pad=128,
                       elem_pad=128 * max(1, n_dev),
                       elem_slab=int(os.environ.get("BENCH_SLAB", 0)),
                       element_kernel=os.environ.get("BENCH_EKERNEL", "auto"),
                       # bf16x3 MXU dots: validated within f32's intrinsic
                       # drift vs f64 over 2000-step trajectories (commit
                       # 28759ed); the headline runs the fast validated mode
                       mxu_precision=os.environ.get("BENCH_MXU_PREC", "high"))
    model = lower(bar_model(nx=nx, ny=ny, nz=nz, d_time=1e-8, end_time=1.0),
                  cfg)
    state = init_state(model)

    if n_dev > 1:
        from hakai_tpu.parallel.sharding import (make_mesh, make_sharded_step,
                                                 shard_arrays)
        mesh = make_mesh(n_dev)
        model_s, state = shard_arrays(model, state, mesh)
        stepper = {k: make_sharded_step(model_s, mesh, n_steps=k)
                   for k in (n1, n2)}

        def run_sync(s, k):
            s = stepper[k](s)
            _ = float(jnp.sum(s.disp))
            return s
    else:
        def run_sync(s, k):
            s = run_chunk(model, s, k)
            _ = float(jnp.sum(s.disp))   # scalar readback forces completion
            return s

    # compile both chunk sizes
    state = run_sync(state, n1)
    state = run_sync(state, n2)
    t0 = time.perf_counter()
    state = run_sync(state, n1)
    t1 = time.perf_counter() - t0
    t0 = time.perf_counter()
    state = run_sync(state, n2)
    t2 = time.perf_counter() - t0
    per_step = (t2 - t1) / (n2 - n1)

    eps = model.n_element / per_step
    print(json.dumps({
        "metric": "hex8_element_steps_per_sec",
        "value": eps,
        "unit": "elem*steps/s",
        "vs_baseline": eps / 1e9,
    }))


def _backend_reachable(timeout_s: int = 180) -> bool:
    """Probe backend init in a subprocess: the axon TPU tunnel can go down
    in a way that makes ``jax.devices()`` hang *forever* inside
    make_c_api_client (observed 2026-08-18, >6 h outage).  Failing fast with
    a diagnostic beats hanging the benchmark driver."""
    import subprocess
    import sys
    try:
        r = subprocess.run(
            [sys.executable, "-c", "import jax; jax.devices()"],
            timeout=timeout_s, capture_output=True)
        return r.returncode == 0
    except subprocess.TimeoutExpired:
        return False


def _wait_for_backend(max_wait_s: float) -> bool:
    """Bounded recovery wait: the tunnel outages observed so far are
    transient; retrying the (subprocess) probe for a while costs nothing if
    the backend is up (first probe succeeds) and can save the round's
    headline measurement if the driver lands in a brief outage window."""
    import sys
    deadline = time.monotonic() + max_wait_s
    first = True
    while True:
        if _backend_reachable():
            return True
        if time.monotonic() >= deadline:
            return False
        if first:
            print("bench.py: backend unreachable (TPU tunnel down?) — "
                  f"retrying probe for up to {max_wait_s / 60:.0f} min",
                  file=sys.stderr)
            first = False
        time.sleep(min(120.0, max(5.0, deadline - time.monotonic())))


if __name__ == "__main__":
    import sys
    if os.environ.get("BENCH_SKIP_PROBE") != "1":
        wait_min = float(os.environ.get("BENCH_WAIT_MIN", 20))
        if not _wait_for_backend(wait_min * 60.0):
            print("bench.py: backend unreachable (TPU tunnel down?) — "
                  "aborting instead of hanging", file=sys.stderr)
            sys.exit(3)
    main()
