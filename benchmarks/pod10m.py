"""Config-5 demonstration: a 10M+ hex8-element bar, lowered, partitioned,
compiled, and stepped over an 8-device mesh (BASELINE.json configs[4]).

Run on the 8-CPU virtual mesh (no pod needed):

    XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
        python benchmarks/pod10m.py

Prints wall times for every stage (lowering, halo partition + plan build,
compile, per-step execute).  The same script runs unchanged on a real
8-chip slice.  Shapes: nx*ny*nz hex8 elements via pre/synthetic.bar_model;
the halo decomposition is the node-sharded product path (run(halo=N)).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

# the axon TPU plugin ignores the JAX_PLATFORMS env var; route it through
# the config flag so the 8-CPU virtual mesh actually materializes
if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])


def main():
    n_dev = int(os.environ.get("POD_DEVICES", 8))
    nx = int(os.environ.get("POD_NX", 128))
    ny = int(os.environ.get("POD_NY", 128))
    nz = int(os.environ.get("POD_NZ", 640))
    n_steps = int(os.environ.get("POD_STEPS", 2))

    import jax.numpy as jnp

    from hakai_tpu.config import SolverConfig
    from hakai_tpu.core.lowering import lower
    from hakai_tpu.parallel.halo import (init_halo_state, make_halo_step,
                                         partition)
    from hakai_tpu.parallel.sharding import make_mesh
    from hakai_tpu.pre.synthetic import bar_model

    t0 = time.perf_counter()
    m = bar_model(nx=nx, ny=ny, nz=nz, d_time=1e-8, end_time=1.0)
    t_mesh = time.perf_counter() - t0
    print(f"mesh build: {m.n_element:,} elements, {m.n_node:,} nodes "
          f"({t_mesh:.1f} s)", flush=True)

    t0 = time.perf_counter()
    cfg = SolverConfig(dtype=os.environ.get("POD_DTYPE", "float32"),
                       node_pad=128 * n_dev, elem_pad=128,
                       element_kernel=os.environ.get("POD_EKERNEL", "auto"))
    model = lower(m, cfg)
    t_lower = time.perf_counter() - t0
    print(f"lowering (+ single-chip plans): {t_lower:.1f} s  "
          f"N={model.N:,} E={model.E:,}", flush=True)

    t0 = time.perf_counter()
    hm = partition(model, n_dev)
    t_part = time.perf_counter() - t0
    print(f"halo partition + window plans: {t_part:.1f} s  "
          f"No={hm.No:,} H={hm.H:,} El={hm.El:,} "
          f"fast_path={'yes' if hm.h_plan_pos is not None else 'no'} "
          f"phys_asm={'yes' if hm.h_plan_asm2 is not None else 'no'}",
          flush=True)

    mesh = make_mesh(n_dev)
    state = init_halo_state(hm)
    stepper = make_halo_step(hm, mesh, n_steps=1)

    t0 = time.perf_counter()
    state = stepper(state)
    _ = float(jnp.sum(state.disp))
    t_compile = time.perf_counter() - t0
    print(f"compile + first step: {t_compile:.1f} s", flush=True)

    t0 = time.perf_counter()
    for _ in range(n_steps):
        state = stepper(state)
    _ = float(jnp.sum(state.disp))
    per = (time.perf_counter() - t0) / n_steps
    rate = model.n_element / per
    print(f"execute: {per*1e3:.0f} ms/step  "
          f"({rate:.3g} elem-steps/s on this backend)", flush=True)
    assert bool(jnp.isfinite(state.disp).all()), "non-finite state"
    print("finite state after", n_steps + 1, "steps: OK", flush=True)


if __name__ == "__main__":
    main()
