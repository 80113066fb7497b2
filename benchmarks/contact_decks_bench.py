"""Contact-deck step timings (mixed precision, slope-timed): crash-tube
self-contact and car-crash-N2k — re-validation after chunk-exit triax,
packed-segment inventory, and auto-unroll changes."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
from hakai_tpu.config import SolverConfig
from hakai_tpu.io.inp import read_inp_file
from hakai_tpu.core.lowering import lower
from hakai_tpu.core.state import init_state
from hakai_tpu.solver.explicit import run_chunk

DECKS = [
    ("/root/reference/HAKAI-v0.0.1/input/crash-tube-80-350-solid-glmsh.inp",
     "crash-tube self-contact"),
    ("/root/reference/HAKAI-v0.0.2/input/car-crash-N2k.inp", "car-crash-N2k"),
]
for path, name in DECKS:
    if not os.path.exists(path):
        print(f"{name}: deck missing, skipped", flush=True)
        continue
    model = lower(read_inp_file(path), SolverConfig(dtype="mixed"))
    state = run_chunk(model, init_state(model), 2000)
    float(jnp.sum(state.disp))
    state = run_chunk(model, state, 2000)
    float(jnp.sum(state.disp))
    t0 = time.perf_counter()
    state = run_chunk(model, state, 2000)
    float(jnp.sum(state.disp))
    dt_step = (time.perf_counter() - t0) / 2000
    print(f"{name}: {dt_step*1e6:.0f} us/step "
          f"({model.n_element/dt_step:.2e} elem-steps/s)", flush=True)
