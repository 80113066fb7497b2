"""Chunk-unroll sweep on car-crash-N22k (mixed precision) — is the
launch-bound step amortized by cross-step fusion?"""
import sys, time
sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_enable_x64", True)   # mixed = f64 nodal carry
import jax.numpy as jnp
from hakai_tpu.config import SolverConfig
from hakai_tpu.io.inp import read_inp_file
from hakai_tpu.core.lowering import lower
from hakai_tpu.core.state import init_state
from hakai_tpu.solver.explicit import run_chunk

deck = "/root/reference/HAKAI-v0.0.2/input/car-crash-N22k.inp"
m_raw = read_inp_file(deck)
for U in (1, 2, 4, 8):
    cfg = SolverConfig(dtype="mixed", chunk_unroll=U)
    model = lower(m_raw, cfg)
    t0 = time.perf_counter()
    state = run_chunk(model, init_state(model), 2000)
    float(jnp.sum(state.disp))
    print(f"U={U}: compile+2000 {time.perf_counter()-t0:.1f}s", flush=True)
    state = run_chunk(model, state, 2000)
    float(jnp.sum(state.disp))
    t0 = time.perf_counter()
    state = run_chunk(model, state, 2000)
    float(jnp.sum(state.disp))
    t1 = time.perf_counter()
    print(f"U={U}: {(t1-t0)/2000*1e6:.0f} us/step", flush=True)

# MXU packed kernel on the launch-bound contact deck: one element kernel
# replaces ~10 element-math fusions (fewer launches), independent of unroll
for U in (1, 4):
    cfg = SolverConfig(dtype="mixed", chunk_unroll=U, elem_pad=1024,
                       element_kernel="pallas_mxu")
    model = lower(m_raw, cfg)
    state = run_chunk(model, init_state(model), 2000)
    float(jnp.sum(state.disp))
    state = run_chunk(model, state, 2000)
    float(jnp.sum(state.disp))
    t0 = time.perf_counter()
    state = run_chunk(model, state, 2000)
    float(jnp.sum(state.disp))
    t1 = time.perf_counter()
    print(f"mxu U={U}: {(t1-t0)/2000*1e6:.0f} us/step", flush=True)
