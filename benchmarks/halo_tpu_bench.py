"""Halo-path TPU measurement (round-2 verdict #3 done-bar): a 1-shard halo
step on the real chip vs the single-chip fast path.  Defaults to the 131k
flagship bar; env NX/NY/NZ pick the mesh (64/64/256 = the 1M pod-shard
regime) and EKERNEL routes the element math (auto | pallas | pallas_mxu).
Slope-timed like bench.py."""
import os, sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
from hakai_tpu.config import SolverConfig
from hakai_tpu.core.lowering import lower
from hakai_tpu.core.state import init_state
from hakai_tpu.pre.synthetic import bar_model
from hakai_tpu.solver.explicit import run_chunk
from hakai_tpu.parallel.halo import init_halo_state, make_halo_step, partition
from hakai_tpu.parallel.sharding import make_mesh

N1, N2 = int(os.environ.get("N1", 50)), int(os.environ.get("N2", 400))
nx = int(os.environ.get("NX", 32))
ny = int(os.environ.get("NY", 32))
nz = int(os.environ.get("NZ", 128))
cfg = SolverConfig(dtype="float32", node_pad=128, elem_pad=128,
                   renumber="always",
                   element_kernel=os.environ.get("EKERNEL", "auto"))
model = lower(bar_model(nx=nx, ny=ny, nz=nz, d_time=1e-8, end_time=1.0), cfg)
E = model.n_element

# --- single-chip fast path
state = init_state(model)
ts = {}
for k in (N1, N2):
    s = run_chunk(model, state, k); float(jnp.sum(s.disp))
    t0 = time.perf_counter()
    s = run_chunk(model, state, k); float(jnp.sum(s.disp))
    ts[k] = time.perf_counter() - t0
base_step = (ts[N2] - ts[N1]) / (N2 - N1)
print(f"single-chip fast path: {base_step*1e3:.3f} ms/step "
      f"({E/base_step:.3e} elem-steps/s)", flush=True)

# --- 1-shard halo path on the same chip
hm = partition(model, 1)
print(f"halo: No={hm.No} H={hm.H} El={hm.El} fast={hm.h_plan_pos is not None}",
      flush=True)
mesh = make_mesh(1)
hs0 = init_halo_state(hm)
ts = {}
for k in (N1, N2):
    step_k = make_halo_step(hm, mesh, n_steps=k)
    s = step_k(hs0); float(jnp.sum(s.disp))
    t0 = time.perf_counter()
    s = step_k(hs0); float(jnp.sum(s.disp))
    ts[k] = time.perf_counter() - t0
halo_step = (ts[N2] - ts[N1]) / (N2 - N1)
print(f"halo 1-shard:          {halo_step*1e3:.3f} ms/step "
      f"({E/halo_step:.3e} elem-steps/s)  "
      f"overhead {100*(halo_step/base_step-1):+.1f}%", flush=True)
