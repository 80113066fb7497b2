"""Scoped-VMEM budget probe for the 1M MXU packed step.

``XLA_FLAGS=--xla_tpu_scoped_vmem_limit_kib=N`` is UNUSABLE under the axon
tunnel: the local (CPU-build) XLA flag parser FATALs on the unknown
TPU-compiler flag before the client even connects (measured 2026-08-18).
The flag must travel as per-compilation ``compiler_options`` instead, which
the PJRT client forwards to the server-side TPU compiler.

Probes two things at 1M elements (64x64x256 bar, f32, auto->MXU kernel):
  1. does a bigger scoped-VMEM budget change the default (TE=1024) step?
  2. does it unlock HAKAI_MXU_TILE=2048 (OOMs the default 16M budget by
     1.45M on the kernel stack)?
Slope-timed like bench.py.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
import jax.numpy as jnp

from hakai_tpu.config import SolverConfig
from hakai_tpu.core.lowering import lower
from hakai_tpu.core.state import init_state
from hakai_tpu.pre.synthetic import bar_model
from hakai_tpu.solver.explicit import run_chunk

N1, N2 = 20, 120
nx = int(os.environ.get("NX", 64))
ny = int(os.environ.get("NY", 64))
nz = int(os.environ.get("NZ", 256))


def timed(model, state, opts, label):
    steps = {}
    for k in (N1, N2):
        fn = jax.jit(lambda s, _k=k: run_chunk(model, s, _k))
        try:
            ex = fn.lower(state).compile(compiler_options=opts)
        except Exception as e:  # noqa: BLE001 — probe records and moves on
            print(f"{label}: compile failed: {type(e).__name__}: "
                  f"{str(e)[:300]}", flush=True)
            return
        s = ex(state)
        float(jnp.sum(s.disp))
        t0 = time.perf_counter()
        s = ex(state)
        float(jnp.sum(s.disp))
        steps[k] = time.perf_counter() - t0
    per = (steps[N2] - steps[N1]) / (N2 - N1)
    E = model.n_element
    print(f"{label}: {per*1e3:.3f} ms/step ({E/per:.3e} elem-steps/s)",
          flush=True)


cfg = SolverConfig(dtype="float32", node_pad=128, elem_pad=128)
model = lower(bar_model(nx=nx, ny=ny, nz=nz, d_time=1e-8, end_time=1.0), cfg)
state = init_state(model)

timed(model, state, None, "default budget (16M), TE=default")
for kib in (32768, 49152, 98304):
    timed(model, state,
          {"xla_tpu_scoped_vmem_limit_kib": str(kib)},
          f"scoped_vmem={kib//1024}M, TE=default")

# TE=2048 needs the env knob at lowering/compile time of the kernel call
os.environ["HAKAI_MXU_TILE"] = "2048"
model2 = lower(bar_model(nx=nx, ny=ny, nz=nz, d_time=1e-8, end_time=1.0),
               cfg)
state2 = init_state(model2)
for kib in (32768, 49152):
    timed(model2, state2,
          {"xla_tpu_scoped_vmem_limit_kib": str(kib)},
          f"scoped_vmem={kib//1024}M, TE=2048")
