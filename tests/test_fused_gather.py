"""Fused in-kernel nodal gather (GatherPhysPlan) equivalence.

The fused path must be arithmetically IDENTICAL to the disp_e-carry packed
path: the kernel gathers the same f32 values the standalone gather
materializes, and the kinematic differences use the same operation order.
Reference: the disp_e build feeding cal_stress_hexa,
HAKAI-v0.0.2/Julia/HAKAI_j.jl:487-530.
"""
import dataclasses
import os

import jax.numpy as jnp
import numpy as np
import pytest

from hakai_tpu.config import SolverConfig
from hakai_tpu.core.lowering import lower
from hakai_tpu.core.state import init_state
from hakai_tpu.pre.synthetic import bar_model
from hakai_tpu.solver.explicit import run_chunk


@pytest.fixture(scope="module")
def bar():
    return bar_model(nx=8, ny=8, nz=32, d_time=1e-8, end_time=1.0)


def _run(bar, fused, n=12):
    os.environ["HAKAI_PALLAS_FORCE"] = "1"
    try:
        cfg = SolverConfig(dtype="float32", element_kernel="pallas_mxu",
                           fused_gather=("auto" if fused else "off"))
        model = lower(bar, cfg)
        if fused:
            assert model.plan_gphys is not None and model.plan_gphys.ok, \
                "bar mesh must admit the fused gather plan"
        s = run_chunk(model, init_state(model), n)
        return model, s
    finally:
        del os.environ["HAKAI_PALLAS_FORCE"]


def test_fused_gather_plan_builds(bar):
    cfg = SolverConfig(dtype="float32", element_kernel="pallas_mxu")
    model = lower(bar, cfg)
    p = model.plan_gphys
    assert p is not None and p.ok
    assert p.te * p.n_tiles == model.E
    # every drow must be inside [0, dke)
    drow = np.asarray(p.lidx) >> 7
    assert drow.min() >= 0 and drow.max() < p.dke


def test_fused_matches_unfused_trajectory(bar):
    _, s_ref = _run(bar, fused=False)
    _, s_fused = _run(bar, fused=True)
    np.testing.assert_array_equal(np.asarray(s_ref.disp),
                                  np.asarray(s_fused.disp))
    np.testing.assert_allclose(np.asarray(s_ref.stress),
                               np.asarray(s_fused.stress),
                               rtol=0, atol=0)
    np.testing.assert_array_equal(np.asarray(s_ref.eq_ps),
                                  np.asarray(s_fused.eq_ps))
