"""Multi-device domain-decomposition tests on a virtual 8-device CPU mesh."""
import dataclasses

import jax
import numpy as np
import pytest

from hakai_tpu.config import SolverConfig
from hakai_tpu.core.lowering import lower
from hakai_tpu.core.state import init_state
from hakai_tpu.io.model import IC
from hakai_tpu.parallel.sharding import make_mesh, make_sharded_step, shard_arrays
from hakai_tpu.solver.explicit import run_chunk
from test_element import unit_cube_model
from test_contact import two_body_model


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_matches_single_device():
    m = unit_cube_model(nx=4, ny=2, nz=2, plastic=[[0.5, 0.0], [1.0, 1.0]])
    dofs = np.arange(1, m.n_node * 3 + 1, 3) + 2
    m.ics.append(IC(type="VELOCITY", dof=[dofs], value=[3.0]))
    cfg = SolverConfig(elem_pad=8)
    lm = lower(m, cfg)
    ref = run_chunk(lm, init_state(lm), 50)

    mesh = make_mesh(8)
    ms, ss = shard_arrays(lm, init_state(lm), mesh)
    stepn = make_sharded_step(ms, mesh, n_steps=50)
    out = stepn(ss)
    np.testing.assert_allclose(np.asarray(out.disp), np.asarray(ref.disp),
                               rtol=1e-12, atol=1e-15)
    np.testing.assert_allclose(np.asarray(out.stress), np.asarray(ref.stress),
                               rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(np.asarray(out.eq_ps), np.asarray(ref.eq_ps),
                               rtol=1e-10, atol=1e-15)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_contact_impact():
    """Full step with contact + erosion under shard_map stays consistent."""
    m = two_body_model(gap=-0.01)
    cfg = SolverConfig(elem_pad=8)
    lm = lower(m, cfg)
    ref = run_chunk(lm, init_state(lm), 20)

    mesh = make_mesh(8)
    ms, ss = shard_arrays(lm, init_state(lm), mesh)
    stepn = make_sharded_step(ms, mesh, n_steps=20)
    out = stepn(ss)
    np.testing.assert_allclose(np.asarray(out.disp), np.asarray(ref.disp),
                               rtol=1e-10, atol=1e-14)
    np.testing.assert_allclose(np.asarray(out.contact_force),
                               np.asarray(ref.contact_force),
                               rtol=1e-10, atol=1e-14)
