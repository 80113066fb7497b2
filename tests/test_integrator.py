"""Integrator-level tests: IC encoding, rigid motion, BC amplitudes."""
import jax.numpy as jnp
import numpy as np

from hakai_tpu.core.lowering import lower
from hakai_tpu.core.state import init_state
from hakai_tpu.io.model import IC, BC, Amplitude
from hakai_tpu.solver.explicit import run_chunk, amplitude_values, step
from test_element import unit_cube_model


def test_rigid_motion_constant_velocity():
    """IC velocity with no BC: disp(t) = v * t * dt exactly
    (disp_pre = -v dt encoding, HAKAI_j.jl:232-239)."""
    m = unit_cube_model()
    v = 2.5
    dofs = np.arange(1, m.n_node * 3 + 1, 3) + 2   # all z dofs (1-based)
    m.ics.append(IC(type="VELOCITY", dof=[dofs], value=[v]))
    lm = lower(m)
    st = init_state(lm)
    st = run_chunk(lm, st, 100)
    expect = v * 100 * lm.dt
    got = np.asarray(st.disp[2])[np.asarray(lm.node_exists)]
    np.testing.assert_allclose(got, expect, rtol=1e-12)
    np.testing.assert_allclose(np.asarray(st.velo[2])[:lm.n_node], v, rtol=1e-12)
    # no spurious stress
    np.testing.assert_allclose(np.asarray(st.stress), 0.0, atol=1e-9)


def test_amplitude_interp_and_extrapolation():
    m = unit_cube_model()
    m.amplitudes.append(Amplitude(name="A", time=np.array([0.0, 1.0, 2.0]),
                                  value=np.array([0.0, 10.0, 10.0])))
    lm = lower(m)
    # inside segment 1
    np.testing.assert_allclose(float(amplitude_values(lm, 0.5)[0]), 5.0)
    # inside segment 2
    np.testing.assert_allclose(float(amplitude_values(lm, 1.5)[0]), 10.0)
    # beyond the table: reference falls back to segment 1 extrapolation
    # (time_index stays 1, HAKAI_j.jl:588-600)
    np.testing.assert_allclose(float(amplitude_values(lm, 3.0)[0]), 30.0)


def test_bc_prescribed_displacement():
    m = unit_cube_model()
    m.amplitudes.append(Amplitude(name="A", time=np.array([0.0, 1.0]),
                                  value=np.array([0.0, 1.0])))
    # node 1: z dof prescribed 4.0 * amp
    m.bcs.append(BC(dof=[np.array([3])], value=[4.0], amp_name="A",
                    amplitude=m.amplitudes[0]))
    lm = lower(m)
    st = init_state(lm)
    st = run_chunk(lm, st, 50)
    ct = 50 * lm.dt
    np.testing.assert_allclose(float(st.disp[2, 0]), 4.0 * ct, rtol=1e-12)


def test_bc_last_wins_dedup():
    """Two BC entries on the same dof: the later block wins, deterministically
    (reference applies blocks serially, HAKAI_j.jl:585-617)."""
    m = unit_cube_model()
    m.bcs.append(BC(dof=[np.array([3])], value=[1.0]))
    m.bcs.append(BC(dof=[np.array([3])], value=[2.0]))
    lm = lower(m)
    st = init_state(lm)
    st = run_chunk(lm, st, 1)
    np.testing.assert_allclose(float(st.disp[2, 0]), 2.0)


def test_determinism_bitwise():
    m = unit_cube_model(nx=2, ny=2, nz=2, plastic=[[1.0, 0.0], [2.0, 1.0]])
    dofs = np.arange(1, m.n_node * 3 + 1, 3) + 2
    m.ics.append(IC(type="VELOCITY", dof=[dofs], value=[5.0]))
    m.bcs.append(BC(dof=[np.array([1, 2, 3])], value=[0.0]))
    lm = lower(m)
    a = run_chunk(lm, init_state(lm), 200)
    b = run_chunk(lm, init_state(lm), 200)
    assert np.array_equal(np.asarray(a.disp), np.asarray(b.disp))
    assert np.array_equal(np.asarray(a.stress), np.asarray(b.stress))


def test_mass_scaling_dt():
    m = unit_cube_model()
    m.mass_scaling = 100.0
    m.d_time = 1e-3
    m.end_time = 1.0
    lm = lower(m)
    # dt *= sqrt(factor), M *= factor (HAKAI_j.jl:112-114, 215)
    np.testing.assert_allclose(lm.dt, 1e-2)
    assert lm.time_num == 100
    total = float(np.asarray(lm.diag_M)[np.asarray(lm.node_exists)].sum())
    np.testing.assert_allclose(total, 100.0 * 1.0, rtol=1e-12)
