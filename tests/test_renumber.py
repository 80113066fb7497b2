"""RCM renumbering: window feasibility on scattered meshes + physics
invariance + output order restoration."""
import numpy as np

from hakai_tpu.config import SolverConfig
from hakai_tpu.core.lowering import lower
from hakai_tpu.core.renumber import renumber_model
from hakai_tpu.core.state import init_state
from hakai_tpu.io.inp import read_inp_file
from hakai_tpu.solver.explicit import run_chunk, _deck_order_frame
from hakai_tpu.solver.output import node_fields
from conftest import ref_deck


def test_car_mesh_becomes_bandable():
    m = read_inp_file(ref_deck("car-crash-N22k.inp"))
    lm_off = lower(m, SolverConfig(node_pad=128, elem_pad=128,
                                   renumber="off"))
    lm_auto = lower(m, SolverConfig(node_pad=128, elem_pad=128))
    # deck order defeats the plans; RCM fixes them
    assert not (lm_off.plan_pos.ok and lm_off.plan_asm.ok)
    assert lm_auto.plan_pos.ok and lm_auto.plan_asm.ok
    assert lm_auto.node_new2old is not None


def test_renumber_preserves_physics():
    """Same deck, renumbered vs deck order: node trajectories agree when
    mapped back (different summation order -> tolerance, not bitwise)."""
    m = read_inp_file(ref_deck("bullet-impact.inp"))
    lm0 = lower(m, SolverConfig(renumber="off"))
    m2, n2o, e2o = renumber_model(m)
    lm1 = lower(m2, SolverConfig(renumber="off"))
    s0 = run_chunk(lm0, init_state(lm0), 300)
    s1 = run_chunk(lm1, init_state(lm1), 300)
    d0 = np.asarray(s0.disp)[:, :m.n_node]
    d1 = np.asarray(s1.disp)[:, :m.n_node]
    back = np.zeros_like(d1)
    back[:, n2o] = d1
    np.testing.assert_allclose(back, d0, rtol=1e-8, atol=1e-13)


def test_output_order_restored(tmp_path):
    m = read_inp_file(ref_deck("car-crash-N22k.inp"))
    lm = lower(m, SolverConfig(node_pad=128, elem_pad=128))
    assert lm.node_new2old is not None
    st = init_state(lm)
    nd = node_fields(lm, st.stress, st.strain, st.eq_ps, st.triax)
    co, el, fl, di, ve, nd_o = _deck_order_frame(lm, st.disp, st.velo,
                                                 st.element_flag, nd)
    # coordinates come back in the deck's original order
    np.testing.assert_allclose(co[:, :m.n_node], m.coordmat)
    # connectivity maps to the original node ids
    np.testing.assert_array_equal(el[:, :m.n_element], m.elementmat - 1)
    assert fl[:m.n_element].all()
