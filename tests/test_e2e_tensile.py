"""End-to-end regression on the reference's minimal smoke deck
(Tensile5e.inp: 5 hex8 elements, J2 + ductile damage, 20k steps).

The pinned values are fast drift guards; *correctness* of the same
trajectory is established independently by the cross-implementation oracle
diff (tests/test_oracle_diff.py: rel <= 1e-9 against a straight-line NumPy
transliteration of the reference math over the first 2000 steps).  Physical
checks (BC displacement, symmetric necking, middle-element fracture) tie
the run to the reference's documented behavior.
"""
import numpy as np
import pytest

from hakai_tpu.core.lowering import lower
from hakai_tpu.core.state import init_state
from hakai_tpu.io.inp import read_inp_file
from hakai_tpu.solver.explicit import run_chunk
from conftest import ref_deck


@pytest.fixture(scope="module")
def tensile_model():
    return lower(read_inp_file(ref_deck("Tensile5e.inp")))


def test_step2000_golden(tensile_model):
    lm = tensile_model
    st = run_chunk(lm, init_state(lm), 2000)
    # prescribed end: amp(1e-3) * 10 = 1.0 exactly
    np.testing.assert_allclose(float(st.disp[1, 5]), 1.0, rtol=1e-12)
    np.testing.assert_allclose(float(st.stress[1, 0, 2]), 827.3909039284042,
                               rtol=1e-9)
    np.testing.assert_allclose(float(st.eq_ps[:, :5].mean()),
                               0.01595053607182296, rtol=1e-9)
    np.testing.assert_allclose(float(st.yield_s.max()), 829.121779158758,
                               rtol=1e-9)


def test_full_run_fracture(tensile_model):
    lm = tensile_model
    st = run_chunk(lm, init_state(lm), lm.time_num)
    flags = np.asarray(st.element_flag)[:5]
    # the middle element necks and erodes; ends stay elastic-ish
    assert flags.sum() == 4
    assert not flags[2]
    eq = np.asarray(st.eq_ps[:, :5].mean(0))
    # symmetric profile, peak in the middle (zeroed on deletion -> stored 0.3)
    assert eq[1] > eq[0] and eq[3] > eq[4]
    np.testing.assert_allclose(eq[0], eq[4], rtol=0.01)
    # final prescribed displacement reached
    np.testing.assert_allclose(float(st.disp[1, 5]), 10.0, rtol=1e-12)


def test_time_num_and_output_schedule(tensile_model):
    lm = tensile_model
    assert lm.time_num == 20000
    assert lm.time_num // lm.config.output_num == 200
