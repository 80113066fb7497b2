"""THREE-WAY cross-implementation diff (round-4 verdict #7).

``tests/ref_oracle.py`` (Julia transliteration) and the framework were
written by the same builder from the same file, so both could share one
misreading of HAKAI_j.jl.  ``tests/ref_oracle_m.py`` transliterates the
reference's ORIGINAL v0.0.1 Matlab (HAKAI-v0.0.1/Matlab/HAKAI.m) — the
codebase the Julia itself was validated against ("-> Match with Matlab",
HAKAI_j.jl:397,864,923).  Agreement of all three de-correlates the
transliteration risk: a shared misreading of the Julia would have to ALSO
match an independent reading of the Matlab.

Feature overlap: element math + B-bar + J2 plasticity + ductile erosion +
two-instance penalty contact with friction.  One real v0.0.1-vs-v0.0.2
divergence exists and is asserted below (the contact depth-rate clamp).
"""
import numpy as np
import pytest

from conftest import ref_deck
from ref_oracle import Oracle
from ref_oracle_m import OracleM

from hakai_tpu.config import SolverConfig
from hakai_tpu.core.lowering import lower
from hakai_tpu.core.state import init_state
from hakai_tpu.io.inp import read_inp_file
from hakai_tpu.solver.explicit import run_chunk


def _rel(a, b):
    a, b = np.asarray(a, float), np.asarray(b, float)
    den = max(np.abs(a).max(), np.abs(b).max(), 1e-30)
    return float(np.abs(a - b).max() / den)


def _perms(lm):
    nN, nE = lm.n_node, lm.n_element
    n2o = (np.asarray(lm.node_new2old) if lm.node_new2old is not None
           else np.arange(nN))
    e2o = (np.asarray(lm.elem_new2old) if lm.elem_new2old is not None
           else np.arange(nE))
    return n2o, e2o


def _deck_order(lm, st, n2o, e2o):
    nN, nE = lm.n_node, lm.n_element
    disp = np.zeros((3, nN))
    disp[:, n2o] = np.asarray(st.disp)[:, :nN]
    stress = np.zeros((6, nE, 8))
    stress[:, e2o, :] = np.asarray(st.stress)[:, :, :nE].transpose(0, 2, 1)
    eq = np.zeros((nE, 8))
    eq[e2o] = np.asarray(st.eq_ps)[:, :nE].T
    flag = np.zeros(nE, np.int64)
    flag[e2o] = np.asarray(st.element_flag)[:nE].astype(np.int64)
    return disp, stress, eq, flag


def test_three_way_tensile5e():
    """No contact: element + B-bar + hardening walk + yield update.  All
    three implementations must agree to 1e-9 through yield onset."""
    m = read_inp_file(ref_deck("Tensile5e.inp"))
    o = Oracle(m)
    om = OracleM(m)
    lm = lower(m, SolverConfig())
    st = init_state(lm)
    n2o, e2o = _perms(lm)
    for probe in range(4):
        for _ in range(500):
            o.step()
            om.step()
        st = run_chunk(lm, st, 500)
        disp, stress, eq, flag = _deck_order(lm, st, n2o, e2o)
        # Matlab-oracle vs Julia-oracle (fully independent formulations)
        assert _rel(o.disp, om.disp) < 1e-9, probe
        assert _rel(o.integ_stress, om.integ_stress) < 1e-9, probe
        assert _rel(o.eq_ps, om.eq_ps) < 1e-9, probe
        assert _rel(o.yield_stress, om.yield_stress) < 1e-9, probe
        # Matlab-oracle vs framework
        assert _rel(om.disp.reshape(-1, 3).T, disp) < 1e-9, probe
        assert _rel(np.transpose(om.integ_stress, (0, 1, 2)), stress) < 1e-9, probe
        assert _rel(om.eq_ps, eq) < 1e-9, probe
    assert om.eq_ps.max() > 0.01          # plasticity actually exercised


@pytest.mark.heavy
def test_three_way_bullet_impact():
    """Contact + erosion + re-exposure.  In v0.0.2-compat mode (the contact
    depth-rate clamp, the ONE v0.0.1 behavior v0.0.2 removed, disabled) the
    Matlab oracle matches both the Julia oracle and the framework to 1e-9
    through erosion."""
    m = read_inp_file(ref_deck("bullet-impact.inp"))
    o = Oracle(m)
    om = OracleM(m, compat_v002=True)
    lm = lower(m, SolverConfig())
    st = init_state(lm)
    n2o, e2o = _perms(lm)
    for probe in range(5):
        for _ in range(250):
            o.step()
            om.step()
        st = run_chunk(lm, st, 250)
        disp, stress, eq, flag = _deck_order(lm, st, n2o, e2o)
        assert (o.element_flag == om.element_flag).all(), probe
        assert (om.element_flag == flag).all(), probe
        assert _rel(o.disp, om.disp) < 1e-9, probe
        assert _rel(o.integ_stress, om.integ_stress) < 1e-9, probe
        assert _rel(om.disp.reshape(-1, 3).T, disp) < 1e-9, probe
        assert _rel(om.integ_stress, stress) < 1e-9, probe
    assert om.element_flag.sum() < om.nElement     # erosion exercised


@pytest.mark.heavy
def test_v001_depth_clamp_divergence_documented():
    """The faithful v0.0.1 Matlab oracle (depth-rate clamp ACTIVE) must
    diverge from the v0.0.2 Julia oracle on a contact deck — the REAL
    version difference, asserted so it stays documented rather than
    silently papered over.  The divergence is bounded (~1% by step 250),
    confirming it is the clamp and not a transliteration bug."""
    m = read_inp_file(ref_deck("bullet-impact.inp"))
    o = Oracle(m)
    om = OracleM(m)                      # faithful: clamp active
    for _ in range(250):
        o.step()
        om.step()
    d = _rel(o.disp, om.disp)
    assert 1e-6 < d < 0.05, d            # diverged, but boundedly
