"""Cross-implementation validation against the NumPy oracle.

The reference's whole validation method is value-diffing two independent
implementations ("-> Match with Matlab", HAKAI_j.jl:397, 864, 923).  These
tests are the equivalent: hakai_tpu (static-shape masked lowering, tensor
B̄ re-derivation, Pallas/XLA) vs tests/ref_oracle.py (straight-line
transliteration of the reference's formulation: explicit B matrices,
np.linalg inv/eigvalsh, dynamic triangle lists), stepped side by side and
compared at probes.

Tolerances are f64-roundoff scale (<= 1e-9 relative), orders of magnitude
tighter than any physical quantity of interest — agreement here means both
implementations compute the same math, not merely similar physics.
"""
import numpy as np
import pytest

from hakai_tpu.core.lowering import lower
from hakai_tpu.core.state import init_state
from hakai_tpu.io.inp import read_inp_file
from hakai_tpu.solver.explicit import run_chunk
from conftest import ref_deck
from ref_oracle import Oracle


def _rel(a, b):
    scale = max(float(np.abs(a).max()), 1e-30)
    return float(np.abs(a - b).max()) / scale


def _perms(lm):
    n2o = (np.asarray(lm.node_new2old) if lm.node_new2old is not None
           else np.arange(lm.n_node))
    e2o = (np.asarray(lm.elem_new2old) if lm.node_new2old is not None
           else np.arange(lm.n_element))
    return n2o, e2o


def _deck_order(lm, st, n2o, e2o):
    """Framework state mapped back to deck order, oracle layouts."""
    nN, nE = lm.n_node, lm.n_element
    disp = np.zeros((3, nN))
    disp[:, n2o] = np.asarray(st.disp)[:, :nN]
    stress = np.zeros((6, nE, 8))
    stress[:, e2o, :] = np.asarray(st.stress)[:, :, :nE].transpose(0, 2, 1)
    eq = np.zeros((nE, 8))
    eq[e2o] = np.asarray(st.eq_ps)[:, :nE].T
    ys = np.zeros((nE, 8))
    ys[e2o] = np.asarray(st.yield_s)[:, :nE].T
    flag = np.zeros(nE, np.int64)
    flag[e2o] = np.asarray(st.element_flag)[:nE].astype(np.int64)
    return disp, stress, eq, ys, flag


def test_tensile5e_matches_oracle_2000_steps():
    """Element + plasticity + integrator path (no contact), 2000 steps
    (through yield onset: eq_ps reaches ~0.02)."""
    m = read_inp_file(ref_deck("Tensile5e.inp"))
    o = Oracle(m)
    lm = lower(m)
    st = init_state(lm)
    n2o, e2o = _perms(lm)
    for probe in range(10):
        for _ in range(200):
            o.step()
        st = run_chunk(lm, st, 200)
        disp, stress, eq, ys, flag = _deck_order(lm, st, n2o, e2o)
        assert _rel(o.disp.reshape(-1, 3).T, disp) < 1e-9, probe
        assert _rel(o.integ_stress, stress) < 1e-9, probe
        assert _rel(o.eq_ps, eq) < 1e-9, probe
        assert _rel(o.yield_stress, ys) < 1e-9, probe
    assert o.eq_ps.max() > 0.01   # plasticity actually exercised


def test_self_contact_matches_oracle():
    """Self-contact path (the reference's hardest contact mode): a single
    instance whose upper plate is driven into its lower plate.  Exercises
    the single-instance self pair (HAKAI_j.jl:304-312), own-element node
    exclusion (:2496-2507), and the 0.6 ddiv scale — with active contact
    forces, value-diffed against the oracle's transliterated narrow phase.
    """
    from hakai_tpu.pre.synthetic import self_contact_model

    m = self_contact_model()
    o = Oracle(m)
    lm = lower(m)
    assert len(lm.pairs) == 1 and lm.pairs[0].is_self
    st = init_state(lm)
    n2o, e2o = _perms(lm)
    for probe in range(6):
        for _ in range(50):
            o.step()
        st = run_chunk(lm, st, 50)
        disp, stress, eq, ys, flag = _deck_order(lm, st, n2o, e2o)
        assert _rel(o.disp.reshape(-1, 3).T, disp) < 1e-9, probe
        assert _rel(o.integ_stress, stress) < 1e-9, probe
        assert _rel(o.eq_ps, eq) < 1e-9, probe
    # self-contact forces must actually have fired: the lower plate is
    # loaded by nothing else, so any motion of its free nodes proves it
    lower_free = np.asarray(m.coordmat[2]) == 0.2
    assert float(np.abs(disp[:, lower_free]).max()) > 1e-6


@pytest.mark.slow
def test_bullet_impact_matches_oracle_through_erosion():
    """Contact + erosion + surface re-exposure path: bullet-impact, 1250
    steps (first elements erode ~step 600; the repaired surface then feeds
    back into contact)."""
    m = read_inp_file(ref_deck("bullet-impact.inp"))
    o = Oracle(m)
    lm = lower(m)
    st = init_state(lm)
    n2o, e2o = _perms(lm)
    for probe in range(5):
        for _ in range(250):
            o.step()
        st = run_chunk(lm, st, 250)
        disp, stress, eq, ys, flag = _deck_order(lm, st, n2o, e2o)
        assert (o.element_flag == flag).all(), probe
        assert _rel(o.disp.reshape(-1, 3).T, disp) < 1e-9, probe
        assert _rel(o.integ_stress, stress) < 1e-9, probe
    assert o.element_flag.sum() < o.nElement   # erosion actually exercised
