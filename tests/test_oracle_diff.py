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


def _cp_deck_lines(gap=0.018, v0=5.0e4, d_time=2e-8):
    """Minimal two-instance `*Contact Pair` deck, generated as real .inp
    text so the CP path is exercised END TO END: assembly `*Elset ...
    internal, instance=`, `*Surface, type=ELEMENT` (readInpFile_j.jl:517-563)
    and `*Contact Pair, ... cpset=` (readInpFile_j.jl:1063-1102) all go
    through the parser.  A 2x2x1 striker falls onto a 4x4x1 plate; the
    plate's CP surface is restricted to its CENTRAL 2x2 elements, so the
    lowered triangle set differs from the all-exterior auto pair (a real
    filter, not a relabeling)."""
    from hakai_tpu.pre.synthetic import _grid, steel

    ct, et = _grid(4, 4, 1, 2.0, 2.0, 0.25)
    cs, es = _grid(2, 2, 1, 1.0, 1.0, 0.25,
                   origin=(0.43, 0.48, 0.25 + gap))
    mt = steel(plastic=True)
    L = ["*Heading", "** CP-pair oracle fixture"]

    def emit_part(name, coord, elem, elset):
        L.append(f"*Part, name={name}")
        L.append("*Node")
        for i in range(coord.shape[1]):
            L.append(f" {i + 1}, " + ", ".join(
                repr(float(coord[a, i])) for a in range(3)))
        L.append("*Element, type=C3D8")
        for e in range(elem.shape[1]):
            L.append(" " + ", ".join(str(v) for v in [e + 1] + list(elem[:, e])))
        L.append(f"*Elset, elset={elset}, generate")
        L.append(f" 1, {elem.shape[1]}, 1")
        L.append(f"*Solid Section, elset={elset}, material=steel")
        L.append("*End Part")

    emit_part("target", ct, et, "all-target")
    emit_part("striker", cs, es, "all-striker")
    L += ["*Assembly, name=Assembly",
          "*Instance, name=target-1, part=target", "*End Instance",
          "*Instance, name=striker-1, part=striker", "*End Instance"]
    bottom = np.nonzero(ct[2] == 0.0)[0] + 1
    L.append("*Nset, nset=Set-bottom, instance=target-1")
    for i in range(0, len(bottom), 8):
        L.append(" " + ", ".join(str(v) for v in bottom[i:i + 8]))
    L += ["*Nset, nset=Set-striker, instance=striker-1, generate",
          f" 1, {cs.shape[1]}, 1",
          # plate side: central 2x2 elements only (_grid order: id = i*4+j+1)
          "*Elset, elset=_CPS-T_S6, internal, instance=target-1",
          " 6, 7, 10, 11",
          "*Surface, type=ELEMENT, name=CPS-T",
          "_CPS-T_S6, S6",
          "*Elset, elset=_CPS-S_S1, internal, instance=striker-1, generate",
          f" 1, {es.shape[1]}, 1",
          "*Surface, type=ELEMENT, name=CPS-S",
          "_CPS-S_S1, S1",
          "*End Assembly",
          "*Material, name=steel",
          "*Density",
          f" {mt.density!r},",
          "*Elastic",
          f" {mt.young!r}, {mt.poisson!r}",
          "*Plastic"]
    for row in mt.plastic:
        L.append(f" {float(row[0])!r}, {float(row[1])!r}")
    # the parser terminates *Boundary / *Initial Conditions blocks on "**"
    # comment lines only (the reference's own quirk, readInpFile_j.jl:843-957
    # — real Abaqus decks always separate sections with them)
    L += ["*Dynamic, Explicit",
          f"{d_time!r}, 8e-06",
          "**",
          "*Boundary",
          "Set-bottom, ENCASTRE",
          "**",
          "*Initial Conditions, type=VELOCITY",
          f"Set-striker, 3, {-v0!r}",
          "**",
          "*Contact Pair, interaction=IntProp-1, "
          "mechanical constraint=KINEMATIC, cpset=CPS-1",
          "CPS-S, CPS-T"]
    return L


def test_cp_pair_matches_oracle():
    """CP-based local contact (`*Contact Pair cpset=`, the Charpy deck's
    mode, HAKAI_j.jl:243-402 with model.cps non-empty): surface-restricted
    triangle sets, both directional pair entries, value-diffed against the
    oracle with active contact forces."""
    from hakai_tpu.io.inp import parse_inp_lines

    m = parse_inp_lines(_cp_deck_lines())
    assert len(m.cps) == 1 and m.contact_flag == 1
    o = Oracle(m)
    lm = lower(m)
    # two directional entries of one CP; plate side filtered to the central
    # 2x2 patch (10 surface triangles x 2 incl. twins < the full exterior)
    assert len(lm.pairs) == 2 and not any(p.is_self for p in lm.pairs)
    n_tri = [int(np.asarray(p.tri_init).sum()) for p in lm.pairs]
    full_exterior_tris = 2 * (2 * 16 + 4 * 4)   # 4x4x1 block, all faces
    assert max(n_tri) < full_exterior_tris
    st = init_state(lm)
    n2o, e2o = _perms(lm)
    for probe in range(8):
        for _ in range(50):
            o.step()
        st = run_chunk(lm, st, 50)
        disp, stress, eq, ys, flag = _deck_order(lm, st, n2o, e2o)
        assert _rel(o.disp.reshape(-1, 3).T, disp) < 1e-9, probe
        assert _rel(o.integ_stress, stress) < 1e-9, probe
        assert _rel(o.eq_ps, eq) < 1e-9, probe
    # contact must actually have fired: the plate is loaded by nothing else
    plate_free = np.asarray(m.coordmat[2]) == 0.25
    assert float(np.abs(disp[:, plate_free]).max()) > 1e-6


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
