"""Parser tests against facts of the shipped reference decks."""
import numpy as np
import pytest

from hakai_tpu.io.inp import read_inp_file
from conftest import ref_deck


def test_tensile5e_basic():
    m = read_inp_file(ref_deck("Tensile5e.inp"))
    assert m.n_node == 24
    assert m.n_element == 5
    assert m.coordmat.shape == (3, 24)
    assert m.elementmat.shape == (8, 5)
    # first node / element rows of the deck
    np.testing.assert_allclose(m.coordmat[:, 0], [-5.0, -25.0, 5.0])
    assert list(m.elementmat[:, 0]) == [13, 14, 20, 19, 1, 2, 8, 7]
    assert m.d_time == 5.0e-07
    assert m.end_time == 0.01
    assert m.mass_scaling == 1.0
    assert m.contact_flag == 0


def test_tensile5e_materials():
    m = read_inp_file(ref_deck("Tensile5e.inp"))
    names = [mt.name for mt in m.materials]
    assert names == ["steel_Elastic", "steel_Elastoplast", "steel_Ductile"]
    duct = m.materials[2]
    assert duct.density == 7.8e-09
    assert duct.young == 210000.0
    assert duct.poisson == 0.3
    assert duct.plastic.shape == (8, 2)
    assert duct.plastic[0, 0] == 755.0
    # Hd slopes (readInpFile_j.jl:763-768)
    np.testing.assert_allclose(duct.Hd[0], (809.0 - 755.0) / 0.01)
    assert duct.ductile.shape == (2, 3)
    assert duct.fracture_flag == 1
    # every element uses steel_Ductile (id 3, 1-based)
    assert list(m.element_material) == [3] * 5
    # elastic material has no plastic table
    assert m.materials[0].plastic.shape[0] == 0


def test_tensile5e_bcs_and_amplitude():
    m = read_inp_file(ref_deck("Tensile5e.inp"))
    assert len(m.amplitudes) == 1
    np.testing.assert_allclose(m.amplitudes[0].time, [0.0, 0.01])
    np.testing.assert_allclose(m.amplitudes[0].value, [0.0, 1.0])
    # BC-1: ENCASTRE on Set-2 (nodes 1,7,13,19)
    enc = m.bcs[0]
    assert enc.amp_name == ""
    dofs = enc.dof[0]
    expect = np.concatenate([np.array([1, 7, 13, 19]) * 3 - 2,
                             np.array([1, 7, 13, 19]) * 3 - 1,
                             np.array([1, 7, 13, 19]) * 3])
    np.testing.assert_array_equal(np.sort(dofs), np.sort(expect))
    # BC-2: directions 1..6, only 1-3 kept; dir 2 value 10.0
    disp_bc = m.bcs[1]
    assert disp_bc.amp_name == "Amp-1"
    assert disp_bc.value == [0.0, 10.0, 0.0]


def test_part_nset_generate_range():
    m = read_inp_file(ref_deck("Tensile5e.inp"))
    ns = {s.name: s for s in m.nsets}
    np.testing.assert_array_equal(ns["Set-3"].nodes, [6, 12, 18, 24])


def test_instance_translate():
    m = read_inp_file(ref_deck("bullet-impact.inp"))
    assert m.n_node == 610
    assert m.n_element == 288
    assert m.contact_flag == 1
    assert len(m.instances) == 2
    # bullet-1 carries translate lines, plate-1 none
    assert len(m.instances[0].translate) == 2
    assert m.instances[1].node_offset == 96
    # IC velocity 500 in -z on the bullet
    assert m.ics[0].type == "VELOCITY"
    assert m.ics[0].value == [500.0]


def test_contact_pairs_charpy():
    m = read_inp_file(ref_deck("Charpy-test-v0.0.1.inp"))
    assert len(m.cps) == 3
    cp = m.cps[0]
    assert cp.instance_id_1 == 2 and cp.instance_id_2 == 1
    assert len(cp.elements_1) == 116 and len(cp.elements_2) == 24


def test_self_contact_flag():
    m = read_inp_file(ref_deck("crash-tube-80-350-solid.inp"))
    assert m.contact_flag == 2


def test_mass_scaling_car_deck():
    m = read_inp_file(ref_deck("car-crash-N2k.inp"))
    assert m.mass_scaling == 100.0
    assert m.contact_flag == 1


def test_rotation_instance():
    # Charpy deck's PLATE instances use translate+rotate pairs
    m = read_inp_file(ref_deck("Charpy-test-v0.0.1.inp"))
    # all coordinates finite and instances concatenated
    assert np.isfinite(m.coordmat).all()
    assert m.coordmat.shape == (3, m.n_node)
