"""Preprocessing tools: Gilgamsh refiner, ShellToSolid extruder, viewer."""
import numpy as np

from hakai_tpu.pre.gilgamsh import refine_hex, refine_quad, write_mesh_fragment
from hakai_tpu.pre.shell_to_solid import shell_to_solid
from hakai_tpu.pre.viewer import mesh_edges, write_wireframe_vtk
from test_element import unit_cube_model


def test_refine_single_hex():
    m = unit_cube_model()
    cm, em = refine_hex(m.coordmat, m.elementmat)
    assert em.shape == (8, 8)
    assert cm.shape == (3, 27)          # full 27-node template
    # volume preserved: 8 sub-hexes of 0.5^3
    from hakai_tpu.core.lowering import lower
    from hakai_tpu.io.model import replace
    part = m.parts[0]
    part.coordmat, part.elementmat = cm, em
    part.n_node, part.n_element = cm.shape[1], em.shape[1]
    m.coordmat, m.elementmat = cm, em
    m.n_node, m.n_element = cm.shape[1], em.shape[1]
    m.element_material = np.ones(8, np.int64)
    m.element_instance = np.ones(8, np.int64)
    m.instances[0].n_node = m.n_node
    m.instances[0].n_element = m.n_element
    lm = lower(m)
    total = float(np.asarray(lm.diag_M)[np.asarray(lm.node_exists)].sum())
    np.testing.assert_allclose(total, 1.0 * 1.0, rtol=1e-12)  # density 1, V 1


def test_refine_2x_shares_nodes():
    m = unit_cube_model(nx=2, ny=1, nz=1, lx=2.0)
    cm, em = refine_hex(m.coordmat, m.elementmat)
    assert em.shape == (8, 16)
    # 27*2 template nodes minus 9 welded on the shared face
    assert cm.shape[1] == 45


def test_refine_quad():
    coord = np.array([[0, 1, 1, 0], [0, 0, 1, 1], [0, 0, 0, 0]], float)
    elem = np.array([[1], [2], [3], [4]])
    cm, em = refine_quad(coord, elem)
    assert em.shape == (4, 4)
    assert cm.shape == (3, 9)


def test_shell_to_solid_flat():
    # flat unit quad, thickness 0.2 -> one hex of volume 0.2
    coord = np.array([[0, 1, 1, 0], [0, 0, 1, 1], [0, 0, 0, 0]], float)
    elem = np.array([[1], [2], [3], [4]])
    cm, em = shell_to_solid(coord, elem, 0.2)
    assert em.shape == (8, 1)
    assert cm.shape == (3, 8)
    z = np.asarray(cm[2])
    np.testing.assert_allclose(sorted(set(np.round(z, 12))), [-0.1, 0.1])


def test_mesh_fragment_roundtrip(tmp_path):
    m = unit_cube_model()
    cm, em = refine_hex(m.coordmat, m.elementmat)
    f = write_mesh_fragment(str(tmp_path / "mesh_temp.txt"), cm, em)
    lines = open(f).read().splitlines()
    assert lines[0] == "*Node"
    assert "*Element, type=C3D8R" in lines
    # parseable by the .inp front-end when wrapped in a part
    from hakai_tpu.io.inp import parse_inp_lines
    deck = (["*Part, name=refined"] + lines
            + ["*Solid Section, elset=all, material=m", "*End Part"])
    model = parse_inp_lines(deck)
    assert model.parts[0].n_node == 27
    assert model.parts[0].n_element == 8


def test_wireframe(tmp_path):
    m = unit_cube_model()
    edges = mesh_edges(m.elementmat)
    assert edges.shape == (12, 2)
    f = write_wireframe_vtk(str(tmp_path / "wf.vtk"), m.coordmat, m.elementmat)
    assert "LINES 12 36" in open(f).read()
