"""Multi-material handling: per-element constants, hardening tables, erosion
tables selected by material id."""
import numpy as np
import jax.numpy as jnp

from hakai_tpu.core.lowering import lower
from hakai_tpu.core.state import init_state
from hakai_tpu.io.model import Material
from hakai_tpu.ops.element import element_update
from hakai_tpu.ops.erosion import erode
from test_element import unit_cube_model


def two_material_bar():
    """2x1x1 bar: element 0 stiff elastic, element 1 soft plastic+ductile."""
    m = unit_cube_model(nx=2, lx=2.0, young=100.0, poisson=0.0)
    soft = Material(name="soft", density=1.0, young=10.0, poisson=0.0)
    soft.plastic = np.array([[1.0, 0.0], [2.0, 1.0]])
    soft.Hd = np.array([1.0])
    soft.ductile = np.array([[0.5, 0.0, 30.0], [0.1, 0.3, 30.0]])
    soft.fracture_flag = 1
    m.materials.append(soft)
    m.element_material = np.array([1, 2], np.int64)
    return m


def test_per_element_constants():
    m = two_material_bar()
    lm = lower(m)
    np.testing.assert_allclose(np.asarray(lm.G_e[:2]), [50.0, 5.0])
    assert not bool(lm.has_plastic_e[0])
    assert bool(lm.has_plastic_e[1])
    assert lm.fracture_enabled
    assert len(lm.pl_tables) == 2 and len(lm.pl_tables[0]) == 0
    assert lm.du_tables[1][0] == (0.5, 0.0)


def test_stress_jump_across_materials():
    """Uniform strain -> stress scales with each element's modulus."""
    m = two_material_bar()
    lm = lower(m)
    st = init_state(lm)
    eps = 1e-3
    d = jnp.zeros((3, lm.N)).at[0].set(eps * lm.coord[0])
    res = element_update(lm, lm.coord + d, d, st.stress, st.strain,
                         st.eq_ps, st.yield_s, st.element_flag)
    s = np.asarray(res.stress[0, :, :2])
    eff = eps / (1 + eps)
    np.testing.assert_allclose(s[:, 0], 100.0 * eff, rtol=1e-6)
    np.testing.assert_allclose(s[:, 1], 10.0 * eff, rtol=1e-6)


def test_erosion_only_ductile_material():
    m = two_material_bar()
    lm = lower(m)
    E = lm.E
    # both elements heavily strained at positive triaxiality
    eq = jnp.full((8, E), 2.0)
    tx = jnp.full((8, E), 0.5)
    flag = lm.elem_exists
    er = erode(lm, jnp.zeros((6, 8, E)), jnp.zeros((6, E)), eq, tx, flag)
    f = np.asarray(er.element_flag[:2])
    assert f[0]          # elastic material never erodes
    assert not f[1]      # ductile material erodes (fr = 0.1 at triax>=0.3)


def test_erosion_negative_triax_never_deletes():
    m = two_material_bar()
    lm = lower(m)
    E = lm.E
    eq = jnp.full((8, E), 2.0)
    tx = jnp.full((8, E), -0.5)
    er = erode(lm, jnp.zeros((6, 8, E)), jnp.zeros((6, E)), eq, tx,
               lm.elem_exists)
    assert bool(er.element_flag[1])   # HAKAI_j.jl:720-722
