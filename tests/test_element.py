"""Element kernel unit tests: shape functions, patch tests, radial return."""
import jax.numpy as jnp
import numpy as np
import pytest

from hakai_tpu.config import SolverConfig
from hakai_tpu.core.lowering import lower
from hakai_tpu.core.state import init_state
from hakai_tpu.io.model import Model, Part, Instance, Material
from hakai_tpu.ops.shape import pusai_hexa
from hakai_tpu.ops.element import element_update, assemble_internal_force, triax_stress


def unit_cube_model(young=200.0, poisson=0.3, plastic=None, density=1.0,
                    nx=1, ny=1, nz=1, lx=1.0, ly=1.0, lz=1.0):
    """Structured hex mesh model without BCs."""
    xs = np.linspace(0, lx, nx + 1)
    ys = np.linspace(0, ly, ny + 1)
    zs = np.linspace(0, lz, nz + 1)
    X, Y, Z = np.meshgrid(xs, ys, zs, indexing="ij")
    coord = np.stack([X.ravel(), Y.ravel(), Z.ravel()])  # (3, n)
    def nid(i, j, k):
        return (i * (ny + 1) + j) * (nz + 1) + k + 1
    elems = []
    for i in range(nx):
        for j in range(ny):
            for k in range(nz):
                elems.append([nid(i, j, k), nid(i+1, j, k), nid(i+1, j+1, k),
                              nid(i, j+1, k), nid(i, j, k+1), nid(i+1, j, k+1),
                              nid(i+1, j+1, k+1), nid(i, j+1, k+1)])
    elem = np.asarray(elems).T
    mt = Material(name="m", density=density, young=young, poisson=poisson)
    if plastic is not None:
        mt.plastic = np.asarray(plastic, float)
        p = mt.plastic
        mt.Hd = (p[1:, 0] - p[:-1, 0]) / (p[1:, 1] - p[:-1, 1])
    part = Part(name="p", n_node=coord.shape[1], coordmat=coord,
                n_element=elem.shape[1], elementmat=elem,
                material_name="m", material_id=1)
    inst = Instance(name="p-1", part_name="p", part_id=1, material_id=1,
                    n_node=coord.shape[1], n_element=elem.shape[1])
    m = Model(parts=[part], instances=[inst], materials=[mt],
              n_node=coord.shape[1], coordmat=coord,
              n_element=elem.shape[1], elementmat=elem,
              element_material=np.ones(elem.shape[1], np.int64),
              element_instance=np.ones(elem.shape[1], np.int64),
              d_time=1e-3, end_time=1.0)
    return m


def test_pusai_partition_of_unity():
    P = pusai_hexa(8)
    # gradients of sum of shape functions vanish
    np.testing.assert_allclose(P.sum(axis=2), 0.0, atol=1e-15)
    # linear completeness: sum_i dN_i/dxi * xi_i = identity
    from hakai_tpu.ops.shape import _DELTA
    J = np.einsum("kai,ib->kab", P, _DELTA)
    for k in range(8):
        np.testing.assert_allclose(J[k], np.eye(3), atol=1e-15)


def test_element_volume_and_mass():
    m = unit_cube_model(density=7.8, lx=2.0, ly=3.0, lz=4.0)
    lm = lower(m)
    # total mass = rho * V, equally lumped
    total = float(np.asarray(lm.diag_M)[np.asarray(lm.node_exists)].sum())
    np.testing.assert_allclose(total, 7.8 * 24.0, rtol=1e-12)


def test_uniaxial_elastic_stress():
    """Single element, uniform z-stretch: sigma matches D @ eps exactly."""
    m = unit_cube_model(young=100.0, poisson=0.25)
    lm = lower(m)
    st = init_state(lm)
    eps = 1e-3
    d_disp = jnp.zeros((3, lm.N)).at[2].set(eps * lm.coord[2])
    position = lm.coord + d_disp
    res = element_update(lm, position, d_disp, st.stress, st.strain,
                         st.eq_ps, st.yield_s, st.element_flag)
    E, nu = 100.0, 0.25
    c = E / (1 + nu) / (1 - 2 * nu)
    # gradients are taken at the deformed configuration (updated Lagrangian,
    # cal_stress_hexa uses the current position, HAKAI_j.jl:1147-1200)
    eps = eps / (1 + eps)
    sig_z = c * (1 - nu) * eps
    sig_xy = c * nu * eps
    s = np.asarray(res.stress[:, :, 0])
    np.testing.assert_allclose(s[2], sig_z, rtol=1e-9)
    np.testing.assert_allclose(s[0], sig_xy, rtol=1e-9)
    np.testing.assert_allclose(s[1], sig_xy, rtol=1e-9)
    np.testing.assert_allclose(s[3:], 0.0, atol=1e-12)
    # strain accumulated (state carries the GP-mean; uniform stretch makes
    # every GP equal so the mean equals the per-GP value)
    np.testing.assert_allclose(np.asarray(res.strain[2, 0]), eps, rtol=1e-9)


def test_rigid_translation_no_stress():
    m = unit_cube_model()
    lm = lower(m)
    st = init_state(lm)
    d_disp = jnp.ones((3, lm.N)) * 0.37
    res = element_update(lm, lm.coord + d_disp, d_disp, st.stress, st.strain,
                         st.eq_ps, st.yield_s, st.element_flag)
    np.testing.assert_allclose(np.asarray(res.stress), 0.0, atol=1e-10)
    np.testing.assert_allclose(np.asarray(res.Qe), 0.0, atol=1e-10)


def test_internal_force_equilibrium():
    """Assembled internal force sums to zero (self-equilibrated)."""
    m = unit_cube_model(nx=2, ny=2, nz=2)
    lm = lower(m)
    st = init_state(lm)
    rng = np.random.default_rng(0)
    d = jnp.asarray(rng.normal(0, 1e-4, (3, lm.N)))
    res = element_update(lm, lm.coord + d, d, st.stress, st.strain,
                         st.eq_ps, st.yield_s, st.element_flag)
    Q = assemble_internal_force(lm, res.Qe)
    np.testing.assert_allclose(np.asarray(Q).sum(axis=1), 0.0, atol=1e-12)


def test_radial_return_uniaxial():
    """1-element tension past yield: follows the hardening table.

    Analytic: with the B-bar formulation a prescribed uniform strain gives a
    trial stress; if vm > y the update is d_ep=(vm-y)/(3G+H), y+=H*d_ep
    (HAKAI_j.jl:1254-1285).
    """
    table = [[10.0, 0.0], [20.0, 1.0]]  # yield 10, H = 10
    m = unit_cube_model(young=1000.0, poisson=0.0, plastic=table)
    lm = lower(m)
    st = init_state(lm)
    eps = 0.05  # big single step, elastic trial vm = E*eps = 50 > 10
    d_disp = jnp.zeros((3, lm.N)).at[2].set(eps * lm.coord[2])
    res = element_update(lm, lm.coord + d_disp, d_disp, st.stress, st.strain,
                         st.eq_ps, st.yield_s, st.element_flag)
    E, G, H, y0 = 1000.0, 500.0, 10.0, 10.0
    vm_trial = E * eps / (1 + eps)  # nu=0 uniaxial, deformed-config gradient
    d_ep = (vm_trial - y0) / (3 * G + H)
    y_new = y0 + H * d_ep
    np.testing.assert_allclose(np.asarray(res.eq_ps[:, 0]), d_ep, rtol=1e-12)
    np.testing.assert_allclose(np.asarray(res.yield_s[:, 0]), y_new, rtol=1e-12)
    # returned stress: dev scaled to the new yield surface
    s = np.asarray(res.stress[:, 0, 0])
    mean = vm_trial / 3
    np.testing.assert_allclose(s[2], mean + (2 / 3) * vm_trial * (y_new / vm_trial),
                               rtol=1e-12)


def test_hardening_segment_lookup():
    """eq_ps selects the right H segment (first j with eq<=table, minus 1)."""
    table = [[10.0, 0.0], [20.0, 0.1], [22.0, 0.3]]
    m = unit_cube_model(young=1000.0, poisson=0.0, plastic=table)
    lm = lower(m)
    st = init_state(lm)
    # preload eq_ps into segment 2 (H = (22-20)/0.2 = 10)
    eq = jnp.full((8, lm.E), 0.2)
    y = jnp.full((8, lm.E), 20.0)
    eps = 0.05
    d_disp = jnp.zeros((3, lm.N)).at[2].set(eps * lm.coord[2])
    res = element_update(lm, lm.coord + d_disp, d_disp, st.stress, st.strain,
                         eq, y, st.element_flag)
    H = 10.0
    d_ep = (1000 * eps / (1 + eps) - 20.0) / (3 * 500.0 + H)
    np.testing.assert_allclose(np.asarray(res.eq_ps[:, 0]), 0.2 + d_ep, rtol=1e-12)


def test_triax_matches_eig_formulation():
    rng = np.random.default_rng(1)
    s6 = rng.normal(size=(6, 8, 4))
    tx = np.asarray(triax_stress(jnp.asarray(s6)))
    for k in range(8):
        for e in range(4):
            sx, sy, sz, txy, tyz, txz = s6[:, k, e]
            T = np.array([[sx, txy, txz], [txy, sy, tyz], [txz, tyz, sz]])
            p = np.linalg.eigvalsh(T)
            oeq = np.sqrt(0.5 * ((p[0]-p[1])**2 + (p[1]-p[2])**2 + (p[2]-p[0])**2))
            expect = 0.0 if oeq < 1e-10 else p.sum() / 3 / oeq
            np.testing.assert_allclose(tx[k, e], expect, rtol=1e-10)


def test_dead_element_frozen():
    m = unit_cube_model(nx=2)
    lm = lower(m)
    st = init_state(lm)
    flag = jnp.asarray(np.array([True, False] + [False] * (lm.E - 2)))
    d = jnp.ones((3, lm.N)) * 1e-3
    stress0 = jnp.full((6, 8, lm.E), 5.0)
    res = element_update(lm, lm.coord + d, d, stress0, st.strain,
                         st.eq_ps, st.yield_s, flag)
    # dead element keeps its stress, contributes no force
    np.testing.assert_allclose(np.asarray(res.stress[:, :, 1]), 5.0)
    np.testing.assert_allclose(np.asarray(res.Qe[:, :, 1]), 0.0)


@pytest.mark.parametrize("variant",
                         ["pallas", "pallas_mxu", "pallas_mxu_kin"])
def test_packed_pallas_kernel_matches_xla_math(variant):
    """The packed Pallas element kernels (interpret mode on CPU) reproduce
    the fused-XLA element math on a plastic mesh with dead + padding lanes.
    The MXU variant reassociates the constant contractions as matmuls, so
    agreement is to f32 roundoff, not bitwise."""
    import jax

    from hakai_tpu.ops import element as el
    from hakai_tpu.ops.element_pallas import (element_core_packed,
                                              element_core_packed_mxu)

    m = unit_cube_model(nx=4, ny=4, nz=16, young=1000.0, poisson=0.3,
                        plastic=[[20.0, 0.0], [40.0, 0.5]])
    lm = lower(m, SolverConfig(dtype="float32", elem_pad=1024,
                               element_kernel=variant))
    E = lm.E
    rng = np.random.default_rng(7)
    f32 = jnp.float32
    disp = jnp.asarray(rng.normal(scale=1e-2, size=(3, lm.N)), f32)
    disp_prev = disp + jnp.asarray(
        rng.normal(scale=2e-3, size=(3, lm.N)), f32)
    disp_e = disp[:, lm.elem]
    disp_e_prev = disp_prev[:, lm.elem]
    coord_e = (lm.coord[:, lm.elem]
               - lm.coord[:, lm.elem[0]][:, None, :]).astype(f32)
    pos24 = (coord_e + (disp_e - disp_e[:, 0:1, :])).reshape(24, E)
    du24 = (disp_e - disp_e_prev).reshape(24, E)

    stress = jnp.asarray(rng.normal(scale=5.0, size=(6, 8, E)), f32)
    strain = jnp.asarray(rng.normal(scale=1e-3, size=(6, E)), f32)
    eq_ps = jnp.asarray(rng.uniform(0.0, 0.3, size=(8, E)), f32)
    yield_s = jnp.asarray(20.0 + rng.uniform(0.0, 5.0, size=(8, E)), f32)
    flag = np.ones(E, bool)
    flag[3] = False                       # one dead element
    flag[m.n_element:] = False            # padding lanes
    flag = jnp.asarray(flag)

    # reference: the fused-XLA math on the same (pre-centered) inputs
    qe_r, s_r, e_r, eq_r, y_r, _ = el._element_math(
        lm.pl_tables, lm.mat_id, lm.G_e, lm.lam_e, lm.has_plastic_e,
        jnp.asarray(el._PUS, f32), pos24.reshape(3, 8, E),
        du24.reshape(3, 8, E), [stress[c] for c in range(6)],
        [strain[c] for c in range(6)], eq_ps, yield_s, flag,
        pre_centered=True)
    qe_r = el._stack_qe(qe_r).reshape(24, E)

    from hakai_tpu.solver.explicit import pack_gauss_state
    from hakai_tpu.core.state import init_state
    st = init_state(lm).replace(stress=stress, strain=strain,
                                eq_ps=eq_ps, yield_s=yield_s)
    P = pack_gauss_state(st, E)
    if variant == "pallas_mxu_kin":
        P_new, qe = element_core_packed_mxu(
            lm, coord_e.reshape(24, E), disp_e.reshape(24, E), P, flag,
            dprev24=disp_e_prev.reshape(24, E))
    else:
        fn = (element_core_packed_mxu if variant == "pallas_mxu"
              else element_core_packed)
        P_new, qe = fn(lm, pos24, du24, P, flag)

    tol = dict(rtol=3e-5, atol=3e-4)
    np.testing.assert_allclose(np.asarray(qe), np.asarray(qe_r), **tol)
    for c in range(6):
        np.testing.assert_allclose(np.asarray(P_new[8*c:8*(c+1)]),
                                   np.asarray(s_r[c]), **tol)
        np.testing.assert_allclose(np.asarray(P_new[48+c]),
                                   np.asarray(e_r[c]), **tol)
    np.testing.assert_allclose(np.asarray(P_new[54:56]), 0.0, atol=0.0)
    np.testing.assert_allclose(np.asarray(P_new[56:64]),
                               np.asarray(eq_r), **tol)
    np.testing.assert_allclose(np.asarray(P_new[64:72]),
                               np.asarray(y_r), **tol)

    if variant != "pallas":
        # in-kernel triaxiality (fracture decks) matches the post-kernel
        # triax_components of the returned final stress
        if variant == "pallas_mxu_kin":
            _, _, tri = element_core_packed_mxu(
                lm, coord_e.reshape(24, E), disp_e.reshape(24, E), P, flag,
                dprev24=disp_e_prev.reshape(24, E), want_triax=True)
        else:
            _, _, tri = element_core_packed_mxu(lm, pos24, du24, P, flag,
                                                want_triax=True)
        tri_ref = el.triax_components([s_r[c] for c in range(6)])
        np.testing.assert_allclose(np.asarray(tri), np.asarray(tri_ref),
                                   rtol=3e-4, atol=1e-5)


def test_packed_fast_chunk_fracture_matches_xla(monkeypatch):
    """run_chunk on a ductile (fracture-enabled) deck routes the packed MXU
    kernel's in-kernel triax + erosion branch; results must match the fused
    XLA path (MXU reassociation => f32-roundoff tolerance)."""
    monkeypatch.setenv("HAKAI_PALLAS_FORCE", "1")
    import jax.numpy as jnp

    from hakai_tpu.core.state import init_state
    from hakai_tpu.io.model import IC
    from hakai_tpu.pre.synthetic import bar_model
    from hakai_tpu.solver.explicit import run_chunk

    def deck():
        m = bar_model(nx=4, ny=4, nz=32, d_time=5e-8, end_time=1.0,
                      ductile=True)
        # low fracture-strain table so the 120-step window actually erodes
        m.materials[0].ductile = np.array(
            [[1e-3, 0.0, 30.0], [5e-4, 0.3, 30.0]])
        dofs = np.arange(1, m.n_node * 3 + 1, 3) + 2
        m.ics.append(IC(type="VELOCITY", dof=[dofs], value=[5.0e4]))
        return m

    lm_x = lower(deck(), SolverConfig(dtype="float32", elem_pad=1024,
                                      element_kernel="xla"))
    assert lm_x.fracture_enabled
    ref = run_chunk(lm_x, init_state(lm_x), 120)
    n_alive = int(np.asarray(ref.element_flag).sum())
    assert n_alive < int(np.asarray(lm_x.elem_exists).sum())  # erosion fired

    lm_p = lower(deck(), SolverConfig(dtype="float32", elem_pad=1024,
                                      element_kernel="pallas_mxu"))
    got = run_chunk(lm_p, init_state(lm_p), 120)
    np.testing.assert_array_equal(np.asarray(got.element_flag),
                                  np.asarray(ref.element_flag))
    # abs tol covers near-zero components (disp is O(0.3) here); the MXU
    # reassociation noise is ~1e-6 absolute after 120 plastic/erosion steps
    np.testing.assert_allclose(np.asarray(got.disp), np.asarray(ref.disp),
                               rtol=3e-5, atol=5e-6)
    # triax = mean/vm amplifies f32 noise where vm ~ 0 (observed: 5/8192
    # points off by <=0.007 on a +-3.8 range after 120 steps)
    np.testing.assert_allclose(np.asarray(got.triax), np.asarray(ref.triax),
                               rtol=3e-4, atol=2e-2)


def test_packed_fast_chunk_mixed_precision_matches_xla(monkeypatch):
    """Mixed mode (f64 nodal carry + f32 element math) through the packed
    MXU kernel: kinematic differences happen in f64 BEFORE the f32 cast
    (out-of-kernel), so the packed path must track the fused-XLA mixed path
    to f32 roundoff."""
    monkeypatch.setenv("HAKAI_PALLAS_FORCE", "1")
    from hakai_tpu.pre.synthetic import bar_model
    from hakai_tpu.core.state import init_state
    from hakai_tpu.solver.explicit import run_chunk

    def deck():
        return bar_model(nx=4, ny=4, nz=64, d_time=1e-8, end_time=1.0)

    lm_x = lower(deck(), SolverConfig(dtype="mixed", elem_pad=1024,
                                      element_kernel="xla"))
    ref = run_chunk(lm_x, init_state(lm_x), 60)
    lm_p = lower(deck(), SolverConfig(dtype="mixed", elem_pad=1024,
                                      element_kernel="pallas_mxu"))
    got = run_chunk(lm_p, init_state(lm_p), 60)
    np.testing.assert_allclose(np.asarray(got.disp), np.asarray(ref.disp),
                               rtol=1e-6, atol=1e-12)
    np.testing.assert_allclose(np.asarray(got.stress),
                               np.asarray(ref.stress), rtol=3e-5, atol=3e-4)


def test_auto_kernel_resolves_to_mxu(monkeypatch):
    """element_kernel="auto" engages the MXU packed kernel exactly when the
    hardware conditions hold (TPU backend — or the test force knob — f32
    element math, tile-divisible E), and is bitwise-identical to an
    explicit element_kernel="pallas_mxu" run.  On a non-TPU backend
    without the knob, auto stays on the fused XLA path."""
    from hakai_tpu.ops.element import pallas_core_ok
    from hakai_tpu.pre.synthetic import bar_model
    from hakai_tpu.solver.explicit import run_chunk

    def deck():
        return bar_model(nx=4, ny=4, nz=64, d_time=1e-8, end_time=1.0)

    monkeypatch.delenv("HAKAI_PALLAS_FORCE", raising=False)
    lm = lower(deck(), SolverConfig(dtype="float32", elem_pad=1024))
    assert not pallas_core_ok(lm, lm.E, lm.edtype)   # CPU: auto = XLA

    monkeypatch.setenv("HAKAI_PALLAS_FORCE", "1")
    assert pallas_core_ok(lm, lm.E, lm.edtype)       # "TPU": auto = MXU
    # f64 element math never engages regardless of backend
    lm64 = lower(deck(), SolverConfig(dtype="float64", elem_pad=1024))
    assert not pallas_core_ok(lm64, lm64.E, lm64.edtype)

    got = run_chunk(lm, init_state(lm), 40)
    lm_m = lower(deck(), SolverConfig(dtype="float32", elem_pad=1024,
                                      element_kernel="pallas_mxu"))
    ref = run_chunk(lm_m, init_state(lm_m), 40)
    np.testing.assert_array_equal(np.asarray(got.disp), np.asarray(ref.disp))
    np.testing.assert_array_equal(np.asarray(got.stress),
                                  np.asarray(ref.stress))
