"""Multi-device domain-decomposition tests on a virtual 8-device CPU mesh."""
import dataclasses

import jax
import numpy as np
import pytest

from hakai_tpu.config import SolverConfig
from hakai_tpu.core.lowering import lower
from hakai_tpu.core.state import init_state
from hakai_tpu.io.model import IC
from hakai_tpu.parallel.sharding import make_mesh, make_sharded_step, shard_arrays
from hakai_tpu.solver.explicit import run_chunk
from test_element import unit_cube_model
from test_contact import two_body_model


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_matches_single_device():
    m = unit_cube_model(nx=4, ny=2, nz=2, plastic=[[0.5, 0.0], [1.0, 1.0]])
    dofs = np.arange(1, m.n_node * 3 + 1, 3) + 2
    m.ics.append(IC(type="VELOCITY", dof=[dofs], value=[3.0]))
    cfg = SolverConfig(elem_pad=8)
    lm = lower(m, cfg)
    ref = run_chunk(lm, init_state(lm), 50)

    mesh = make_mesh(8)
    ms, ss = shard_arrays(lm, init_state(lm), mesh)
    stepn = make_sharded_step(ms, mesh, n_steps=50)
    out = stepn(ss)
    np.testing.assert_allclose(np.asarray(out.disp), np.asarray(ref.disp),
                               rtol=1e-12, atol=1e-15)
    np.testing.assert_allclose(np.asarray(out.stress), np.asarray(ref.stress),
                               rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(np.asarray(out.eq_ps), np.asarray(ref.eq_ps),
                               rtol=1e-10, atol=1e-15)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_contact_impact():
    """Full step with contact + erosion under shard_map stays consistent."""
    m = two_body_model(gap=-0.01)
    cfg = SolverConfig(elem_pad=8)
    lm = lower(m, cfg)
    ref = run_chunk(lm, init_state(lm), 20)

    mesh = make_mesh(8)
    ms, ss = shard_arrays(lm, init_state(lm), mesh)
    stepn = make_sharded_step(ms, mesh, n_steps=20)
    out = stepn(ss)
    np.testing.assert_allclose(np.asarray(out.disp), np.asarray(ref.disp),
                               rtol=1e-10, atol=1e-14)
    np.testing.assert_allclose(np.asarray(out.contact_force),
                               np.asarray(ref.contact_force),
                               rtol=1e-10, atol=1e-14)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_assembly_bitwise():
    """The disjoint-lane psum adds no reduction-order error: the sharded
    step matches the single-device generic step to XLA fusion roundoff
    (~1 ulp — XLA contracts mul+add shape-dependently, so exact bit
    equality across shard shapes is not achievable; the VTK frames, at
    ASCII precision, are byte-identical — see test_run_devices_vtk_identical)."""
    from hakai_tpu.pre.synthetic import bar_model

    m = bar_model(nx=16, ny=16, nz=16, d_time=1e-8, end_time=1.0)
    cfg = SolverConfig(elem_pad=8)
    lm = lower(m, cfg)
    assert lm.plan_pos is not None          # plans built (>=2048 elements)

    ref = run_chunk(lm, init_state(lm), 30)   # single-device fast chunk

    mesh = make_mesh(8)
    ms, ss = shard_arrays(lm, init_state(lm), mesh)
    assert ms.plan_pos.starts.ndim == 2       # stacked per-shard plans
    out = make_sharded_step(ms, mesh, n_steps=30)(ss)
    np.testing.assert_allclose(np.asarray(out.disp), np.asarray(ref.disp),
                               rtol=1e-13, atol=1e-20)
    np.testing.assert_allclose(np.asarray(out.Q), np.asarray(ref.Q),
                               rtol=1e-13, atol=1e-16)
    np.testing.assert_allclose(np.asarray(out.stress),
                               np.asarray(ref.stress),
                               rtol=1e-13, atol=1e-16)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_run_devices_vtk_identical(tmp_path):
    """run(devices=8) is a product path: emits the same frames as a
    single-device run on a contactless deck (multi-chip as a usable path,
    with VTK output).  Structure (headers, connectivity) must be
    byte-identical; float fields match to 1e-6 relative — exact byte
    equality across shard shapes is not achievable because XLA contracts
    mul+add into FMAs shape-dependently (verified: single-step stress
    differs by 1 ulp on active elements even with identical formulations),
    and ASCII printing can flip the last digit."""
    from hakai_tpu.io.inp import read_inp_file
    from hakai_tpu.solver.explicit import run
    from conftest import ref_deck

    # needs a deck big enough to build gather plans (>=2048 elements/nodes):
    # the order-matched lane assembly is what makes frames byte-identical
    m = read_inp_file(ref_deck("Tensile-test-glmsh.inp"))
    m.end_time = m.end_time / 100.0

    out1 = tmp_path / "single"
    out8 = tmp_path / "sharded"
    cfg1 = SolverConfig(out_dir=str(out1), elem_pad=8, output_num=2)
    lm1 = lower(m, cfg1)
    run(lm1, verbose=False)
    cfg8 = SolverConfig(out_dir=str(out8), elem_pad=8, output_num=2)
    lm8 = lower(m, cfg8)
    run(lm8, verbose=False, devices=8)

    frames1 = sorted(p.name for p in out1.glob("*.vtk"))
    frames8 = sorted(p.name for p in out8.glob("*.vtk"))
    assert frames1 == frames8 and len(frames1) >= 2

    float_re = __import__("re").compile(r"-?\d+\.\d+e[+-]\d+")
    for name in frames1:
        t1 = (out1 / name).read_text()
        t8 = (out8 / name).read_text()
        l1, l8 = t1.splitlines(), t8.splitlines()
        assert len(l1) == len(l8), name
        # atol scales with the file's field magnitude: near-zero residue
        # values are pure roundoff noise
        scale = max(abs(float(x)) for x in float_re.findall(t1))
        for a, b in zip(l1, l8):
            if a == b:
                continue
            fa = float_re.findall(a)
            fb = float_re.findall(b)
            # differing lines must be float data lines, equal to 1e-6 rel
            assert fa and len(fa) == len(fb), (name, a, b)
            assert float_re.sub("F", a) == float_re.sub("F", b), (name, a, b)
            va = np.array([float(x) for x in fa])
            vb = np.array([float(x) for x in fb])
            np.testing.assert_allclose(va, vb, rtol=1e-6,
                                       atol=1e-6 * scale,
                                       err_msg=f"{name}: {a} vs {b}")


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
@pytest.mark.heavy
def test_sharded_bullet_impact_erosion():
    """Contact under decomposition: bullet-impact (contact + erosion +
    surface re-exposure) matches single-device on the 8-CPU mesh with the
    round-robin-partitioned narrow phase (ops/contact.py)."""
    from hakai_tpu.io.inp import read_inp_file
    from conftest import ref_deck

    m = read_inp_file(ref_deck("bullet-impact.inp"))
    lm = lower(m, SolverConfig(elem_pad=8))
    n_steps = 1200            # enough to erode elements and re-expose faces
    ref = run_chunk(lm, init_state(lm), n_steps)
    assert int(np.asarray(ref.element_flag).sum()) < int(
        np.asarray(lm.elem_exists).sum())   # erosion actually happened

    mesh = make_mesh(8)
    ms, ss = shard_arrays(lm, init_state(lm), mesh)
    out = make_sharded_step(ms, mesh, n_steps=n_steps)(ss)
    assert np.array_equal(np.asarray(out.element_flag),
                          np.asarray(ref.element_flag))
    np.testing.assert_allclose(np.asarray(out.disp), np.asarray(ref.disp),
                               rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(np.asarray(out.contact_force),
                               np.asarray(ref.contact_force),
                               rtol=1e-8, atol=1e-11)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
@pytest.mark.heavy
def test_sharded_mixed_precision_contact():
    """USAGE.md's flagship multi-chip example is ``--devices N --precision
    mixed``: the disp_e-carry sharded fast step + partitioned contact must
    track the single-device mixed run (f32 element math reassociates across
    shard shapes, so the contract is trajectory-level, like
    test_mixed_precision.test_mixed_tracks_f64 — not bitwise)."""
    from hakai_tpu.io.inp import read_inp_file
    from conftest import ref_deck

    m = read_inp_file(ref_deck("bullet-impact.inp"))
    lm = lower(m, SolverConfig(dtype="mixed", elem_pad=16 * 8))
    assert lm.edtype == np.float32 and lm.dtype == np.float64
    n_steps = 800
    ref = run_chunk(lm, init_state(lm), n_steps)
    assert bool(np.abs(np.asarray(ref.contact_force)).max() > 0)

    mesh = make_mesh(8)
    ms, ss = shard_arrays(lm, init_state(lm), mesh)
    out = make_sharded_step(ms, mesh, n_steps=n_steps)(ss)
    d_ref = np.asarray(ref.disp)[:, :m.n_node]
    d_out = np.asarray(out.disp)[:, :m.n_node]
    scale = np.abs(d_ref).max()
    assert np.abs(d_out - d_ref).max() < 1e-4 * scale
    # kinetic-energy trajectory agreement (the mixed-precision contract)
    M = np.asarray(lm.diag_M)
    ke_ref = 0.5 * float((M * (np.asarray(ref.velo) ** 2).sum(0)).sum())
    ke_out = 0.5 * float((M * (np.asarray(out.velo) ** 2).sum(0)).sum())
    assert abs(ke_out - ke_ref) < 1e-4 * max(ke_ref, 1.0)
    assert np.array_equal(np.asarray(out.element_flag),
                          np.asarray(ref.element_flag))
