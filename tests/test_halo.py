"""Halo-exchange node-sharded step vs single-device reference."""
import jax
import numpy as np
import pytest

from hakai_tpu.config import SolverConfig
from hakai_tpu.core.lowering import lower
from hakai_tpu.core.state import init_state
from hakai_tpu.io.model import IC
from hakai_tpu.parallel.halo import (gather_state, init_halo_state,
                                     make_halo_step, partition)
from hakai_tpu.parallel.sharding import make_mesh
from hakai_tpu.solver.explicit import run_chunk
from test_element import unit_cube_model


def _bar():
    m = unit_cube_model(nx=32, ny=2, nz=2, lx=32.0,
                        plastic=[[0.5, 0.0], [1.0, 1.0]])
    dofs = np.arange(1, m.n_node * 3 + 1, 3) + 2
    m.ics.append(IC(type="VELOCITY", dof=[dofs], value=[3.0]))
    m.d_time = 1e-3
    m.end_time = 1.0
    return m


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_halo_matches_single_device():
    m = _bar()
    cfg = SolverConfig(node_pad=8 * 8, elem_pad=8)
    lm = lower(m, cfg)
    assert lm.N % 8 == 0
    ref = run_chunk(lm, init_state(lm), 60)

    hm = partition(lm, 8)
    mesh = make_mesh(8)
    stepn = make_halo_step(hm, mesh, n_steps=60)
    out = stepn(init_halo_state(hm))
    got = gather_state(hm, out)
    np.testing.assert_allclose(np.asarray(got.disp), np.asarray(ref.disp),
                               rtol=1e-10, atol=1e-14)
    np.testing.assert_allclose(np.asarray(got.velo), np.asarray(ref.velo),
                               rtol=1e-10, atol=1e-12)
    # element fields reassemble through the shard->global permutation
    np.testing.assert_allclose(np.asarray(got.stress), np.asarray(ref.stress),
                               rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(np.asarray(got.eq_ps), np.asarray(ref.eq_ps),
                               rtol=1e-9, atol=1e-15)
    assert np.array_equal(np.asarray(got.element_flag),
                          np.asarray(ref.element_flag))


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_halo_with_fracture():
    """Erosion runs on local element shards and stays consistent."""
    m = unit_cube_model(nx=32, ny=2, nz=2, lx=32.0,
                        plastic=[[0.1, 0.0], [0.2, 1.0]])
    m.materials[0].ductile = np.array([[0.05, 0.0, 30.0], [0.05, 0.9, 30.0]])
    m.materials[0].fracture_flag = 1
    dofs = np.arange(1, m.n_node * 3 + 1, 3) + 2
    from hakai_tpu.io.model import IC
    m.ics.append(IC(type="VELOCITY", dof=[dofs], value=[8.0]))
    # clamp one end so stress develops
    from hakai_tpu.io.model import BC
    left = np.nonzero(np.asarray(m.coordmat[0]) == 0.0)[0] + 1
    enc = BC()
    enc.dof.append(np.concatenate([left * 3 - 2, left * 3 - 1, left * 3]))
    enc.value = [0.0]
    m.bcs.append(enc)
    m.d_time = 2e-3
    m.end_time = 2.0
    cfg = SolverConfig(node_pad=8 * 8, elem_pad=8)
    lm = lower(m, cfg)
    assert lm.fracture_enabled
    ref = run_chunk(lm, init_state(lm), 120)
    hm = partition(lm, 8)
    stepn = make_halo_step(hm, make_mesh(8), n_steps=120)
    out = stepn(init_halo_state(hm))
    got = gather_state(hm, out)
    np.testing.assert_allclose(np.asarray(got.disp), np.asarray(ref.disp),
                               rtol=1e-9, atol=1e-12)
    assert np.array_equal(np.asarray(got.element_flag),
                          np.asarray(ref.element_flag))
    np.testing.assert_allclose(np.asarray(got.stress), np.asarray(ref.stress),
                               rtol=1e-8, atol=1e-10)
    # some elements must actually have eroded for the test to mean anything
    assert int(np.asarray(ref.element_flag).sum()) < lm.n_element \
        or float(ref.eq_ps.max()) > 0.0


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
@pytest.mark.heavy
def test_halo_contact_matches_single_device():
    """Contact decks run on the halo path: bullet-impact (contact + erosion
    + surface re-exposure) matches single-device — the compact contact-node
    exchange + round-robin-partitioned narrow phase at work."""
    from hakai_tpu.io.inp import read_inp_file
    from conftest import ref_deck

    m = read_inp_file(ref_deck("bullet-impact.inp"))
    lm = lower(m, SolverConfig(node_pad=64, elem_pad=8, renumber="always"))
    assert lm.pairs, "bullet-impact must have contact pairs"
    n_steps = 1200            # enough to erode elements and re-expose faces
    ref = run_chunk(lm, init_state(lm), n_steps)
    assert int(np.asarray(ref.element_flag).sum()) < int(
        np.asarray(lm.elem_exists).sum())   # erosion actually happened
    assert bool(np.asarray(jax.numpy.abs(ref.contact_force).sum() > 0))

    hm = partition(lm, 8)
    stepn = make_halo_step(hm, make_mesh(8), n_steps=n_steps)
    got = gather_state(hm, stepn(init_halo_state(hm)))
    assert np.array_equal(np.asarray(got.element_flag),
                          np.asarray(ref.element_flag))
    np.testing.assert_allclose(np.asarray(got.disp), np.asarray(ref.disp),
                               rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(np.asarray(got.stress), np.asarray(ref.stress),
                               rtol=1e-7, atol=1e-9)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_halo_fast_path_matches_single_device():
    """A mesh big enough for window-local gather plans (El >= 1024) takes
    the disp_e-carry fast path; numerics must match the generic reference.
    RCM renumbering (what the CLI --halo path always applies) keeps the
    halo width small enough for the window plans."""
    from hakai_tpu.pre.synthetic import bar_model
    m = bar_model(nx=8, ny=8, nz=128, d_time=1e-8, end_time=1.0)
    lm = lower(m, SolverConfig(node_pad=64, renumber="always"))
    assert lm.plan_pos is not None
    ref = run_chunk(lm, init_state(lm), 60)
    hm = partition(lm, 8)
    assert hm.h_plan_pos is not None, "fast path must engage at this size"
    stepn = make_halo_step(hm, make_mesh(8), n_steps=60)
    got = gather_state(hm, stepn(init_halo_state(hm)))
    np.testing.assert_allclose(np.asarray(got.disp), np.asarray(ref.disp),
                               rtol=1e-9, atol=1e-13)
    np.testing.assert_allclose(np.asarray(got.stress), np.asarray(ref.stress),
                               rtol=1e-8, atol=1e-10)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
@pytest.mark.parametrize("variant", ["pallas", "pallas_mxu"])
def test_halo_packed_fast_path_matches_single_device(variant, monkeypatch):
    """With element_kernel=pallas/pallas_mxu the halo fast path routes the
    window element math through the packed Pallas kernel (interpret mode on
    CPU via HAKAI_PALLAS_FORCE); numerics must match the same kernel on a
    single device.  f32 deck so the MXU variant's in-kernel kinematics
    engages (pos/du never materialized)."""
    monkeypatch.setenv("HAKAI_PALLAS_FORCE", "1")
    from hakai_tpu.ops.element import pallas_core_ok
    from hakai_tpu.pre.synthetic import bar_model
    m = bar_model(nx=8, ny=8, nz=128, d_time=1e-8, end_time=1.0)
    cfg = SolverConfig(dtype="float32", node_pad=64, renumber="always",
                       element_kernel=variant, elem_pad=1024)
    lm = lower(m, cfg)
    assert pallas_core_ok(lm, lm.E, lm.edtype)   # packed path engages
    ref = run_chunk(lm, init_state(lm), 40)
    hm = partition(lm, 8)
    assert hm.h_plan_pos is not None, "fast path must engage at this size"
    assert hm.El % 1024 == 0                     # halo packed path engages
    stepn = make_halo_step(hm, make_mesh(8), n_steps=40)
    got = gather_state(hm, stepn(init_halo_state(hm)))
    # f32 state: halo-boundary assembly reassociates f32 sums vs the
    # single-device lane order
    np.testing.assert_allclose(np.asarray(got.disp), np.asarray(ref.disp),
                               rtol=3e-5, atol=1e-8)
    np.testing.assert_allclose(np.asarray(got.stress), np.asarray(ref.stress),
                               rtol=3e-4, atol=3e-3)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_halo_resume_roundtrip():
    """partition_state(gather_state(s)) continues exactly: 60+30 halo steps
    through a gather/scatter round trip equal 90 straight halo steps."""
    from hakai_tpu.parallel.halo import partition_state
    m = _bar()
    lm = lower(m, SolverConfig(node_pad=8 * 8, elem_pad=8))
    hm = partition(lm, 8)
    mesh = make_mesh(8)
    s60 = make_halo_step(hm, mesh, n_steps=60)(init_halo_state(hm))
    resumed = partition_state(hm, gather_state(hm, s60))
    out_a = make_halo_step(hm, mesh, n_steps=30)(resumed)
    out_b = make_halo_step(hm, mesh, n_steps=90)(init_halo_state(hm))
    np.testing.assert_array_equal(np.asarray(out_a.disp),
                                  np.asarray(out_b.disp))
    np.testing.assert_array_equal(np.asarray(out_a.stress),
                                  np.asarray(out_b.stress))
    assert int(out_a.t) == int(out_b.t) == 90


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
@pytest.mark.heavy
def test_run_halo_vtk(tmp_path):
    """run(halo=8) is a product path: frames match a single-device run to
    output precision on a contactless deck."""
    import re
    from hakai_tpu.solver.explicit import run

    from hakai_tpu.pre.synthetic import bar_model
    m = bar_model(nx=8, ny=8, nz=64, d_time=1e-8, end_time=2e-5)  # 200 steps
    out1 = tmp_path / "single"
    outh = tmp_path / "halo"
    lm1 = lower(m, SolverConfig(out_dir=str(out1), node_pad=64,
                                output_num=2))
    run(lm1, verbose=False)
    lmh = lower(m, SolverConfig(out_dir=str(outh), node_pad=64,
                                output_num=2))
    run(lmh, verbose=False, halo=8)

    frames1 = sorted(p.name for p in out1.glob("*.vtk"))
    framesh = sorted(p.name for p in outh.glob("*.vtk"))
    assert frames1 == framesh and len(frames1) >= 2
    float_re = re.compile(r"-?\d+\.\d+e[+-]\d+")
    for name in frames1:
        t1 = (out1 / name).read_text()
        th = (outh / name).read_text()
        scale = max(abs(float(x)) for x in float_re.findall(t1))
        for a, b in zip(t1.splitlines(), th.splitlines()):
            if a == b:
                continue
            fa, fb = float_re.findall(a), float_re.findall(b)
            assert fa and len(fa) == len(fb), (name, a, b)
            np.testing.assert_allclose(
                np.array([float(x) for x in fa]),
                np.array([float(x) for x in fb]),
                rtol=1e-6, atol=1e-6 * scale,
                err_msg=f"{name}: {a} vs {b}")


@pytest.mark.slow
def test_pod_scale_partition_stays_on_fast_path():
    """Regression guard for the pod-scale claim: a 2M-element bar's 8-shard
    halo partition must keep its window-local Pallas plans (both the element
    gather and the assembly lanes).  Above ~1M elements these used to fall
    back to XLA gathers until the geometric-sweep renumbering candidate and
    slot-pure assembly lanes landed (docs/PERF.md round-3 ledger).  Plan
    build only — no jit, no stepping."""
    from hakai_tpu.pre.synthetic import bar_model
    m = bar_model(nx=64, ny=64, nz=512, d_time=1e-8, end_time=1.0)
    lm = lower(m, SolverConfig(dtype="float32", node_pad=128 * 8,
                               elem_pad=128, renumber="always"))
    assert lm.plan_pos is not None       # single-chip plans hold at 2M
    hm = partition(lm, 8)
    assert hm.h_plan_pos is not None, "element-gather window plan fell back"
    assert hm.h_plan_asm is not None, "assembly lane plan fell back"
    assert hm.El % 1024 == 0             # packed-kernel tile divisibility
    # 2M/8 shards is below the phys-asm engagement gate (El >= 400k), so
    # partition skips that build; build it directly to guard the forcing
    # logic at a window that previously fell back
    from hakai_tpu.ops.gather_pallas import plan_sharded_assemble_phys
    ew = np.asarray(hm.elem_w)
    al = np.asarray(hm.elem_alive0)
    W = hm.No + 2 * hm.H
    p2 = plan_sharded_assemble_phys(
        [ew[d] for d in range(8)],
        [int(al[d].sum()) for d in range(8)], hm.El, W)
    assert p2 is not None, "phys-layout assembly plan fell back at 2M"


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_halo_packed_resume_roundtrip(monkeypatch):
    """Exact resume holds on the packed halo path: 40+20 steps through a
    gather/partition round trip equal 60 straight steps bitwise (the packed
    state is (un)packed at chunk boundaries with exact reshapes)."""
    monkeypatch.setenv("HAKAI_PALLAS_FORCE", "1")
    from hakai_tpu.parallel.halo import partition_state
    from hakai_tpu.pre.synthetic import bar_model
    m = bar_model(nx=8, ny=8, nz=128, d_time=1e-8, end_time=1.0)
    lm = lower(m, SolverConfig(dtype="float32", node_pad=64,
                               renumber="always",
                               element_kernel="pallas_mxu", elem_pad=1024))
    hm = partition(lm, 8)
    assert hm.h_plan_pos is not None and hm.El % 1024 == 0
    mesh = make_mesh(8)
    s40 = make_halo_step(hm, mesh, n_steps=40)(init_halo_state(hm))
    resumed = partition_state(hm, gather_state(hm, s40))
    out_a = make_halo_step(hm, mesh, n_steps=20)(resumed)
    out_b = make_halo_step(hm, mesh, n_steps=60)(init_halo_state(hm))
    np.testing.assert_array_equal(np.asarray(out_a.disp),
                                  np.asarray(out_b.disp))
    np.testing.assert_array_equal(np.asarray(out_a.stress),
                                  np.asarray(out_b.stress))
    assert int(out_a.t) == int(out_b.t) == 60


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
@pytest.mark.heavy
def test_run_halo_packed_vtk(tmp_path, monkeypatch):
    """run(halo=8) with element_kernel=pallas_mxu is a product path: frames
    match a single-device run with the same kernel to output precision."""
    import re

    from hakai_tpu.pre.synthetic import bar_model
    from hakai_tpu.solver.explicit import run
    monkeypatch.setenv("HAKAI_PALLAS_FORCE", "1")

    def deck():
        return bar_model(nx=8, ny=8, nz=128, d_time=1e-8, end_time=4e-6)

    out1 = tmp_path / "single"
    outh = tmp_path / "halo"
    cfg = dict(dtype="float32", node_pad=64, renumber="always",
               element_kernel="pallas_mxu", elem_pad=1024, output_num=2)
    run(lower(deck(), SolverConfig(out_dir=str(out1), **cfg)), verbose=False)
    run(lower(deck(), SolverConfig(out_dir=str(outh), **cfg)),
        verbose=False, halo=8)
    frames1 = sorted(p.name for p in out1.glob("*.vtk"))
    framesh = sorted(p.name for p in outh.glob("*.vtk"))
    assert frames1 == framesh and len(frames1) >= 2
    float_re = re.compile(r"-?\d+\.\d+e[+-]\d+")
    for name in frames1:
        t1 = (out1 / name).read_text()
        th = (outh / name).read_text()
        scale = max(abs(float(x)) for x in float_re.findall(t1))
        for a, b in zip(t1.splitlines(), th.splitlines()):
            if a == b:
                continue
            fa, fb = float_re.findall(a), float_re.findall(b)
            assert fa and len(fa) == len(fb), (name, a, b)
            np.testing.assert_allclose(
                np.array([float(x) for x in fa]),
                np.array([float(x) for x in fb]),
                rtol=2e-5, atol=2e-5 * scale, err_msg=f"{name}: {a} vs {b}")


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_halo_packed_fracture_matches_single_device(monkeypatch):
    """Erosion inside the packed halo loop (in-kernel triax + per-step flag
    updates + deferred zeroing across shards) matches the same packed kernel
    on a single device, with real deletions."""
    monkeypatch.setenv("HAKAI_PALLAS_FORCE", "1")
    from hakai_tpu.pre.synthetic import bar_model
    m = bar_model(nx=8, ny=8, nz=128, d_time=5e-8, end_time=1.0,
                  ductile=True)
    m.materials[0].ductile = np.array([[1e-3, 0.0, 30.0], [5e-4, 0.3, 30.0]])
    dofs = np.arange(1, m.n_node * 3 + 1, 3) + 2
    m.ics.append(IC(type="VELOCITY", dof=[dofs], value=[5.0e4]))
    cfg = SolverConfig(dtype="float32", node_pad=64, renumber="always",
                       element_kernel="pallas_mxu", elem_pad=1024)
    lm = lower(m, cfg)
    assert lm.fracture_enabled
    ref = run_chunk(lm, init_state(lm), 120)
    assert int(np.asarray(ref.element_flag).sum()) < int(
        np.asarray(lm.elem_exists).sum())     # erosion fired
    hm = partition(lm, 8)
    assert hm.h_plan_pos is not None and hm.El % 1024 == 0
    got = gather_state(hm, make_halo_step(hm, make_mesh(8), n_steps=120)(
        init_halo_state(hm)))
    assert np.array_equal(np.asarray(got.element_flag),
                          np.asarray(ref.element_flag))
    np.testing.assert_allclose(np.asarray(got.disp), np.asarray(ref.disp),
                               rtol=3e-5, atol=5e-6)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_halo_frame_matches_gathered_node_fields():
    """make_halo_frame (device-side node averaging + ghost return, the
    pod-scale output path) reproduces the gather_state + node_fields view:
    disp/velo/flags bitwise, node-averaged fields to summation-order
    roundoff."""
    from hakai_tpu.parallel.halo import make_halo_frame
    from hakai_tpu.pre.synthetic import bar_model
    from hakai_tpu.solver.output import node_fields

    m = bar_model(nx=8, ny=8, nz=64, d_time=1e-8, end_time=1.0)
    lm = lower(m, SolverConfig(node_pad=64))
    hm = partition(lm, 8)
    mesh = make_mesh(8)
    s = make_halo_step(hm, mesh, n_steps=100)(init_halo_state(hm))
    di, ve, nd, fl = make_halo_frame(hm, mesh)(s)
    sv = gather_state(hm, s)
    nd_ref = node_fields(lm, sv.stress, sv.strain, sv.eq_ps, sv.triax)
    np.testing.assert_array_equal(di, np.asarray(sv.disp))
    np.testing.assert_array_equal(ve, np.asarray(sv.velo))
    np.testing.assert_array_equal(fl, np.asarray(sv.element_flag))
    for a, b, name in zip(nd, nd_ref,
                          ["stress", "strain", "eq_ps", "mises", "triax"]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-11, atol=1e-18, err_msg=name)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
@pytest.mark.heavy
def test_halo_frame_with_fracture():
    """Deleted elements keep counting in the node-average divisor (reference
    semantics) on the device-side frame path too."""
    from conftest import ref_deck
    from hakai_tpu.io.inp import read_inp_file
    from hakai_tpu.parallel.halo import make_halo_frame
    from hakai_tpu.solver.output import node_fields

    lm = lower(read_inp_file(ref_deck("bullet-impact.inp")),
               SolverConfig(node_pad=64, elem_pad=16, renumber="always"))
    hm = partition(lm, 8)
    mesh = make_mesh(8)
    s = make_halo_step(hm, mesh, n_steps=2500)(init_halo_state(hm))
    sv = gather_state(hm, s)
    assert int(np.asarray(sv.element_flag).sum()) < lm.n_element, \
        "deck did not erode — test premise broken"
    di, ve, nd, fl = make_halo_frame(hm, mesh)(s)
    nd_ref = node_fields(lm, sv.stress, sv.strain, sv.eq_ps, sv.triax)
    np.testing.assert_array_equal(fl, np.asarray(sv.element_flag))
    for a, b, name in zip(nd, nd_ref,
                          ["stress", "strain", "eq_ps", "mises", "triax"]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-9, atol=1e-12, err_msg=name)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_halo_checkpoint_roundtrip(tmp_path):
    """Shard-major checkpoint (no gather_state round trip) resumes
    bit-exactly."""
    import dataclasses

    from hakai_tpu.parallel.halo import (is_halo_checkpoint,
                                         load_halo_checkpoint,
                                         save_halo_checkpoint)
    from hakai_tpu.pre.synthetic import bar_model

    m = bar_model(nx=8, ny=8, nz=32, d_time=1e-8, end_time=1.0)
    lm = lower(m, SolverConfig(node_pad=64))
    hm = partition(lm, 8)
    mesh = make_mesh(8)
    step = make_halo_step(hm, mesh, n_steps=50)
    s50 = step(init_halo_state(hm))
    path = str(tmp_path / "halo.npz")
    save_halo_checkpoint(path, hm, s50)
    assert is_halo_checkpoint(path)
    resumed = load_halo_checkpoint(path, hm)
    a, b = step(s50), step(resumed)
    for f in dataclasses.fields(a):
        assert np.array_equal(np.asarray(getattr(a, f.name)),
                              np.asarray(getattr(b, f.name))), f.name
    # geometry mismatch is rejected, not silently mis-scattered
    hm4 = partition(lm, 4)
    with pytest.raises(ValueError, match="partition"):
        load_halo_checkpoint(path, hm4)
