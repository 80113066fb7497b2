"""Short smoke runs of every reference deck family (CPU, few hundred steps):
lowering succeeds, the jitted step runs, state stays finite, and the
deck-specific physics shows up (contact force, self-contact mode, CP pairs).
"""
import numpy as np
import pytest

from hakai_tpu.config import ContactConfig, SolverConfig
from hakai_tpu.core.lowering import lower
from hakai_tpu.core.state import init_state
from hakai_tpu.io.inp import read_inp_file
from hakai_tpu.solver.explicit import run_chunk
from conftest import ref_deck


def _run(deck, steps, cfg=None):
    lm = lower(read_inp_file(ref_deck(deck)), cfg or SolverConfig())
    st = run_chunk(lm, init_state(lm), steps)
    assert bool(np.isfinite(np.asarray(st.disp)).all())
    return lm, st


def test_tensile_test_fracture_deck():
    lm, st = _run("Tensile-test.inp", 200)
    assert lm.fracture_enabled
    assert float(st.eq_ps.max()) >= 0.0


def test_bullet_impact_contact():
    # bullet at 500 m/s, dt=1e-8: reaches the plate within ~1500 steps
    lm, st = _run("bullet-impact.inp", 1200)
    assert len(lm.pairs) == 2
    # bullet keeps moving toward the plate
    assert float(np.abs(st.velo).max()) > 100.0


def test_charpy_cp_pairs():
    lm, st = _run("Charpy-test-v0.0.1.inp", 100)
    # 3 cross-instance CPs -> 6 directional entries: the reference builds 2
    # entries ([i,j] and [j,i]) per cross pair and 1 per self pair
    # (HAKAI_j.jl:339-354)
    keys = [(p.i_instance, p.j_instance) for p in lm.pairs]
    assert len(keys) == 6
    assert not any(p.is_self for p in lm.pairs)
    for p in lm.pairs:
        # every cross-instance entry's reverse direction must also be present
        assert (p.j_instance, p.i_instance) in keys


def test_crash_tube_self_contact():
    lm, st = _run("crash-tube-80-350-solid.inp", 100)
    assert lm.contact_flag == 2
    assert any(p.is_self for p in lm.pairs)


def test_metal_cutting_deck():
    """Tool-vs-workpiece cutting: contact + ductile ALU workpiece."""
    lm, st = _run("metal-cutting.inp", 150)
    assert lm.contact_flag == 1
    assert lm.fracture_enabled
    assert len(lm.pairs) == 2
    assert float(np.abs(st.disp).max()) > 0.0


def test_car_crash_mass_scaled():
    m = read_inp_file(ref_deck("car-crash-N2k.inp"))
    lm = lower(m)
    assert lm.mass_scaling == 100.0
    # dt scaled by sqrt(factor) (HAKAI_j.jl:114)
    assert lm.dt == pytest.approx(m.d_time * 10.0)
    st = run_chunk(lm, init_state(lm), 50)
    assert bool(np.isfinite(np.asarray(st.disp)).all())
    assert float(np.abs(st.disp).max()) > 0.0
