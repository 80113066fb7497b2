"""Energy-balance diagnostics (SURVEY.md §5 failure-detection row).

The reference has no instability detector (its probes are findmax prints,
HAKAI_j.jl:540,657).  Here the central-difference discrete energy identity
  KE - KE0 = W_ext - W_int   (with midpoint work increments)
is accumulated in-state when config.energy_check is on; the residual is
exactly zero in real arithmetic, so its growth measures roundoff-energy
injection — the precision-instability mode of the f32 crash decks
(docs/PERF.md precision section).
"""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hakai_tpu.config import SolverConfig
from hakai_tpu.core.lowering import lower
from hakai_tpu.core.state import init_state
from hakai_tpu.io.inp import read_inp_file
from hakai_tpu.solver.explicit import run_chunk
from hakai_tpu.utils.metrics import energy_guard, step_metrics

TENSILE = "/root/reference/HAKAI-v0.0.0/input/Tensile5e.inp"
BULLET = "/root/reference/HAKAI-v0.0.0/input/bullet-impact.inp"


def _run(deck, cfg, n):
    model = lower(read_inp_file(deck), cfg)
    state = run_chunk(model, init_state(model), n)
    return model, state


def test_balance_residual_is_roundoff_f64():
    """BC-driven elastoplastic run: the accumulated residual stays at
    roundoff level (~1e-13 relative) over 2000 steps."""
    model, state = _run(TENSILE, SolverConfig(energy_check=True), 2000)
    m = step_metrics(model, state)
    assert float(m["energy_rel_error"]) < 1e-10
    # the work accumulators are real (not zeros): plastic bar does work
    assert float(m["work_external"]) > 1.0
    assert float(m["work_internal"]) > 1.0
    assert float(energy_guard(model, state)) == float(m["energy_rel_error"])


def test_internal_work_matches_constitutive_energy():
    """W_int (nodal work against internal forces) tracks the constitutive
    stored energy U_elastic + W_plastic — the backward-rectangle quadrature
    differs by O(dt), a few percent over this interval."""
    model, state = _run(TENSILE, SolverConfig(energy_check=True), 2000)
    m = step_metrics(model, state)
    w_int = float(m["work_internal"])
    stored = float(m["elastic_energy"]) + float(m["plastic_dissipation"])
    assert abs(w_int - stored) / stored < 0.05


def test_energy_check_off_keeps_work_zero_and_trajectory():
    """The flag is hot-path-neutral: disp trajectories are bitwise equal
    with the check on and off, and work stays zeroed when off."""
    cfg_off = SolverConfig()
    cfg_on = SolverConfig(energy_check=True)
    m_off, s_off = _run(TENSILE, cfg_off, 500)
    m_on, s_on = _run(TENSILE, cfg_on, 500)
    assert np.array_equal(np.asarray(s_off.disp), np.asarray(s_on.disp))
    assert np.all(np.asarray(s_off.work) == 0.0)
    assert np.any(np.asarray(s_on.work) != 0.0)


@pytest.mark.heavy
def test_balance_residual_with_contact_and_erosion():
    """bullet-impact: IC-velocity contact + ductile erosion.  Contact
    penalty forces enter W_ext; erosion does not retroactively break the
    balance (it only zeroes stored stress, which the identity never
    references)."""
    cfg = SolverConfig(energy_check=True)
    model, state = _run(BULLET, cfg, 1500)
    m = step_metrics(model, state)
    assert float(m["energy_rel_error"]) < 1e-9


def test_energy_abort_raises(tmp_path):
    """run() aborts between chunks when the residual crosses the
    threshold (drive it with an absurdly tight tolerance)."""
    from hakai_tpu.solver.explicit import run
    cfg = SolverConfig(energy_check=True, energy_abort_rel=1e-20,
                       out_dir=str(tmp_path))
    model = lower(read_inp_file(TENSILE), cfg)
    with pytest.raises(FloatingPointError, match="energy balance"):
        run(model, verbose=False, write_output=False)


def test_checkpoint_missing_work_key(tmp_path):
    """Checkpoints written before the work field existed load with zeroed
    accumulators."""
    import dataclasses

    from hakai_tpu.utils.checkpoint import load_checkpoint, save_checkpoint
    model, state = _run(TENSILE, SolverConfig(), 100)
    path = str(tmp_path / "old.npz")
    leaves = {f.name: np.asarray(getattr(state, f.name))
              for f in dataclasses.fields(state) if f.name != "work"}
    np.savez_compressed(path, **leaves)
    restored = load_checkpoint(path, init_state(model))
    assert np.array_equal(np.asarray(restored.disp), np.asarray(state.disp))
    assert np.all(np.asarray(restored.work) == 0.0)


def test_halo_work_matches_single_chip():
    """2-shard halo accumulation (per-shard partials summed by
    gather_state) reproduces the single-chip work pair."""
    from hakai_tpu.parallel.halo import (gather_state, init_halo_state,
                                         make_halo_step, partition)
    from hakai_tpu.parallel.sharding import make_mesh
    if len(jax.devices()) < 2:
        pytest.skip("needs >=2 devices (CPU mesh)")
    cfg = SolverConfig(energy_check=True, node_pad=16, elem_pad=16)
    model = lower(read_inp_file(TENSILE), cfg)
    ref = run_chunk(model, init_state(model), 200)
    hm = partition(model, 2)
    stepper = make_halo_step(hm, make_mesh(2), n_steps=200)
    view = gather_state(hm, stepper(init_halo_state(hm)))
    w_ref = np.asarray(ref.work)
    w_halo = np.asarray(view.work)
    assert np.allclose(w_halo, w_ref, rtol=1e-10, atol=1e-12)


def test_cli_energy_guard_defaults():
    """CLI energy-guard resolution (default-on, VERDICT r4 #8): plain runs
    get check+abort(0.1); --no-energy-check turns both off; an explicit
    --energy-abort implies the check; --energy-abort 0 = report-only."""
    from hakai_tpu.cli import _resolve_energy_flags

    assert _resolve_energy_flags(True, None) == (True, 0.1)      # defaults
    assert _resolve_energy_flags(False, None) == (False, 0.0)    # --no-…
    assert _resolve_energy_flags(True, 0.05) == (True, 0.05)
    assert _resolve_energy_flags(False, 0.05) == (True, 0.05)    # implies
    assert _resolve_energy_flags(True, 0.0) == (True, 0.0)       # report-only
    assert _resolve_energy_flags(False, 0.0) == (False, 0.0)
