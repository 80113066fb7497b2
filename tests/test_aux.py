"""Auxiliary subsystems: checkpoint/resume, metrics, run() driver."""
import json

import numpy as np

from hakai_tpu.config import SolverConfig
from hakai_tpu.core.lowering import lower
from hakai_tpu.core.state import init_state
from hakai_tpu.io.model import IC
from hakai_tpu.solver.explicit import run, run_chunk
from hakai_tpu.utils.checkpoint import load_checkpoint, save_checkpoint
from hakai_tpu.utils.metrics import step_metrics
from test_element import unit_cube_model


def _model(**kw):
    m = unit_cube_model(**kw)
    dofs = np.arange(1, m.n_node * 3 + 1, 3) + 2
    m.ics.append(IC(type="VELOCITY", dof=[dofs], value=[2.0]))
    m.d_time = 1e-4
    m.end_time = 0.05   # 500 steps
    return m


def test_checkpoint_exact_resume(tmp_path):
    lm = lower(_model())
    st = run_chunk(lm, init_state(lm), 100)
    p = save_checkpoint(str(tmp_path / "c.npz"), st)
    st2 = load_checkpoint(p, init_state(lm))
    assert int(st2.t) == 100
    a = run_chunk(lm, st, 50)
    b = run_chunk(lm, st2, 50)
    assert np.array_equal(np.asarray(a.disp), np.asarray(b.disp))
    assert np.array_equal(np.asarray(a.stress), np.asarray(b.stress))


def test_metrics_values():
    lm = lower(_model())
    st = init_state(lm)
    m = step_metrics(lm, st)
    # KE of rigid motion: 0.5 * M * v^2
    total_mass = float(np.asarray(lm.diag_M)[np.asarray(lm.node_exists)].sum())
    np.testing.assert_allclose(float(m["kinetic_energy"]),
                               0.5 * total_mass * 4.0, rtol=1e-12)
    assert int(m["alive_elements"]) == lm.n_element


def test_run_driver_writes_frames_and_metrics(tmp_path):
    cfg = SolverConfig(out_dir=str(tmp_path), output_num=5,
                       metrics_path=str(tmp_path / "metrics.jsonl"),
                       checkpoint_every=2)
    lm = lower(_model(), cfg)
    run(lm, verbose=False)
    vtks = sorted(p.name for p in tmp_path.glob("*.vtk"))
    assert vtks[0] == "file000.vtk"
    assert len(vtks) == 6               # frame 0 + 5
    recs = [json.loads(l) for l in open(tmp_path / "metrics.jsonl")]
    assert len(recs) == 5
    assert recs[-1]["step"] == 500
    assert recs[-1]["kinetic_energy"] > 0
    assert (tmp_path / "ckpt_002.npz").exists()
    assert (tmp_path / "ckpt_004.npz").exists()


def test_plot_metrics_renders_png(tmp_path):
    """utils/plot.py: the drawGraph analogue renders a JSONL stream."""
    from hakai_tpu.utils.plot import load_jsonl, plot_metrics
    cfg = SolverConfig(out_dir=str(tmp_path), output_num=5,
                       metrics_path=str(tmp_path / "metrics.jsonl"))
    lm = lower(_model(), cfg)
    run(lm, verbose=False)
    recs = load_jsonl(str(tmp_path / "metrics.jsonl"))
    out = plot_metrics(recs, str(tmp_path / "metrics.png"))
    assert (tmp_path / "metrics.png").stat().st_size > 2000
    # field subset + explicit failure on unknown fields
    plot_metrics(recs, str(tmp_path / "m2.png"),
                 fields=["kinetic_energy", "d_max"], x="step")
    import pytest as _pytest
    with _pytest.raises(ValueError):
        plot_metrics(recs, str(tmp_path / "m3.png"), fields=["nope"])
