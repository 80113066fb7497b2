"""run() resume semantics: a checkpointed run continues to end_time and
produces the same final state as an uninterrupted run."""
import numpy as np

from hakai_tpu.config import SolverConfig
from hakai_tpu.core.lowering import lower
from hakai_tpu.core.state import init_state
from hakai_tpu.io.model import IC
from hakai_tpu.solver.explicit import run, run_chunk
from test_element import unit_cube_model


def _model():
    m = unit_cube_model(plastic=[[0.5, 0.0], [1.0, 1.0]])
    dofs = np.arange(1, m.n_node * 3 + 1, 3) + 2
    m.ics.append(IC(type="VELOCITY", dof=[dofs], value=[2.0]))
    m.d_time = 1e-4
    m.end_time = 0.05    # 500 steps
    return m


def test_resume_continues_to_end(tmp_path):
    cfg = SolverConfig(out_dir=str(tmp_path), output_num=10)
    lm = lower(_model(), cfg)
    full = run(lm, verbose=False, write_output=False)
    assert int(full.t) == 500

    half = run_chunk(lm, init_state(lm), 250)
    resumed = run(lm, half, verbose=False, write_output=False)
    assert int(resumed.t) == 500
    np.testing.assert_array_equal(np.asarray(resumed.disp),
                                  np.asarray(full.disp))
    np.testing.assert_array_equal(np.asarray(resumed.stress),
                                  np.asarray(full.stress))


def test_resume_frame_numbering(tmp_path):
    cfg = SolverConfig(out_dir=str(tmp_path), output_num=10)
    lm = lower(_model(), cfg)
    half = run_chunk(lm, init_state(lm), 250)
    run(lm, half, verbose=False, write_output=True)
    names = sorted(p.name for p in tmp_path.glob("file*.vtk"))
    # frames 0 (initial of the resumed leg) and 6..10
    assert "file010.vtk" in names
    assert "file006.vtk" in names
    assert "file005.vtk" not in names


def test_resume_bitwise_under_unrolled_chunks(tmp_path):
    """d_out = 40 -> the auto chunk unroll picks U=4; frame-aligned splits
    must still be bitwise-identical (unroll groups align to absolute step
    indices because every chunk is a multiple of U)."""
    m = _model()
    m.end_time = 0.04                       # 400 steps
    cfg = SolverConfig(out_dir=str(tmp_path), output_num=10)  # d_out = 40
    lm = lower(m, cfg)
    full = run(lm, verbose=False, write_output=False)
    assert int(full.t) == 400

    part = run_chunk(lm, init_state(lm), 120)   # 3 frames in one chunk
    resumed = run(lm, part, verbose=False, write_output=False)
    np.testing.assert_array_equal(np.asarray(resumed.disp),
                                  np.asarray(full.disp))
    np.testing.assert_array_equal(np.asarray(resumed.stress),
                                  np.asarray(full.stress))
    np.testing.assert_array_equal(np.asarray(resumed.eq_ps),
                                  np.asarray(full.eq_ps))
