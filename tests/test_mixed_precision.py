"""Mixed precision (f64 nodal kinematics + f32 element/contact math)."""
import numpy as np
import pytest
import jax.numpy as jnp

from hakai_tpu.config import SolverConfig
from hakai_tpu.core.lowering import lower
from hakai_tpu.core.state import init_state
from hakai_tpu.io.inp import read_inp_file
from hakai_tpu.solver.explicit import run_chunk
from conftest import ref_deck


def test_mixed_dtypes():
    lm = lower(read_inp_file(ref_deck("Tensile5e.inp")),
               SolverConfig(dtype="mixed"))
    assert lm.dtype == jnp.float64
    assert lm.edtype == jnp.float32
    st = init_state(lm)
    assert st.disp.dtype == jnp.float64
    assert st.stress.dtype == jnp.float32
    out = run_chunk(lm, st, 50)
    assert out.disp.dtype == jnp.float64
    assert out.Q.dtype == jnp.float64
    assert out.stress.dtype == jnp.float32
    assert bool(np.isfinite(np.asarray(out.disp)).all())


@pytest.mark.heavy
def test_mixed_tracks_f64():
    """Short bullet-impact leg: mixed trajectory stays close to full f64."""
    m = read_inp_file(ref_deck("bullet-impact.inp"))
    lm64 = lower(m, SolverConfig(dtype="float64"))
    lmmx = lower(m, SolverConfig(dtype="mixed"))
    s64 = run_chunk(lm64, init_state(lm64), 400)
    smx = run_chunk(lmmx, init_state(lmmx), 400)
    d64 = np.asarray(s64.disp)[:, :m.n_node]
    dmx = np.asarray(smx.disp)[:, :m.n_node]
    scale = np.abs(d64).max()
    assert np.abs(dmx - d64).max() < 1e-3 * scale
    # stress states agree to f32-accumulation tolerance
    st64 = np.asarray(s64.stress)
    stmx = np.asarray(smx.stress)
    assert np.abs(stmx - st64).max() < 1e-2 * max(np.abs(st64).max(), 1.0)
