"""VTK writer format tests (golden-format vs write_vtk, HAKAI_j.jl:3517-3717)."""
import numpy as np

from hakai_tpu.core.lowering import lower
from hakai_tpu.core.state import init_state
from hakai_tpu.io.inp import read_inp_file
from hakai_tpu.io.vtk import write_vtk
from hakai_tpu.solver.explicit import run_chunk
from hakai_tpu.solver.output import node_fields
from conftest import ref_deck


def _write_frame(tmp_path, lm, st, index=0):
    nd = node_fields(lm, st.stress, st.strain, st.eq_ps, st.triax)
    return write_vtk(index, str(tmp_path), lm.coord, lm.elem,
                     np.asarray(st.element_flag), st.disp, st.velo, nd,
                     lm.n_node, lm.n_element)


def test_vtk_structure(tmp_path):
    lm = lower(read_inp_file(ref_deck("Tensile5e.inp")))
    st = init_state(lm)
    fname = _write_frame(tmp_path, lm, st)
    lines = open(fname).read().splitlines()
    assert lines[0] == "# vtk DataFile Version 2.0"
    assert lines[1] == "Test"
    assert lines[2] == "ASCII"
    assert lines[3] == "DATASET UNSTRUCTURED_GRID"
    assert lines[4] == "POINTS 24 float"
    assert lines[5] == "-5.000000e+00 -2.500000e+01 5.000000e+00"
    i = lines.index("CELLS 5 45")
    assert lines[i + 1] == "8 12 13 19 18 0 1 7 6"
    i = lines.index("CELL_TYPES 5")
    assert lines[i + 1] == "12"
    assert "POINT_DATA 24" in lines
    assert "VECTORS DISPLACEMENT float" in lines
    for name in ["Vx", "Vy", "Vz", "E11", "E22", "E33", "E12", "E23", "E13",
                 "EQ_PSTRAIN", "S11", "S22", "S33", "S12", "S23", "S13",
                 "MISES_STRESS", "TRIAX_STRESS"]:
        assert f"SCALARS {name} float 1" in lines
    # zero state -> all-zero displacement rows, small values flushed
    i = lines.index("VECTORS DISPLACEMENT float")
    assert lines[i + 1] == "0.000000e+00 0.000000e+00 0.000000e+00"


def test_vtk_deleted_elements_omitted(tmp_path):
    lm = lower(read_inp_file(ref_deck("Tensile5e.inp")))
    st = init_state(lm)
    flag = np.asarray(st.element_flag).copy()
    flag[2] = False
    st = st.replace(element_flag=np.asarray(flag))
    fname = _write_frame(tmp_path, lm, st, index=7)
    txt = open(fname).read()
    assert fname.endswith("file007.vtk")
    assert "CELLS 4 36" in txt
    assert "CELL_TYPES 4" in txt


def test_pvd_collection(tmp_path):
    """run() writes a ParaView collection.pvd indexing frames with their
    physical times."""
    from hakai_tpu.config import SolverConfig
    from hakai_tpu.core.lowering import lower
    from hakai_tpu.pre.synthetic import bar_model
    from hakai_tpu.solver.explicit import run

    m = bar_model(nx=2, ny=2, nz=4, d_time=1e-7, end_time=2e-5)  # 200 steps
    lm = lower(m, SolverConfig(out_dir=str(tmp_path), output_num=4))
    run(lm, verbose=False)
    pvd = (tmp_path / "collection.pvd").read_text()
    assert pvd.count("<DataSet") == 5          # frame 0 + 4 outputs
    assert 'file="file000.vtk"' in pvd
    assert 'file="file004.vtk"' in pvd
    assert f'timestep="{2e-5:.9e}"' in pvd     # last frame at end time
