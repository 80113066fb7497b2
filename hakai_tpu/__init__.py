"""hakai_tpu — a TPU-native dynamic-explicit FEM framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
yozoyugen/HAKAI-fem (elastoplastic + fracture explicit dynamics, hex8
elements, penalty contact, Abaqus ``.inp`` input, legacy-VTK output),
built TPU-first:

  * the whole time step is one pure jitted ``step(model, state) -> state``;
  * meshes lower to padded, static-shape SoA arrays (node-last / element-last
    layouts so the lane dimension is the mesh axis);
  * element deletion and post-erosion contact-surface growth are masks over a
    pre-enumerated face inventory — no dynamic shapes;
  * internal-force and contact scatter are deterministic gather-segment sums;
  * multi-chip scaling uses ``jax.sharding`` meshes (domain decomposition),
    not host threads.
"""
from .io.inp import read_inp_file, parse_inp_lines
from .io.model import Model
from .config import SolverConfig

__version__ = "0.1.0"

__all__ = [
    "read_inp_file", "parse_inp_lines", "Model", "SolverConfig",
]


def enable_x64():
    """Enable float64 globally (call before creating arrays).

    The reference solver is Float64 throughout; use this for parity runs.
    TPU benchmarking normally runs f32 (see SolverConfig.dtype).
    """
    import jax
    jax.config.update("jax_enable_x64", True)
