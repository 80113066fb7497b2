"""Fused Pallas element kernel.

Runs the complete hex8 update (B̄ strain, J2 radial return, internal force)
for a tile of elements entirely in VMEM.  XLA's fusion of the same math
spills the ~60 live (8, E) temporaries (J, invJ, P, g, stress pipeline) to
HBM — ~3x slower at 131k elements on v5e.  Here each grid step streams one
element tile of inputs in and outputs out (auto-pipelined BlockSpec DMA)
while every intermediate stays on-chip.

The math itself is shared with the XLA path (ops/element.py::_element_math),
written against lax primitives so it traces inside the kernel body.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.lowering import LoweredModel
from . import element as _el


def _make_kernel(pl_tables):
    def kernel(pus_ref, pos_ref, du_ref, stress_ref, strain_ref, eq_ref,
               y_ref, flag_ref, mat_ref, G_ref, lam_ref, hasp_ref,
               qe_ref, stress_o, strain_o, eq_o, y_o):
        flag = flag_ref[0] != 0          # (TE,)
        hasp = hasp_ref[0] != 0
        stress_c = [stress_ref[c] for c in range(6)]
        strain_c = [strain_ref[c] for c in range(6)]
        qe, s_c, e_c, eq, y, _ = _el._element_math(
            pl_tables, mat_ref[0], G_ref[0], lam_ref[0], hasp, pus_ref[:],
            pos_ref[:], du_ref[:], stress_c, strain_c,
            eq_ref[:], y_ref[:], flag)
        qe_ref[:] = _el._stack_qe(qe)
        stress_o[:] = jnp.stack(s_c)
        strain_o[:] = jnp.stack(e_c)
        eq_o[:] = eq
        y_o[:] = y
    return kernel


def element_core_pallas(model: LoweredModel, pos_e, du, stress, strain,
                        eq_ps, yield_s, element_flag):
    E = pos_e.shape[-1]
    TE = _el._TILE_E
    n_tiles = E // TE
    dt = pos_e.dtype

    def spec(lead):
        return pl.BlockSpec(lead + (TE,),
                            lambda i, nl=len(lead): (jnp.asarray(0, jnp.int32),) * nl + (i,),
                            memory_space=pltpu.VMEM)

    flag_i = element_flag.astype(jnp.int32)[None]        # (1, E)
    hasp_i = model.has_plastic_e.astype(jnp.int32)[None]
    mat_i = model.mat_id[None]
    G_i = model.G_e[None]
    lam_i = model.lam_e[None]

    out = pl.pallas_call(
        _make_kernel(model.pl_tables),
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((8, 3, 8),
                         lambda i: (jnp.asarray(0, jnp.int32),) * 3,
                         memory_space=pltpu.VMEM),       # pusai table
            spec((3, 8)), spec((3, 8)),                  # pos_e, du
            spec((6, 8)), spec((6, 8)),                  # stress, strain
            spec((8,)), spec((8,)),                      # eq_ps, yield
            spec((1,)), spec((1,)), spec((1,)), spec((1,)), spec((1,)),
        ],
        out_specs=[
            spec((3, 8)), spec((6, 8)), spec((6, 8)), spec((8,)), spec((8,)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((3, 8, E), dt),
            jax.ShapeDtypeStruct((6, 8, E), dt),
            jax.ShapeDtypeStruct((6, 8, E), dt),
            jax.ShapeDtypeStruct((8, E), dt),
            jax.ShapeDtypeStruct((8, E), dt),
        ],
    )(jnp.asarray(_el._PUS, dt), pos_e, du, stress, strain, eq_ps, yield_s,
      flag_i, mat_i, G_i, lam_i, hasp_i)
    qe, stress_n, strain_n, eq_n, y_n = out
    return _el.ElementResult(qe, stress_n, strain_n, eq_n, y_n,
                             jnp.zeros((), jnp.int32))


def _make_packed_kernel(pl_tables, TE):
    def kernel(pus_ref, P_ref, pos_ref, du_ref, fs_ref, is_ref, flag_ref,
               P_out, qe_ref):
        flag = flag_ref[0] != 0
        mat = is_ref[0]
        hasp = is_ref[1] != 0
        G = fs_ref[0]
        lam = fs_ref[1]
        stress_c = [P_ref[8 * c:8 * (c + 1)] for c in range(6)]
        strain_c = [P_ref[48 + 8 * c:48 + 8 * (c + 1)] for c in range(6)]
        eq = P_ref[96:104]
        y = P_ref[104:112]
        pos_e = pos_ref[:].reshape(3, 8, TE)
        du = du_ref[:].reshape(3, 8, TE)
        qe, s_c, e_c, eq2, y2, _ = _el._element_math(
            pl_tables, mat, G, lam, hasp, pus_ref[:], pos_e, du,
            stress_c, strain_c, eq, y, flag)
        qe_ref[:] = _el._stack_qe(qe).reshape(24, TE)
        for c in range(6):
            P_out[8 * c:8 * (c + 1)] = s_c[c]
            P_out[48 + 8 * c:48 + 8 * (c + 1)] = e_c[c]
        P_out[96:104] = eq2
        P_out[104:112] = y2
    return kernel


def element_core_packed(model: LoweredModel, pos24, du24, P, flag):
    """Packed-buffer variant for the chunk loop: the whole Gauss-point
    state travels as ONE (112, E) array (stress 0:48, strain 48:96,
    eq_ps 96:104, yield 104:112) and pos/du as (24, E) row blocks, so each
    grid step issues ~9 buffer DMAs instead of 22 — DMA-issue latency, not
    bandwidth or flops, dominated the many-buffer variant (measured 2.4 ms
    vs 0.68 ms XLA at 131k; this layout reaches ~0.3 ms)."""
    E = P.shape[1]
    TE = _el._TILE_E
    n_tiles = E // TE
    dt = P.dtype
    fstat = jnp.stack([model.G_e, model.lam_e])             # (2, E)
    istat = jnp.stack([model.mat_id,
                       model.has_plastic_e.astype(jnp.int32)])
    flag_i = flag.astype(jnp.int32)[None]

    def spec(rows):
        return pl.BlockSpec((rows, TE),
                            lambda i: (jnp.asarray(0, jnp.int32), i),
                            memory_space=pltpu.VMEM)

    P_new, qe = pl.pallas_call(
        _make_packed_kernel(model.pl_tables, TE),
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((8, 3, 8),
                         lambda i: (jnp.asarray(0, jnp.int32),) * 3,
                         memory_space=pltpu.VMEM),
            spec(112), spec(24), spec(24), spec(2), spec(2), spec(1),
        ],
        out_specs=[spec(112), spec(24)],
        out_shape=[jax.ShapeDtypeStruct((112, E), dt),
                   jax.ShapeDtypeStruct((24, E), dt)],
    )(jnp.asarray(_el._PUS, dt), P, pos24, du24, fstat, istat, flag_i)
    return P_new, qe
