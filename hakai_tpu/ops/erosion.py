"""Ductile-damage element erosion.

Reference: the fracture block of the time loop (HAKAI_j.jl:684-764).
Per element: average equivalent plastic strain and triaxiality over the 8
Gauss points; interpolate the fracture strain from the material's ductile
table on triaxiality; erode (flag 0 + zero stress/strain) when the average
plastic strain reaches it.  Elements with negative average triaxiality never
erode (HAKAI_j.jl:720-722).

The *Tensile Failure stress criterion is parsed but inert in the reference
(commented out at HAKAI_j.jl:686-698), so it is inert here too.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ..core.lowering import LoweredModel


class ErosionResult(NamedTuple):
    element_flag: jnp.ndarray  # (E,) bool
    stress: jnp.ndarray        # (6,8,E) zeroed where newly deleted
    strain: jnp.ndarray        # (6,8,E)
    deleted_now: jnp.ndarray   # (E,) bool — deleted this step


def erode(model: LoweredModel,
          stress: jnp.ndarray, strain: jnp.ndarray,
          eq_ps: jnp.ndarray, triax: jnp.ndarray,
          element_flag: jnp.ndarray) -> ErosionResult:
    v_e = eq_ps.mean(axis=0)     # (E,)
    t_e = triax.mean(axis=0)     # (E,)

    mat = model.mat_id
    fr_tab = model.du_strain[mat]        # (E, D)
    tx_tab = model.du_triax[mat]         # (E, D)
    nd = model.du_n[mat]                 # (E,)
    has_ductile = nd > 0

    D = fr_tab.shape[1]
    # default: last true row's strain (HAKAI_j.jl:725); tables are padded by
    # repeating the last row so index D-1 equals the last true row.
    fr_def = fr_tab[:, D - 1]
    if D > 1:
        t0, t1 = tx_tab[:, :-1], tx_tab[:, 1:]
        f0, f1 = fr_tab[:, :-1], fr_tab[:, 1:]
        seg = (t_e[:, None] >= t0) & (t_e[:, None] < t1)    # (E, D-1)
        denom = jnp.where(t1 == t0, 1.0, t1 - t0)
        interp = f0 + (f1 - f0) / denom * (t_e[:, None] - t0)
        any_seg = seg.any(axis=1)
        # first matching segment (segments are disjoint for increasing triax)
        fr_e = jnp.where(any_seg,
                         jnp.where(seg, interp, 0.0).sum(axis=1)
                         / jnp.maximum(seg.sum(axis=1), 1),
                         fr_def)
    else:
        fr_e = fr_def

    delete = (has_ductile & (t_e >= 0.0) & (v_e >= fr_e) & element_flag)
    new_flag = element_flag & ~delete
    z = ~delete[None, None, :]
    return ErosionResult(new_flag,
                         jnp.where(z, stress, 0.0),
                         jnp.where(z, strain, 0.0),
                         delete)
