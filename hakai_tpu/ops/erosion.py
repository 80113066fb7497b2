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
    strain: jnp.ndarray        # (6,E) GP-mean accumulator, zeroed likewise
    deleted_now: jnp.ndarray   # (E,) bool — deleted this step


def erosion_delete_mask(model: LoweredModel, eq_ps: jnp.ndarray,
                        triax: jnp.ndarray, element_flag: jnp.ndarray):
    """(new_flag, delete) per element — the table walk without state zeroing.

    Fracture-strain interpolation on triaxiality, unrolled per material with
    scalar-constant table knots (no per-element table gathers).  Default is
    the last row's strain (HAKAI_j.jl:725); rows interpolate on
    t0 <= t_e < t1 (HAKAI_j.jl:726-731).
    """
    v_e = eq_ps.mean(axis=0)     # (E,)
    t_e = triax.mean(axis=0)     # (E,)
    mat = model.mat_id
    delete = jnp.zeros(v_e.shape, bool)
    for m, tab in enumerate(model.du_tables):
        nd = len(tab)
        if nd == 0:
            continue
        fr_m = jnp.asarray(tab[nd - 1][0], v_e.dtype)
        for j in range(nd - 1):
            f0, t0 = tab[j]
            f1, t1 = tab[j + 1]
            if t1 == t0:
                continue
            seg = (t_e >= t0) & (t_e < t1)
            fr_m = jnp.where(seg, f0 + (f1 - f0) / (t1 - t0) * (t_e - t0),
                             fr_m)
        delete_m = (t_e >= 0.0) & (v_e >= fr_m)
        delete = jnp.where(mat == m, delete_m, delete)
    delete = delete & element_flag
    return element_flag & ~delete, delete


def erode(model: LoweredModel,
          stress: jnp.ndarray, strain: jnp.ndarray,
          eq_ps: jnp.ndarray, triax: jnp.ndarray,
          element_flag: jnp.ndarray) -> ErosionResult:
    new_flag, delete = erosion_delete_mask(model, eq_ps, triax, element_flag)
    # mask by the full life flag (not just this step's deletions): the
    # element math no longer freezes dead lanes, so their don't-care values
    # must be re-zeroed every step on this generic path (the fast chunk
    # paths defer this to the chunk exit)
    z = new_flag[None, None, :]
    return ErosionResult(new_flag,
                         jnp.where(z, stress, 0.0),
                         jnp.where(new_flag[None, :], strain, 0.0),
                         delete)
