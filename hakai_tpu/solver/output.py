"""Node-averaged output fields.

Reference: ``cal_node_stress_strain`` (HAKAI_j.jl:3408-3486): Gauss values ->
element average -> incidence-weighted node average (deleted elements keep
their zeroed state and still count in the divisor, as in the reference).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core.lowering import LoweredModel


class NodeData(NamedTuple):
    stress: jnp.ndarray        # (6, N)
    strain: jnp.ndarray        # (6, N)
    eq_ps: jnp.ndarray         # (N,)
    mises: jnp.ndarray         # (N,)
    triax: jnp.ndarray         # (N,)


def _node_average(model: LoweredModel, elem_val: jnp.ndarray) -> jnp.ndarray:
    """(..., E) element field -> (..., N) incidence-averaged node field."""
    e_of = model.inc_idx % model.E                 # (V, N) element ids
    gathered = elem_val[..., e_of]                 # (..., V, N)
    s = jnp.where(model.inc_mask, gathered, 0.0).sum(axis=-2)
    cnt = model.inc_mask.sum(axis=0)
    return s / jnp.maximum(cnt, 1)


@jax.jit
def node_fields(model: LoweredModel, stress, strain, eq_ps, triax) -> NodeData:
    es = stress.mean(axis=1)       # (6, E)
    ee = strain                    # already the GP mean (state carries it)
    ep = eq_ps.mean(axis=0)        # (E,)
    et = triax.mean(axis=0)
    ns = _node_average(model, es)
    ne = _node_average(model, ee)
    np_ = _node_average(model, ep)
    nt = _node_average(model, et)
    sx, sy, sz, txy, tyz, txz = (ns[i] for i in range(6))
    mises = jnp.sqrt(0.5 * ((sx - sy)**2 + (sy - sz)**2 + (sx - sz)**2
                            + 6.0 * (txy**2 + tyz**2 + txz**2)))
    return NodeData(ns, ne, np_, mises, nt)
