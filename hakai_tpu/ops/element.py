"""Hex8 element update: B̄ strain-displacement, elastic predictor, J2 radial
return, and internal nodal forces — fully vectorized over elements.

This re-derives the reference kernel (``cal_stress_hexa``/``cal_Bfinal``/
``cal_BVbar_hexa``, HAKAI-v0.0.2/Julia/HAKAI_j.jl:1033-1784) in tensor form so
no (6,24) B matrices are ever materialized:

  * strain increment at Gauss point k:
      de_axial = g_kk - tr(g)/3 + volbar,   gamma = g_ab + g_ba
    where ``g = P @ du`` is the displacement gradient and ``volbar`` is the
    element-volume-averaged volumetric strain — algebraically identical to
    ``Bfinal = B - Bvol/3 + BVbar`` applied to ``d_u``;
  * the isotropic 6x6 ``Dmat`` (HAKAI_j.jl:149-160) is applied as
    ``dsig = lam*tr(de) + 2G*de`` / ``G*gamma``;
  * internal force: ``Bfinal' sig`` becomes
      f[i,b] = sum_a P[a,i] sig[a,b] - (P[b,i] - Pbar[b,i]) * sig_m
    with ``Pbar`` the volume-averaged gradient, summed over Gauss points
    weighted by detJ (W=1, HAKAI_j.jl:1054,1330-1340).

Element axis is last everywhere so XLA tiles the mesh dimension onto lanes.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ..core.lowering import LoweredModel


class ElementResult(NamedTuple):
    Qe: jnp.ndarray        # (3, 8, E) nodal internal forces (axis, node-slot, elem)
    stress: jnp.ndarray    # (6, 8, E) updated Cauchy stress
    strain: jnp.ndarray    # (6, 8, E) updated accumulated strain
    eq_ps: jnp.ndarray     # (8, E)
    yield_s: jnp.ndarray   # (8, E)
    neg_jacobian: jnp.ndarray  # () int32 count of negative detJ (diagnostic)


def _det3(J):
    """Closed-form 3x3 determinant, J shaped (..., 3, 3, E) at (a, b)."""
    return (J[..., 0, 0, :] * J[..., 1, 1, :] * J[..., 2, 2, :]
            + J[..., 0, 1, :] * J[..., 1, 2, :] * J[..., 2, 0, :]
            + J[..., 0, 2, :] * J[..., 1, 0, :] * J[..., 2, 1, :]
            - J[..., 0, 0, :] * J[..., 1, 2, :] * J[..., 2, 1, :]
            - J[..., 0, 1, :] * J[..., 1, 0, :] * J[..., 2, 2, :]
            - J[..., 0, 2, :] * J[..., 1, 1, :] * J[..., 2, 0, :])


def _inv3(J, det):
    """Adjugate / det inverse; J (k,3,3,E), det (k,E) -> (k,3,3,E)."""
    def c(a, b):
        a1, a2 = (a + 1) % 3, (a + 2) % 3
        b1, b2 = (b + 1) % 3, (b + 2) % 3
        # inverse element [b, a] = cofactor of [a, b] / det (note transpose)
        return (J[:, a1, b1] * J[:, a2, b2] - J[:, a1, b2] * J[:, a2, b1])
    rows = []
    for b in range(3):
        cols = [c(a, b) for a in range(3)]
        rows.append(jnp.stack(cols, axis=1))
    return jnp.stack(rows, axis=1) / det[:, None, None, :]


def element_update(model: LoweredModel,
                   position: jnp.ndarray,   # (3, N)
                   d_disp: jnp.ndarray,     # (3, N)
                   stress: jnp.ndarray,     # (6, 8, E)
                   strain: jnp.ndarray,     # (6, 8, E)
                   eq_ps: jnp.ndarray,      # (8, E)
                   yield_s: jnp.ndarray,    # (8, E)
                   element_flag: jnp.ndarray,  # (E,) bool
                   ) -> ElementResult:
    pusai = model.pusai                       # (8, 3, 8)
    elem = model.elem                         # (8, E)

    pos_e = position[:, elem]                 # (3, 8, E)
    du = d_disp[:, elem]                      # (3, 8, E)

    # Jacobians at each Gauss point: J[k,a,b] = sum_i pusai[k,a,i] pos[b,i]
    J = jnp.einsum("kai,bie->kabe", pusai, pos_e)       # (8,3,3,E)
    detJ = _det3(J)                                     # (8, E) raw (signed)
    neg = jnp.sum((detJ < 0) & element_flag[None, :], dtype=jnp.int32)
    # V and BVbar use |detJ| (cal_BVbar_hexa, HAKAI_j.jl:1736-1740);
    # the Qe weight uses the raw detJ (cal_Bfinal, HAKAI_j.jl:1442).
    detJ_abs = jnp.abs(detJ)
    # guard padded/degenerate elements against 0/0
    safe_det = jnp.where(detJ == 0, 1.0, detJ)
    invJ = _inv3(J, safe_det)                           # (8,3,3,E)
    P = jnp.einsum("kabe,kbi->kaie", invJ, pusai)       # (8,3,8,E) dN/dx

    V = detJ_abs.sum(axis=0)                            # (E,)
    safe_V = jnp.where(V == 0, 1.0, V)

    # displacement gradient g[k,a,b] = d u_b / d x_a
    g = jnp.einsum("kaie,bie->kabe", P, du)             # (8,3,3,E)
    tr = g[:, 0, 0] + g[:, 1, 1] + g[:, 2, 2]           # (8, E)
    volbar = (detJ_abs * tr).sum(axis=0) / (3.0 * safe_V)   # (E,)

    de = jnp.stack([
        g[:, 0, 0] - tr / 3.0 + volbar[None, :],
        g[:, 1, 1] - tr / 3.0 + volbar[None, :],
        g[:, 2, 2] - tr / 3.0 + volbar[None, :],
        g[:, 0, 1] + g[:, 1, 0],
        g[:, 1, 2] + g[:, 2, 1],
        g[:, 0, 2] + g[:, 2, 0],
    ])                                                  # (6, 8, E)

    lam = model.lam_e                                   # (E,)
    G = model.G_e
    tr_de = de[0] + de[1] + de[2]                       # (8,E) == 3*volbar
    dsig = jnp.concatenate([
        lam * tr_de[None] + 2.0 * G * de[:3],
        G * de[3:],
    ])                                                  # (6, 8, E)

    trial = stress + dsig
    mean_s = (trial[0] + trial[1] + trial[2]) / 3.0     # (8,E)
    dev = trial - jnp.concatenate([jnp.broadcast_to(mean_s[None], (3,) + mean_s.shape),
                                   jnp.zeros((3,) + mean_s.shape, trial.dtype)])
    vm = jnp.sqrt(1.5 * (dev[0]**2 + dev[1]**2 + dev[2]**2
                         + 2.0 * (dev[3]**2 + dev[4]**2 + dev[5]**2)))

    # --- J2 radial return with piecewise-linear isotropic hardening
    # (HAKAI_j.jl:1227-1285). Hardening slope index: first table row j (1-based
    # >=2) with eq_ps <= strain[j], minus one (HAKAI_j.jl:1254-1264).
    mat = model.mat_id                                  # (E,)
    pstr = model.pl_strain[mat]                         # (E, P) padded +inf
    npp = model.pl_n[mat]                               # (E,)
    cnt = jnp.sum(pstr[None, :, 1:] < eq_ps[:, :, None], axis=-1)  # (8,E)
    pidx = jnp.minimum(cnt, jnp.maximum(npp - 2, 0)[None, :])      # (8,E)
    H = jnp.take_along_axis(model.pl_Hd[mat], pidx.T, axis=1).T    # (8,E)

    is_plastic = model.has_plastic_e[None, :] & (vm > yield_s) & element_flag[None, :]
    safe_vm = jnp.where(vm == 0, 1.0, vm)
    d_ep = jnp.where(is_plastic, (vm - yield_s) / (3.0 * G + H), 0.0)
    scale = jnp.where(is_plastic, (yield_s + H * d_ep) / safe_vm, 1.0)
    final = dev * scale[None] + jnp.concatenate([
        jnp.broadcast_to(mean_s[None], (3,) + mean_s.shape),
        jnp.zeros((3,) + mean_s.shape, trial.dtype)])
    final = jnp.where(is_plastic[None], final, trial)

    alive = element_flag[None, :]                        # (1,E) broadcast to (8,E)
    new_eq = jnp.where(alive & is_plastic, eq_ps + d_ep, eq_ps)
    new_y = jnp.where(alive & is_plastic, yield_s + H * d_ep, yield_s)
    new_stress = jnp.where(alive[None], final, stress)
    new_strain = jnp.where(alive[None], strain + de, strain)

    # --- internal force ---
    sig_m = (final[0] + final[1] + final[2]) / 3.0       # (8,E)
    # full stress tensor (8,3,3,E)
    s = final
    sig_t = jnp.stack([
        jnp.stack([s[0], s[3], s[5]], axis=1),
        jnp.stack([s[3], s[1], s[4]], axis=1),
        jnp.stack([s[5], s[4], s[2]], axis=1),
    ], axis=1)
    Pbar = jnp.einsum("ke,kbie->bie", detJ_abs, P) / safe_V   # (3,8,E)
    w = detJ                                             # raw weights
    Qe = (jnp.einsum("ke,kaie,kabe->bie", w, P, sig_t)
          - jnp.einsum("ke,kbie->bie", w * sig_m, P)
          + Pbar * (w * sig_m).sum(axis=0))
    Qe = jnp.where(element_flag[None, None, :], Qe, 0.0)

    return ElementResult(Qe, new_stress, new_strain, new_eq, new_y, neg)


def assemble_internal_force(model: LoweredModel, Qe: jnp.ndarray) -> jnp.ndarray:
    """Deterministic gather-based Qe -> Q assembly.

    Replaces the serial scatter of HAKAI_j.jl:668-675 (and the per-thread
    Float128 buffer trick at :435,511-517) with a precomputed incidence table:
    each node sums its (element, slot) contributions in a fixed order.
    """
    qf = Qe.reshape(3, -1)                   # (3, 8*E), index i*E+e
    gathered = qf[:, model.inc_idx]          # (3, V, N)
    return jnp.where(model.inc_mask[None], gathered, 0.0).sum(axis=1)


def triax_stress(stress: jnp.ndarray, eps: float = 1e-10) -> jnp.ndarray:
    """Stress triaxiality sigma_m / sigma_eq per integration point.

    The reference computes principal stresses with ``eigvals`` and forms the
    equivalent stress from them (cal_triax_stress, HAKAI_j.jl:982-1022); that
    equals the von Mises stress computed directly from components, so no
    eigendecomposition is needed:
      0.5*((p1-p2)^2+(p2-p3)^2+(p3-p1)^2) ==
      0.5*((sx-sy)^2+(sy-sz)^2+(sx-sz)^2) + 3*(txy^2+tyz^2+txz^2).
    Points with sigma_eq < 1e-10 keep triaxiality 0 (HAKAI_j.jl:1012-1014).
    """
    sx, sy, sz, txy, tyz, txz = (stress[i] for i in range(6))
    vm = jnp.sqrt(0.5 * ((sx - sy)**2 + (sy - sz)**2 + (sx - sz)**2
                         + 6.0 * (txy**2 + tyz**2 + txz**2)))
    mean = (sx + sy + sz) / 3.0
    return jnp.where(vm < eps, 0.0, mean / jnp.where(vm == 0, 1.0, vm))
