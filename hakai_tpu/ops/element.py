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

TPU mapping: every contraction over the tiny node/axis dims (8 and 3) is
*unrolled in Python* into fused multiply-adds on ``(8, E)`` arrays — Gauss
points on sublanes, elements on lanes.  XLA fuses the whole update into a few
elementwise kernels; no small matmuls or transposes are emitted (einsum over
3x3xE batches compiles ~30x slower on v5e).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.lowering import LoweredModel
from .gather_pallas import blocked_assemble, blocked_gather
from .shape import _DELTA, _G, _GC, pusai_hexa

# static shape-gradient coefficients, unrolled at trace time
_PUS = pusai_hexa(8)          # (8 gauss, 3 axis, 8 node) float64 numpy

# --- tensor-product structure of the trilinear basis (shape.py):
#   pus[k,a,i] = 0.125*(P0_i + g*G1_k*P1_i + g*G2_k*P2_i + g^2*G1G2_k*P3_i)
# with node sign patterns P* in {+-1}^8 and Gauss sign vectors G* in
# {+-1}^8 (g = 1/sqrt(3)).  The i-contractions (J, Gdu) collapse to 7
# signed node moments per displacement component, and the k-contraction
# (Qe) to 4 signed Gauss moments per (c, b) — ~2x fewer build flops and,
# critically, no rank-1 slices of pos/du anywhere (XLA materialized those
# as (1,1,E) T(1,128) buffers at ~150 GB/s in the 1M profile).
_MOM_PATS = np.stack([
    _DELTA[:, 0], _DELTA[:, 1], _DELTA[:, 2],
    _DELTA[:, 0] * _DELTA[:, 1], _DELTA[:, 0] * _DELTA[:, 2],
    _DELTA[:, 1] * _DELTA[:, 2],
    _DELTA[:, 0] * _DELTA[:, 1] * _DELTA[:, 2]])          # (7 pat, 8 node)
_AXIS_MOM = ((0, 3, 4, 6), (1, 3, 5, 6), (2, 4, 5, 6))    # pattern ids/axis
_GSIGN = _GC / _G                                         # (8 gauss, 3) +-1
_AXIS_G = ((1, 2), (0, 2), (0, 1))                        # modulating axes


class ElementResult(NamedTuple):
    Qe: jnp.ndarray        # (3, 8, E) nodal internal forces (axis, node-slot, elem)
    stress: jnp.ndarray    # (6, 8, E) updated Cauchy stress
    strain: jnp.ndarray    # (6, E) updated accumulated GP-mean strain
    eq_ps: jnp.ndarray     # (8, E)
    yield_s: jnp.ndarray   # (8, E)
    neg_jacobian: jnp.ndarray  # () int32 count of negative detJ (diagnostic)


def _jacobian(pos_e, dtype):
    """J[a][b] as (8,E) arrays: J_ab = sum_i pusai[k,a,i] * pos[b,i,e]
    (moment form — every _MOM_PATS pattern sums to zero over the nodes, so
    the result is translation-invariant like the direct contraction)."""
    return _expand_axis_moments(_node_moments(pos_e, dtype), dtype)


def _det3(J):
    return (J[0][0] * J[1][1] * J[2][2] + J[0][1] * J[1][2] * J[2][0]
            + J[0][2] * J[1][0] * J[2][1] - J[0][0] * J[1][2] * J[2][1]
            - J[0][1] * J[1][0] * J[2][2] - J[0][2] * J[1][1] * J[2][0])


def _inv3(J, inv_det):
    """inv[b][a] = cofactor(a,b) * inv_det (cyclic-index form, sign built in;
    matches the reference's closed-form inverse, HAKAI_j.jl:1445-1455)."""
    inv = [[None] * 3 for _ in range(3)]
    for a in range(3):
        a1, a2 = (a + 1) % 3, (a + 2) % 3
        for b in range(3):
            b1, b2 = (b + 1) % 3, (b + 2) % 3
            inv[b][a] = (J[a1][b1] * J[a2][b2]
                         - J[a1][b2] * J[a2][b1]) * inv_det
    return inv


def gather_element_nodes(model: LoweredModel, position, d_disp):
    """(3,N) nodal fields -> per-element (3,8,E) copies."""
    E = model.elem.shape[1]
    if model.plan_pos is not None:
        g6 = blocked_gather(jnp.concatenate([position, d_disp], axis=0),
                            model.plan_pos)           # (6, 8E)
        return g6[:3].reshape(3, 8, E), g6[3:].reshape(3, 8, E)
    return position[:, model.elem], d_disp[:, model.elem]


def gather_disp_e(model: LoweredModel, disp: jnp.ndarray) -> jnp.ndarray:
    """(3,N) displacement -> (3,8,E) element-node copies (3-channel gather;
    the fast chunk loop keeps this as a carried value so each step gathers
    only the new displacement instead of position *and* increment)."""
    E = model.elem.shape[1]
    if model.plan_pos is not None:
        g = blocked_gather(disp, model.plan_pos)
        return g.reshape(3, 8, E)
    return disp[:, model.elem]


def element_update(model: LoweredModel,
                   position: jnp.ndarray,   # (3, N)
                   d_disp: jnp.ndarray,     # (3, N)
                   stress: jnp.ndarray,     # (6, 8, E)
                   strain: jnp.ndarray,     # (6, E) GP-mean accumulator
                   eq_ps: jnp.ndarray,      # (8, E)
                   yield_s: jnp.ndarray,    # (8, E)
                   element_flag: jnp.ndarray,  # (E,) bool
                   ) -> ElementResult:
    pos_e, du = gather_element_nodes(model, position, d_disp)
    return element_core(model, pos_e, du, stress, strain, eq_ps, yield_s,
                        element_flag)


def pallas_core_ok(model: LoweredModel, E: int, dt) -> bool:
    """Eligibility for the fused Pallas element kernel: f32 math (TPU
    custom calls cannot take f64), tile-divisible element count, TPU
    backend.  ``element_kernel="auto"`` resolves to the MXU-assisted
    packed kernel when these hold — measured on a v5e chip it beats the
    fused XLA path in BOTH regimes (131k: 1.67e8 vs 1.56e8 elem-steps/s;
    1M: 1.285e8 vs 6.98e7; car-crash-N22k mixed: neutral at 1259 vs
    1255 us/step; docs/PERF.md round-3).  The earlier non-MXU packed
    variant ("pallas", kept as an opt-in) lost to XLA 1.7 ms vs 0.6 ms at
    131k — Mosaic serializes the unrolled elementwise graph; moving the
    constant contractions to the systolic array is what flipped the
    verdict."""
    if model.config.element_kernel not in ("auto", "pallas", "pallas_mxu"):
        return False
    import os
    backend_ok = jax.default_backend() == "tpu"
    if not backend_ok and os.environ.get("HAKAI_PALLAS_FORCE") == "1":
        # test knob: drive the packed fast paths on the CPU backend (the
        # kernels fall back to interpret mode there).  Warn once — if this
        # leaks into a real run it is orders of magnitude slower than the
        # XLA path.
        backend_ok = True
        if not getattr(pallas_core_ok, "_force_warned", False):
            pallas_core_ok._force_warned = True
            import warnings
            warnings.warn("HAKAI_PALLAS_FORCE=1: running the packed Pallas "
                          "element kernel in interpret mode on a non-TPU "
                          "backend (test knob; very slow)")
    return (backend_ok
            and jnp.dtype(dt) == jnp.float32
            and E % _TILE_E == 0 and E >= _TILE_E)


def element_core(model: LoweredModel,
                 pos_e: jnp.ndarray,        # (3, 8, E)
                 du: jnp.ndarray,           # (3, 8, E)
                 stress: jnp.ndarray,       # (6, 8, E)
                 strain: jnp.ndarray,       # (6, E) GP-mean accumulator
                 eq_ps: jnp.ndarray,        # (8, E)
                 yield_s: jnp.ndarray,      # (8, E)
                 element_flag: jnp.ndarray,  # (E,) bool
                 ) -> ElementResult:
    """Dispatch: fused Pallas kernel when eligible (see pallas_core_ok),
    fused XLA otherwise (f64, CPU, or tile-indivisible meshes)."""
    if pallas_core_ok(model, pos_e.shape[-1], pos_e.dtype):
        from .element_pallas import element_core_pallas
        res = element_core_pallas(model, pos_e, du, stress, strain, eq_ps,
                                  yield_s, element_flag)
        if model.config.metrics_path is not None:
            # neg-Jacobian diagnostic on demand (costs a J recompute)
            neg = jnp.sum(_det_sign_negative(pos_e) & element_flag[None, :],
                          dtype=jnp.int32)
            res = res._replace(neg_jacobian=neg)
        return res
    qe, s_c, e_c, eq, y, _ = _math_maybe_slabbed(
        model, model.pl_tables, model.mat_id, model.G_e, model.lam_e,
        model.has_plastic_e, jnp.asarray(_PUS, pos_e.dtype), pos_e, du,
        [stress[c] for c in range(6)], [strain[c] for c in range(6)],
        eq_ps, yield_s, element_flag)
    neg = jnp.sum((_det_sign_negative(pos_e) & element_flag[None, :]),
                  dtype=jnp.int32)
    return ElementResult(qe, jnp.stack(s_c), jnp.stack(e_c), eq, y, neg)


def element_kinematics(coord_e, disp_e, disp_e_prev, edt, E: int):
    """pos_e/du_e for the fast chunk loop from the carried disp_e.

    coord_e is centered on each element's node 0; centering the displacement
    copies the same way keeps pos_e well-conditioned in f32 for meshes far
    from the origin (J is translation-invariant), and the differences cancel
    in the (possibly wider) kinematic dtype BEFORE the edtype cast.
    """
    return (coord_e + (disp_e - disp_e[:, 0:1, :]).astype(edt),
            (disp_e - disp_e_prev).astype(edt))


def element_core_c(model: LoweredModel, pos_e, du, stress_c, strain_c,
                   eq_ps, yield_s, element_flag, pre_centered=False):
    """Component-list variant (6 x (8,E) stress, 6 x (E,) GP-mean strain in
    and out) — used by the fast chunk loop to avoid materializing stacked
    state every step.
    pre_centered=True asserts pos_e's node-0 row is exactly zero
    (element_kinematics output) so the math can skip re-centering."""
    return _math_maybe_slabbed(
        model, model.pl_tables, model.mat_id, model.G_e, model.lam_e,
        model.has_plastic_e, jnp.asarray(_PUS, pos_e.dtype), pos_e, du,
        stress_c, strain_c, eq_ps, yield_s, element_flag,
        pre_centered=pre_centered)


def _rows_of(x):
    """(3, 8, B) array -> nested [b][i] list of (B,) rows (identity on an
    already-listed input)."""
    if isinstance(x, (list, tuple)):
        return x
    return [[x[b, i] for i in range(8)] for b in range(3)]


def _stack_qe(qe):
    """Stack nested qe rows into (3, 8, B); identity on an array."""
    if isinstance(qe, (list, tuple)):
        return jnp.stack([jnp.stack(r) for r in qe])
    return qe


def _resolve_slab(model: LoweredModel, E: int) -> int:
    """Element-slab size for the HBM-spill regime.  The element math holds
    ~100 live (8, slab) temporaries; at 131k elements they are VMEM-resident
    and fusions run at ~2 TB/s, while at 1M they spill to HBM and drop to
    ~400 GB/s (docs/PERF.md, 1M-element regime).  Slabbing the purely
    element-local math over a fori_loop keeps every slab's working set
    VMEM-resident; HBM then only carries each input/output once."""
    slab = model.config.elem_slab
    if slab <= 0 or E <= slab:
        return 0
    return slab


def _math_maybe_slabbed(model, pl_tables, mat_id, G_e, lam_e, has_plastic_e,
                        pus, pos_e, du, stress, strain, eq_ps, yield_s,
                        element_flag, pre_centered=False):
    E = pos_e.shape[-1]
    slab = _resolve_slab(model, E)
    if not slab:
        return _element_math(pl_tables, mat_id, G_e, lam_e, has_plastic_e,
                             pus, pos_e, du, stress, strain, eq_ps, yield_s,
                             element_flag, pre_centered=pre_centered)
    n = -(-E // slab)
    z = jnp.zeros((), jnp.int32)

    def sl(a, start):
        idx = (z,) * (a.ndim - 1) + (start,)
        return jax.lax.dynamic_slice(a, idx, a.shape[:-1] + (slab,))

    def run_slab(start):
        return _element_math(
            pl_tables, sl(mat_id, start), sl(G_e, start), sl(lam_e, start),
            sl(has_plastic_e, start), pus, sl(pos_e, start), sl(du, start),
            [sl(s, start) for s in stress], [sl(e, start) for e in strain],
            sl(eq_ps, start), sl(yield_s, start), sl(element_flag, start),
            pre_centered=pre_centered)

    shapes = jax.eval_shape(run_slab, jnp.zeros((), jnp.int32))

    def full(sd):
        return jnp.zeros(sd.shape[:-1] + (E,), sd.dtype)

    init = jax.tree_util.tree_map(full, shapes)

    def body(k, outs):
        # the last slab clamps to E-slab: its overlap with the previous slab
        # recomputes identical values, so the overlapping writes agree
        start = jnp.minimum(k * slab, jnp.int32(E - slab))
        res = run_slab(start)

        def put(dst, src):
            idx = (z,) * (dst.ndim - 1) + (start,)
            return jax.lax.dynamic_update_slice(dst, src, idx)

        return jax.tree_util.tree_map(put, outs, res)

    return jax.lax.fori_loop(0, n, body, init)


_TILE_E = 1024
# phys-layout assembly only above this element count (see
# assemble_internal_force; measured crossover between the 131k and 1M bars)
_PHYS_ASM_MIN_E = 400_000
# moment-form J/Gdu/Qe builds only above this element-block size (the
# sublane reduces cost more vector ops than the direct 8-FMA contraction,
# which wins while temporaries are VMEM-resident; in the HBM-spill regime
# the moment form removes the T(1,128) slice materializations)
_MOMENT_MIN_B = 400_000


def _det_sign_negative(pos_e):
    J = _jacobian(pos_e, pos_e.dtype)
    return _det3(J) < 0


def _w(c, a, b):
    """Broadcasting select via lax.select (jnp.where's closed_call wrapper
    breaks the lowering cache inside Pallas kernel bodies)."""
    dt = jnp.result_type(a, b)
    shape = jnp.broadcast_shapes(jnp.shape(c), jnp.shape(a), jnp.shape(b))
    return jax.lax.select(jnp.broadcast_to(c, shape),
                          jnp.broadcast_to(jnp.asarray(a, dt), shape),
                          jnp.broadcast_to(jnp.asarray(b, dt), shape))


def _hardening_slope_tab(pl_tables, mat, eq_ps):
    """As _hardening_slope but with explicit (static tables, mat ids)."""
    H = jnp.zeros(eq_ps.shape, eq_ps.dtype)
    for m, tab in enumerate(pl_tables):
        npp = len(tab)
        if npp < 2:
            continue
        strains = [row[1] for row in tab]
        Hd = [(tab[j + 1][0] - tab[j][0]) / (tab[j + 1][1] - tab[j][1])
              for j in range(npp - 1)]
        cnt = jnp.zeros(eq_ps.shape, jnp.int32)
        for j in range(1, npp):
            cnt = cnt + (eq_ps > strains[j]).astype(jnp.int32)
        pidx = jnp.minimum(cnt, npp - 2)
        Hm = jnp.full(eq_ps.shape, Hd[npp - 2], eq_ps.dtype)
        for j in range(npp - 3, -1, -1):
            Hm = _w(pidx == j, Hd[j], Hm)
        H = _w((mat == m)[None, :], Hm, H)
    return H


def _node_moments(x, dtype):
    """(3, 8, B) nodal field -> [b][p] signed node moments (B,) for the 7
    patterns in _MOM_PATS (sublane-weighted reduces; reads x in its natural
    (8, B) layout — no rank-1 row slices)."""
    out = []
    for b in range(3):
        xb = x[b]                                       # (8, B)
        mb = []
        for p in range(7):
            w = jnp.asarray(_MOM_PATS[p][:, None], dtype)
            mb.append((xb * w).sum(axis=0))             # (B,)
        out.append(mb)
    return out


def _expand_axis_moments(mom, dtype):
    """[b][p] node moments -> [a][b] (8 Gauss, B) parent-space gradients
    (J when fed position moments, Gdu when fed displacement moments)."""
    out = [[None] * 3 for _ in range(3)]
    for a in range(3):
        i0, i1, i2, i3 = _AXIS_MOM[a]
        g1, g2 = _AXIS_G[a]
        c1 = jnp.asarray(0.125 * _G * _GSIGN[:, g1][:, None], dtype)
        c2 = jnp.asarray(0.125 * _G * _GSIGN[:, g2][:, None], dtype)
        c3 = jnp.asarray(
            0.125 * _G * _G * (_GSIGN[:, g1] * _GSIGN[:, g2])[:, None], dtype)
        for b in range(3):
            out[a][b] = ((0.125 * mom[b][i0])[None, :]
                         + c1 * mom[b][i1][None, :]
                         + c2 * mom[b][i2][None, :]
                         + c3 * mom[b][i3][None, :])    # (8, B)
    return out


def _gp_sum(x, in_pallas):
    """Sum an (8, B) Gauss-point stack over sublanes.

    Mosaic under jax >= 0.9 (shape_invariant_numerics) rejects
    ``vector.multi_reduction`` when the input layout carries sublane
    offsets — which row-sliced operands inside the Pallas kernels do — so
    Pallas callers reduce by halving adds instead (the relayout copies the
    adds force are legal; same value up to f32 rounding order)."""
    if not in_pallas:
        return x.sum(axis=0)
    a = x[0:4] + x[4:8]
    b = a[0:2] + a[2:4]
    return (b[0:1] + b[1:2])[0]


def _element_math(pl_tables, mat_id, G_e, lam_e, has_plastic_e, pus,
                  pos_e, du, stress, strain, eq_ps, yield_s, element_flag,
                  pre_centered=False, in_pallas=False):
    """Pure B-bar + radial-return + internal-force math on (…, B) arrays.

    Written against lax primitives only so it can run both as a plain traced
    function and inside a Pallas kernel body.  ``stress`` is a 6-component
    sequence of (8,B) arrays in and out (avoids materializing (6,8,B)
    stacks — worth ~0.3 ms/step at 131k elements); ``strain`` is a
    6-component sequence of (B,) GP-MEAN accumulators (see new_strain
    below).  Returns (Qe, stress6, strain6, eq_ps, yield_s).
    """
    dtype = pos_e.dtype

    # Center coordinates on each element's first node before the Jacobian.
    # J is translation-invariant, and in f32 this removes the catastrophic
    # loss of significance for meshes far from the origin (e.g. the car decks
    # span ~3000 mm with ~1 mm elements: raw f32 positions quantize at
    # ~2.4e-4 mm, injecting ~2% strain noise per step that destabilizes the
    # run; the f64 reference never sees this).  The fast chunk paths build
    # pos_e = coord_e + (disp_e - disp_e[node0]) from the lowering-time
    # node-0-centered coord_e, so their row 0 is exactly zero and they pass
    # pre_centered=True to skip the re-centering subtracts.
    if not pre_centered:
        pos_e = pos_e - pos_e[:, 0:1, :]

    # jacobian: J[a][b] = sum_i pus[k,a,i] * pos[b,i].  Two equivalent
    # builds: the direct 8-FMA contraction (fewer vector ops — wins while
    # every temporary is VMEM-resident) and the 7-signed-node-moment form
    # (see _MOM_PATS — no rank-1 pos/du slices for XLA to materialize as
    # T(1,128) buffers, wins in the HBM-spill regime; measured crossover
    # ~400k elements, same gate as the phys-layout assembly).
    use_moments = pos_e.shape[-1] >= _MOMENT_MIN_B
    if use_moments:
        J = _expand_axis_moments(_node_moments(pos_e, dtype), dtype)
    else:
        J = [[None] * 3 for _ in range(3)]
        for a in range(3):
            for b in range(3):
                acc = pus[:, a, 1:2] * pos_e[b, 1][None, :]
                for i in range(2, 8):
                    acc = acc + pus[:, a, i:i + 1] * pos_e[b, i][None, :]
                J[a][b] = acc                           # (8, B)
    detJ = _det3(J)                                     # (8, B) raw (signed)
    # V and BVbar use |detJ| (cal_BVbar_hexa, HAKAI_j.jl:1736-1740);
    # the Qe weight uses the raw detJ (cal_Bfinal, HAKAI_j.jl:1442).
    detJ_abs = jnp.abs(detJ)
    inv_det = 1.0 / _w(detJ == 0, 1.0, detJ)
    invJ = _inv3(J, inv_det)

    # The physical shape-function gradients P[a][i] = dN_i/dx_a
    # (= sum_c invJ[a][c]*pus[k,c,i]) are never materialized: 24 (8,B)
    # arrays (~100 MB at 131k elements) that XLA would round-trip through
    # HBM between the strain and force fusions.  Instead the constant pus
    # contraction is pushed to the outside of every use of P (the contraction
    # order is reassociated; same math as cal_Bfinal, HAKAI_j.jl:1415-1519).

    V = _gp_sum(detJ_abs, in_pallas)                    # (B,)
    inv_V = 1.0 / _w(V == 0, 1.0, V)

    # displacement gradient g[a][b] = d u_b / d x_a
    #   = sum_i P[a][i] du[b,i] = sum_c invJ[a][c] * Gdu[c][b]
    # with Gdu[c][b] = sum_i pus[k,c,i] du[b,i] (reference-coordinate grad).
    if use_moments:
        Gdu = _expand_axis_moments(_node_moments(du, dtype), dtype)
    else:
        Gdu = [[None] * 3 for _ in range(3)]
        for c in range(3):
            for b in range(3):
                acc = pus[:, c, 0:1] * du[b, 0][None, :]
                for i in range(1, 8):
                    acc = acc + pus[:, c, i:i + 1] * du[b, i][None, :]
                Gdu[c][b] = acc                         # (8, B)
    g = [[None] * 3 for _ in range(3)]
    for a in range(3):
        for b in range(3):
            acc = invJ[a][0] * Gdu[0][b]
            for c in range(1, 3):
                acc = acc + invJ[a][c] * Gdu[c][b]
            g[a][b] = acc                               # (8, B)
    tr = g[0][0] + g[1][1] + g[2][2]
    volbar = (_gp_sum(detJ_abs * tr, in_pallas) * inv_V / 3.0)[None, :]

    de = [
        g[0][0] - tr / 3.0 + volbar,
        g[1][1] - tr / 3.0 + volbar,
        g[2][2] - tr / 3.0 + volbar,
        g[0][1] + g[1][0],
        g[1][2] + g[2][1],
        g[0][2] + g[2][0],
    ]                                                   # 6 x (8, B)

    tr_de = 3.0 * volbar                                # == de[0]+de[1]+de[2]
    dsig = [lam_e * tr_de + 2.0 * G_e * de[c] for c in range(3)] + \
           [G_e * de[c] for c in range(3, 6)]           # 6 x (8, B)

    trial = [stress[c] + dsig[c] for c in range(6)]
    mean_s = (trial[0] + trial[1] + trial[2]) / 3.0     # (8,B)
    dev = [trial[0] - mean_s, trial[1] - mean_s, trial[2] - mean_s,
           trial[3], trial[4], trial[5]]
    vm = jnp.sqrt(1.5 * (dev[0]**2 + dev[1]**2 + dev[2]**2
                         + 2.0 * (dev[3]**2 + dev[4]**2 + dev[5]**2)))

    # --- J2 radial return with piecewise-linear isotropic hardening
    # (HAKAI_j.jl:1227-1285); table walk unrolled per material.
    H = _hardening_slope_tab(pl_tables, mat_id, eq_ps)             # (8,B)

    is_plastic = has_plastic_e[None, :] & (vm > yield_s) \
        & element_flag[None, :]
    safe_vm = _w(vm == 0, 1.0, vm)
    d_ep = _w(is_plastic, (vm - yield_s) / (3.0 * G_e + H), 0.0)
    scale = _w(is_plastic, (yield_s + H * d_ep) / safe_vm, 1.0)
    final = [_w(is_plastic, dev[c] * scale + (mean_s if c < 3 else 0.0),
                trial[c]) for c in range(6)]

    # No per-step alive-select on stress/strain: padding lanes stay exactly
    # zero through the whole pipeline (pos_e rows are exact zeros -> detJ=0
    # -> guarded inv_V/invJ -> de=0 -> trial=stress=0), and dead lanes under
    # fracture carry don't-care values that every consumer masks by flag
    # (qe below, triax + the chunk-exit zeroing in solver/parallel steppers,
    # erode's full-flag mask on the generic path).  eq/yield keep the
    # is_plastic gate, which already includes element_flag, so dead lanes
    # stay frozen exactly as the reference leaves them (HAKAI_j.jl:744-757).
    new_eq = _w(is_plastic, eq_ps + d_ep, eq_ps)
    new_y = _w(is_plastic, yield_s + H * d_ep, yield_s)
    new_stress = final
    # Accumulated strain is carried as the GP MEAN, (B,) per component: the
    # per-GP tensor is write-only state in the reference — its only consumer
    # is the output node-averaging, which takes the GP mean first
    # (cal_node_stress_strain, HAKAI_j.jl:3436), and the erosion zeroing
    # (HAKAI_j.jl:750-755) commutes with the mean.  mean(sum_t de) ==
    # sum_t mean(de) exactly (x0.125 is an exact scaling), so accumulating
    # the mean is the same math with 8x less state traffic.  NB the
    # *rounding order* differs from per-GP accumulation (the mean rounds
    # once per step), so long-run strain output can drift from a bitwise
    # reference dump at ulp level — same values in real arithmetic, and
    # strain is write-only diagnostic state (oracle parity tests pass).
    new_strain = [strain[c] + 0.125 * _gp_sum(de[c], in_pallas)
                  for c in range(6)]

    # Measured negative result (round 3): computing triaxiality here "for
    # free" from the return map (mean preserved; final vm = new yield for
    # plastic points, trial vm otherwise) regressed BOTH regimes — 131k
    # 1.47e8 -> 1.44e8 and 1M 7.2e7 -> 6.7e7 elem-steps/s — because the
    # extra vm_f/mean_s consumers make XLA restructure the state-update
    # fusion (more live values -> more spill) by more than the standalone
    # triax re-read fusion costs.  Callers keep triax_components.
    triax = None

    # --- internal force ---
    # f_k[i,b] = sum_a P[a][i] sig[a,b] - (P[b][i] - Pbar[b,i]) sig_m
    # Qe[b,i]  = sum_k detJ_k f_k[i,b]   (W=1)
    # With P[a][i] = sum_c invJ[a][c] pus[k,c,i], every P use folds into
    #   Qe[b,i] = sum_c sum_k pus[k,c,i] * M[c][b][k]
    # where the 9 moment arrays
    #   M[c][b] = w*(sum_a invJ[a][c] s_t[a][b] - invJ[b][c] sig_m)
    #             + wdet*invJ[b][c]*sum_w_sig_m
    # carry all the element-dependent data; pus entries are compile-time
    # scalars, so the final contraction is a constant-coefficient k-sum.
    sig_m = (final[0] + final[1] + final[2]) / 3.0       # (8,B)
    s_t = [[final[0], final[3], final[5]],
           [final[3], final[1], final[4]],
           [final[5], final[4], final[2]]]
    w = detJ
    sum_w_sig_m = _gp_sum(w * sig_m, in_pallas)          # (B,)
    wdet = detJ_abs * inv_V                              # (8,B) Pbar weights
    M = [[None] * 3 for _ in range(3)]
    for c in range(3):
        for b in range(3):
            acc = invJ[0][c] * s_t[0][b] + invJ[1][c] * s_t[1][b] \
                + invJ[2][c] * s_t[2][b]
            acc = acc - invJ[b][c] * sig_m
            M[c][b] = w * acc + wdet * (invJ[b][c] * sum_w_sig_m[None, :])
    if use_moments:
        # Qe[b,i] = sum_c sum_k pus[k,c,i]*M[c][b][k]: contract over Gauss k
        # first (4 signed Gauss moments per (c,b)), then expand over nodes i
        # with constant sign columns.  Qe builds as ONE (3, 8, B) sum of 12
        # (c, t) outer terms — stacking three per-b (8, B) partials made XLA
        # emit them as (1, 8, B) T(1,128) buffers plus a transposed-layout
        # stack (~1.5 ms of 185 GB/s fusions + a relayout copy at 1M).
        Qe = None
        for c in range(3):
            i0, i1, i2, i3 = _AXIS_MOM[c]
            g1, g2 = _AXIS_G[c]
            w1 = jnp.asarray(_GSIGN[:, g1][:, None], dtype)
            w2 = jnp.asarray(_GSIGN[:, g2][:, None], dtype)
            w12 = jnp.asarray((_GSIGN[:, g1] * _GSIGN[:, g2])[:, None], dtype)
            for ii, wk, sc in ((i0, None, 0.125), (i1, w1, 0.125 * _G),
                               (i2, w2, 0.125 * _G), (i3, w12,
                                                      0.125 * _G * _G)):
                # R[b] = sum_k wk_k * M[c][b][k]  -> (3, B)
                R = jnp.stack([_gp_sum(M[c][b] if wk is None
                                       else M[c][b] * wk, in_pallas)
                               for b in range(3)])
                pcol = jnp.asarray(sc * _MOM_PATS[ii][None, :, None], dtype)
                term = pcol * R[:, None, :]              # (3, 8, B)
                Qe = term if Qe is None else Qe + term
    else:
        rows = []
        for b in range(3):
            cols = []
            for i in range(8):
                t = pus[:, 0, i:i + 1] * M[0][b] \
                    + pus[:, 1, i:i + 1] * M[1][b] \
                    + pus[:, 2, i:i + 1] * M[2][b]
                cols.append(_gp_sum(t, in_pallas))       # (B,)
            rows.append(jnp.stack(cols))                 # (8, B)
        Qe = jnp.stack(rows)                             # (3, 8, B)
    Qe = _w(element_flag[None, None, :], Qe, 0.0)

    return Qe, new_stress, new_strain, new_eq, new_y, triax


def assemble_internal_force(model: LoweredModel, Qe: jnp.ndarray) -> jnp.ndarray:
    """Deterministic gather-based Qe -> Q assembly.

    Replaces the serial scatter of HAKAI_j.jl:668-675 (and the per-thread
    Float128 buffer trick at :435,511-517) with a precomputed incidence table:
    each node sums its (element, slot) contributions in a fixed order.
    """
    Qe = _stack_qe(Qe)
    if (model.plan_asm2 is not None and model.E >= _PHYS_ASM_MIN_E
            and jax.default_backend() == "tpu" and Qe.dtype.itemsize <= 4):
        # physical-layout kernel: takes (3, 8, E) directly — no channel
        # concat, no row-major relayout, one output write per node tile.
        # Only pays off in the HBM-spill regime (at 131k the row-space
        # gather it replaces is already cheap; at 1M it saves ~2 ms/step).
        from .gather_pallas import blocked_assemble_phys
        return blocked_assemble_phys(Qe, model.plan_asm2)[:, :model.N]
    qf = Qe.reshape(3, -1)                   # (3, 8*E), index i*E+e
    if model.plan_asm is not None and model.plan_asm.vl > 0:
        # in-kernel accumulation over the vl lanes (node-block-major plan)
        return blocked_assemble(qf, model.plan_asm)[:, :model.N]
    if model.plan_asm is not None:
        vals = blocked_gather(qf, model.plan_asm)         # (3, VL*N)
        vals = vals.reshape(3, model.asm_vl, model.N)
        return jnp.where(model.asm_mask[None], vals, 0.0).sum(axis=1)
    gathered = qf[:, model.inc_idx]          # (3, V, N)
    return jnp.where(model.inc_mask[None], gathered, 0.0).sum(axis=1)


def triax_components(s, eps: float = 1e-10) -> jnp.ndarray:
    """Triaxiality from a 6-component stress sequence (see triax_stress)."""
    sx, sy, sz, txy, tyz, txz = s
    vm = jnp.sqrt(0.5 * ((sx - sy)**2 + (sy - sz)**2 + (sx - sz)**2
                         + 6.0 * (txy**2 + tyz**2 + txz**2)))
    mean = (sx + sy + sz) / 3.0
    return jnp.where(vm < eps, 0.0, mean / jnp.where(vm == 0, 1.0, vm))


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
