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
from .gather_pallas import _I0, _lane_lookup


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
            eq_ref[:], y_ref[:], flag, in_pallas=True)
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
            spec((6, 8)), spec((6,)),                    # stress, strain(mean)
            spec((8,)), spec((8,)),                      # eq_ps, yield
            spec((1,)), spec((1,)), spec((1,)), spec((1,)), spec((1,)),
        ],
        out_specs=[
            spec((3, 8)), spec((6, 8)), spec((6,)), spec((8,)), spec((8,)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((3, 8, E), dt),
            jax.ShapeDtypeStruct((6, 8, E), dt),
            jax.ShapeDtypeStruct((6, E), dt),
            jax.ShapeDtypeStruct((8, E), dt),
            jax.ShapeDtypeStruct((8, E), dt),
        ],
        interpret=jax.default_backend() != "tpu",
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
        strain_c = [P_ref[48 + c] for c in range(6)]     # (TE,) GP-mean rows
        eq = P_ref[56:64]
        y = P_ref[64:72]
        pos_e = pos_ref[:].reshape(3, 8, TE)
        du = du_ref[:].reshape(3, 8, TE)
        qe, s_c, e_c, eq2, y2, _ = _el._element_math(
            pl_tables, mat, G, lam, hasp, pus_ref[:], pos_e, du,
            stress_c, strain_c, eq, y, flag, in_pallas=True)
        qe_ref[:] = _el._stack_qe(qe).reshape(24, TE)
        for c in range(6):
            P_out[8 * c:8 * (c + 1)] = s_c[c]
        # strain block written as one aligned 8-row tile (6 mean rows + the
        # 2 zero pad rows that keep eq/yield on sublane boundaries)
        P_out[48:56] = jnp.concatenate(
            [jnp.stack(e_c), jnp.zeros((2, TE), e_c[0].dtype)], axis=0)
        P_out[56:64] = eq2
        P_out[64:72] = y2
    return kernel


def element_core_packed(model: LoweredModel, pos24, du24, P, flag,
                        want_triax=False):
    """Packed-buffer variant for the chunk loop: the whole Gauss-point
    state travels as ONE (72, E) array (stress 0:48, GP-mean strain 48:54,
    rows 54:56 zero pad for sublane alignment, eq_ps 56:64, yield 64:72)
    and pos/du as (24, E) row blocks, so each
    grid step issues ~9 buffer DMAs instead of 22 — DMA-issue latency, not
    bandwidth or flops, dominated the many-buffer variant (measured 2.4 ms
    vs 0.68 ms XLA at 131k; this layout reaches ~0.3 ms).  ``want_triax``
    is honored by the MXU variant only (callers fall back to a post-kernel
    triax when the result is a 2-tuple)."""
    if model.config.element_kernel in ("pallas_mxu", "auto"):
        return element_core_packed_mxu(model, pos24, du24, P, flag,
                                       want_triax=want_triax)
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
            spec(72), spec(24), spec(24), spec(2), spec(2), spec(1),
        ],
        out_specs=[spec(72), spec(24)],
        out_shape=[jax.ShapeDtypeStruct((72, E), dt),
                   jax.ShapeDtypeStruct((24, E), dt)],
        interpret=jax.default_backend() != "tpu",
    )(jnp.asarray(_el._PUS, dt), P, pos24, du24, fstat, istat, flag_i)
    return P_new, qe


# ---------------------------------------------------------------------------
# MXU-assisted packed kernel ("pallas_mxu")
#
# The round-2 packed kernel loses to fused XLA because Mosaic issues the
# ~700-op unrolled elementwise graph at a 2-3x worse rate (docs/PERF.md).
# Three of the four big contraction blocks in the element math have
# CONSTANT coefficient tensors (the parent-space gradients pus[k,a,i]):
#
#   J[a][b][k]   = sum_i pus[k,a,i] * pos[b*8+i]      (jacobian)
#   Gdu[c][b][k] = sum_i pus[k,c,i] * du[b*8+i]       (reference-space grad)
#   Qe[b][i]     = sum_{c,k} pus[k,c,i] * M[c][b][k]  (internal-force fold)
#
# Each is a constant-matrix x element-batch product, so it runs on the MXU
# (systolic array) instead of the VPU: J/Gdu become C_J(72,24) @ x24(24,TE)
# and Qe becomes C_Q(24,72) @ M(72,TE).  That removes ~2/3 of the VPU
# instruction stream; only the genuinely data-dependent math (det/inv3,
# g = invJ*Gdu, the radial return, the M build) stays elementwise.
# f32 matmuls use precision=HIGHEST (6-pass bf16) so no bf16 noise enters
# the strain increments.
# ---------------------------------------------------------------------------

def _mxu_tables():
    """Constant MXU contraction matrices (float64 numpy).

    C_J[(a*3+b)*8+k, b*8+i] = pus[k,a,i]  -> J_flat  = C_J @ pos24
                                             Gdu_flat = C_J @ du24
    C_Q[b*8+i, (c*3+b)*8+k] = pus[k,c,i]  -> qe24    = C_Q @ M_flat
    Row group g = a*3+b (resp. c*3+b) holds the 8 Gauss rows of J[a][b]
    (resp. M[c][b]) so every consumer slice is one aligned (8, TE) tile.
    """
    import numpy as np
    CJ = np.zeros((72, 24))
    CQ = np.zeros((24, 72))
    for b in range(3):
        for k in range(8):
            for i in range(8):
                for a in range(3):
                    CJ[(a * 3 + b) * 8 + k, b * 8 + i] = _el._PUS[k, a, i]
                for c in range(3):
                    CQ[b * 8 + i, (c * 3 + b) * 8 + k] = _el._PUS[k, c, i]
    return CJ, CQ


def _make_mxu_kernel(pl_tables, TE, kin_inside=False, want_triax=False,
                     precision="highest", gplan=None):
    hi = jax.lax.Precision.HIGHEST
    dn = (((1,), (0,)), ((), ()))      # plain (M,K)@(K,N)

    def _dot(A, x, dtype):
        if precision != "high":
            return jax.lax.dot_general(A, x, dn, precision=hi,
                                       preferred_element_type=dtype)
        # manual bf16x3 (Mosaic rejects Precision.HIGH): split both
        # operands into bf16 hi+lo and drop only the lo*lo term, at
        # ~1e-6 relative error (vs f32's 1.2e-7).  The three cross terms
        # ride ONE K-stacked MXU pass, [Ah|Ah|Al] @ [xh;xl;xh] — the sum
        # happens inside the MXU's f32 accumulator, and the kernel is
        # MXU-stream bound (ablate_kernel_1m: dots alone are 2.7 of the
        # 3.7 ms at 1M), so pass count IS the kernel's critical path.
        # K > 42 is chunked so the stacked contraction stays <= 128.
        bf = jnp.bfloat16
        A_hi = A.astype(bf)
        A_lo = (A - A_hi.astype(A.dtype)).astype(bf)
        x_hi = x.astype(bf)
        x_lo = (x - x_hi.astype(x.dtype)).astype(bf)

        def d(a, b):
            return jax.lax.dot_general(a, b, dn,
                                       preferred_element_type=dtype)
        K = A.shape[1]
        c = K
        while 3 * c > 128:
            c = -(-c // 2)
        acc = None
        for k in range(0, K, c):
            W = jnp.concatenate([A_hi[:, k:k + c], A_hi[:, k:k + c],
                                 A_lo[:, k:k + c]], axis=1)
            X = jnp.concatenate([x_hi[k:k + c], x_lo[k:k + c],
                                 x_hi[k:k + c]], axis=0)
            r = d(W, X)
            acc = r if acc is None else acc + r
        return acc

    def kernel(*args):
        args = list(args)
        if gplan is not None:
            # fused in-kernel nodal gather (see gather_pallas.GatherPhysPlan)
            (ws_ref, soff_ref, lidx_ref, cj_ref, cq_ref, P_ref, pos_ref,
             fs_ref, is_ref, flag_ref, src_d, src_p) = args[:12]
            rest = args[12:]
            # rest = outputs then scratch: P_out, qe[, tri], win, V2,
            # kin_s, sems
            sems = rest.pop()
            kin_s = rest.pop()
            V2 = rest.pop()
            win = rest.pop()
            tri_ref = rest.pop() if want_triax else None
            P_out, qe_ref = rest
        else:
            cj_ref, cq_ref, P_ref, pos_ref, du_ref = args[:5]
            rest = args[5:]
            tri_ref = rest.pop() if want_triax else None
        if gplan is not None:
            pass
        elif kin_inside:
            dp_ref, fs_ref, is_ref, flag_ref, P_out, qe_ref = rest
        else:
            fs_ref, is_ref, flag_ref, P_out, qe_ref = rest
        w_ = _el._w
        dtype = pos_ref.dtype
        flag = flag_ref[0] != 0
        mat = is_ref[0]
        hasp = is_ref[1] != 0
        G_e = fs_ref[0]
        lam_e = fs_ref[1]

        if gplan is not None:
            # --- window DMA (double-buffered, one copy per source) ---
            i = pl.program_id(0)
            n = pl.num_programs(0)
            sb = jax.lax.rem(i, jnp.int32(2))
            nxt = jax.lax.rem(i + jnp.int32(1), jnp.int32(2))

            def dma(s, t, which):
                src = src_d if which == 0 else src_p
                return pltpu.make_async_copy(
                    src.at[pl.ds(ws_ref[t], gplan.w_copy)],
                    win.at[s, which], sems.at[s, which])

            @pl.when(i == 0)
            def _():
                for which in (0, 1):
                    dma(sb, i, which).start()

            @pl.when(i + 1 < n)
            def _():
                for which in (0, 1):
                    dma(nxt, i + 1, which).start()

            lidx = lidx_ref[:]              # (rows_c*8, LANE)
            lane = lidx & 127
            drow = lidx >> 7
            row_i = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
            for which in (0, 1):
                dma(sb, i, which).wait()
            # V2 build: sublane-interleave the 8 per-slot diagonal bases
            # (s_off scalars) so every later read is a STATIC slice
            for which in (0, 1):
                for ch in range(3):
                    for w in range(gplan.w_v2):
                        v = None
                        for k in range(8):
                            r = win[sb, which,
                                    soff_ref[i * 8 + jnp.int32(k)] + w,
                                    ch, :]
                            rb = jnp.broadcast_to(r[None], (8, 128))
                            v = rb if k == 0 else jax.lax.select(
                                row_i == k, rb, v)
                        V2[which, ch, w] = v
            # resolve: chunk c of output row (b, i) = V2[b, c+drow][i, lane]
            for c in range(gplan.rows_c):
                sl = slice(c * 8, (c + 1) * 8)
                lane_g = lane[sl]
                drow_g = drow[sl]
                masks = [drow_g == d for d in range(gplan.dke - 1)]

                def mux(vals):
                    v = vals[gplan.dke - 1]
                    for d in reversed(range(gplan.dke - 1)):
                        v = jax.lax.select(masks[d], vals[d], v)
                    return v
                cs = slice(c * 128, (c + 1) * 128)
                for b in range(3):
                    vd = mux([_lane_lookup(
                        V2[0, b, c + d], lane_g) for d in range(gplan.dke)])
                    vp = mux([_lane_lookup(
                        V2[1, b, c + d], lane_g) for d in range(gplan.dke)])
                    # node-0-centered position + displacement increment
                    d0 = jnp.broadcast_to(vd[0:1, :], (8, 128))
                    kin_s[b * 8:(b + 1) * 8, cs] = \
                        pos_ref[b * 8:(b + 1) * 8, cs] + (vd - d0)
                    kin_s[24 + b * 8:24 + (b + 1) * 8, cs] = vd - vp
            pos24 = kin_s[0:24]
            du24 = kin_s[24:48]
        elif kin_inside:
            # pos_ref = coord24 (node-0-centered), du_ref = disp24,
            # dp_ref = dprev24: the kinematic differences are taken HERE so
            # the (24, E) pos/du buffers are never materialized in HBM
            # (valid only when the nodal carry dtype equals the element
            # dtype — the mixed-precision path must difference in f64
            # before the f32 cast, element.py:176).
            d = du_ref[:]
            du24 = d - dp_ref[:]
            pos24 = jnp.concatenate(
                [pos_ref[8 * b:8 * (b + 1)]
                 + (d[8 * b:8 * (b + 1)] - d[8 * b:8 * b + 1])
                 for b in range(3)], axis=0)
        else:
            pos24 = pos_ref[:]
            du24 = du_ref[:]

        # --- MXU: jacobian + reference-space displacement gradient
        Jf = _dot(cj_ref[:], pos24, dtype)                       # (72, TE)
        Gf = _dot(cj_ref[:], du24, dtype)                        # (72, TE)
        J = [[Jf[(a * 3 + b) * 8:(a * 3 + b) * 8 + 8] for b in range(3)]
             for a in range(3)]
        Gdu = [[Gf[(c * 3 + b) * 8:(c * 3 + b) * 8 + 8] for b in range(3)]
               for c in range(3)]

        # --- VPU: everything data-dependent (mirrors element._element_math,
        # HAKAI_j.jl:1033-1784 re-derivation; see that docstring)
        detJ = _el._det3(J)                                # (8, TE)
        detJ_abs = jnp.abs(detJ)
        inv_det = 1.0 / w_(detJ == 0, 1.0, detJ)
        invJ = _el._inv3(J, inv_det)
        V = detJ_abs.sum(axis=0)                           # (TE,)
        inv_V = 1.0 / w_(V == 0, 1.0, V)

        g = [[invJ[a][0] * Gdu[0][b] + invJ[a][1] * Gdu[1][b]
              + invJ[a][2] * Gdu[2][b] for b in range(3)] for a in range(3)]
        tr = g[0][0] + g[1][1] + g[2][2]
        volbar = ((detJ_abs * tr).sum(axis=0) * inv_V / 3.0)[None, :]
        de = [g[0][0] - tr / 3.0 + volbar,
              g[1][1] - tr / 3.0 + volbar,
              g[2][2] - tr / 3.0 + volbar,
              g[0][1] + g[1][0], g[1][2] + g[2][1], g[0][2] + g[2][0]]
        tr_de = 3.0 * volbar
        stress = [P_ref[8 * c:8 * (c + 1)] for c in range(6)]
        trial = [stress[c] + lam_e * tr_de + 2.0 * G_e * de[c]
                 for c in range(3)] + \
                [stress[c] + G_e * de[c] for c in range(3, 6)]
        mean_s = (trial[0] + trial[1] + trial[2]) / 3.0
        dev = [trial[0] - mean_s, trial[1] - mean_s, trial[2] - mean_s,
               trial[3], trial[4], trial[5]]
        vm = jnp.sqrt(1.5 * (dev[0]**2 + dev[1]**2 + dev[2]**2
                             + 2.0 * (dev[3]**2 + dev[4]**2 + dev[5]**2)))

        eq_ps = P_ref[56:64]
        yield_s = P_ref[64:72]
        H = _el._hardening_slope_tab(pl_tables, mat, eq_ps)
        is_plastic = hasp[None, :] & (vm > yield_s) & flag[None, :]
        safe_vm = w_(vm == 0, 1.0, vm)
        d_ep = w_(is_plastic, (vm - yield_s) / (3.0 * G_e + H), 0.0)
        scale = w_(is_plastic, (yield_s + H * d_ep) / safe_vm, 1.0)
        final = [w_(is_plastic, dev[c] * scale + (mean_s if c < 3 else 0.0),
                    trial[c]) for c in range(6)]

        # --- internal-force moments M[c][b] (see element.py Qe derivation)
        sig_m = (final[0] + final[1] + final[2]) / 3.0
        s_t = [[final[0], final[3], final[5]],
               [final[3], final[1], final[4]],
               [final[5], final[4], final[2]]]
        sum_w_sig_m = (detJ * sig_m).sum(axis=0)           # (TE,)
        wdet = detJ_abs * inv_V
        M_rows = []
        for c in range(3):
            for b in range(3):
                acc = invJ[0][c] * s_t[0][b] + invJ[1][c] * s_t[1][b] \
                    + invJ[2][c] * s_t[2][b] - invJ[b][c] * sig_m
                M_rows.append(detJ * acc
                              + wdet * (invJ[b][c] * sum_w_sig_m[None, :]))
        Mf = jnp.concatenate(M_rows, axis=0)               # (72, TE)

        # --- MXU: fold to nodal forces, mask dead elements
        qe24 = _dot(cq_ref[:], Mf, dtype)
        qe_ref[:] = w_(flag[None, :], qe24, 0.0)

        for c in range(6):
            P_out[8 * c:8 * (c + 1)] = final[c]
        # GP-mean strain accumulator (see element._element_math new_strain):
        # 6 mean rows + 2 zero pad rows, one aligned 8-row tile
        P_out[48:56] = jnp.concatenate(
            [jnp.stack([P_ref[48 + c] + 0.125 * de[c].sum(axis=0)
                        for c in range(6)]),
             jnp.zeros((2, de[0].shape[-1]), dtype)], axis=0)
        P_out[56:64] = w_(is_plastic, eq_ps + d_ep, eq_ps)
        P_out[64:72] = w_(is_plastic, yield_s + H * d_ep, yield_s)
        if want_triax:
            # triaxiality of the FINAL stress while it is still in VMEM
            # (fracture decks; saves the post-kernel (6,8,E) re-read) —
            # math identical to element.triax_components
            vm_t = jnp.sqrt(0.5 * ((final[0] - final[1])**2
                                   + (final[1] - final[2])**2
                                   + (final[0] - final[2])**2
                                   + 6.0 * (final[3]**2 + final[4]**2
                                            + final[5]**2)))
            mean_t = (final[0] + final[1] + final[2]) / 3.0
            tri_ref[:] = w_(vm_t < 1e-10, 0.0,
                            mean_t / w_(vm_t == 0, 1.0, vm_t))
    return kernel


def element_core_packed_mxu(model: LoweredModel, pos24, du24, P, flag,
                            dprev24=None, want_triax=False,
                            gplan=None, disp_il=None, dprev_il=None):
    """MXU-assisted packed element kernel — same contract as
    element_core_packed (state in/out as one (72, E) buffer, qe as
    (24, E) rows).  With ``dprev24`` the caller passes
    (coord24, disp24, dprev24) instead of (pos24, du24) and the kinematic
    differences happen inside the kernel (f32 decks only).  With
    ``want_triax`` a third (8, E) output carries the triaxiality of the
    final stress (fracture decks; computed while stress is in VMEM).

    With ``gplan`` (a GatherPhysPlan) the nodal gather fuses INTO the
    kernel: the caller passes ``pos24`` = coord24 plus the interleaved
    (N/128, 3, 128) nodal sources ``disp_il``/``dprev_il``, and the
    (24, E) disp/dprev element copies are never materialized in HBM
    (the kernel is DMA-bandwidth bound — docs/PERF.md round-5 session 3)."""
    import os
    E = P.shape[1]
    TE = int(os.environ.get("HAKAI_MXU_TILE", 0)) or _el._TILE_E
    while E % TE:
        TE //= 2
    n_tiles = E // TE
    dt = P.dtype
    if gplan is not None and (gplan.te != TE or not gplan.ok):
        gplan = None                     # plan/tile mismatch: unfused path
        if disp_il is not None and dprev24 is None:
            raise ValueError("fused gather requested but plan unusable")
    kin_inside = dprev24 is not None
    CJ, CQ = _mxu_tables()
    fstat = jnp.stack([model.G_e, model.lam_e])
    istat = jnp.stack([model.mat_id,
                       model.has_plastic_e.astype(jnp.int32)])
    flag_i = flag.astype(jnp.int32)[None]

    kernel = _make_mxu_kernel(model.pl_tables, TE, kin_inside=kin_inside,
                              want_triax=want_triax,
                              precision=getattr(model.config,
                                                "mxu_precision", "highest"),
                              gplan=gplan)
    if gplan is not None:
        def spec(rows):
            return pl.BlockSpec((rows, TE),
                                lambda i, ws, so: (_I0(), i),
                                memory_space=pltpu.VMEM)

        def cspec(shape):
            return pl.BlockSpec(shape, lambda i, ws, so: (_I0(), _I0()),
                                memory_space=pltpu.VMEM)

        out_specs = [spec(72), spec(24)]
        out_shape = [jax.ShapeDtypeStruct((72, E), dt),
                     jax.ShapeDtypeStruct((24, E), dt)]
        if want_triax:
            out_specs.append(spec(8))
            out_shape.append(jax.ShapeDtypeStruct((8, E), dt))
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(n_tiles,),
            in_specs=[
                pl.BlockSpec((gplan.rows_c * 8, 128),
                             lambda i, ws, so: (i, _I0()),
                             memory_space=pltpu.VMEM),       # lidx
                cspec((72, 24)), cspec((24, 72)),
                spec(72), spec(24),                          # P, coord24
                spec(2), spec(2), spec(1),
                pl.BlockSpec(memory_space=pltpu.ANY),        # disp_il
                pl.BlockSpec(memory_space=pltpu.ANY),        # dprev_il
            ],
            out_specs=out_specs,
            scratch_shapes=[
                pltpu.VMEM((2, 2, gplan.w_copy, 3, 128), dt),     # win
                pltpu.VMEM((2, 3, gplan.w_v2, 8, 128), dt),       # V2
                pltpu.VMEM((48, TE), dt),                         # kin_s
                pltpu.SemaphoreType.DMA((2, 2)),
            ],
        )
        out = pl.pallas_call(
            kernel, grid_spec=grid_spec, out_shape=out_shape,
            interpret=jax.default_backend() != "tpu",
        )(gplan.win_start, gplan.s_off, gplan.lidx,
          jnp.asarray(CJ, dt), jnp.asarray(CQ, dt), P, pos24,
          fstat, istat, flag_i, disp_il, dprev_il)
        return tuple(out)

    def spec(rows):
        return pl.BlockSpec((rows, TE),
                            lambda i: (jnp.asarray(0, jnp.int32), i),
                            memory_space=pltpu.VMEM)

    def cspec(shape):
        return pl.BlockSpec(shape,
                            lambda i: (jnp.asarray(0, jnp.int32),) * 2,
                            memory_space=pltpu.VMEM)

    extra_specs = [spec(24)] if kin_inside else []
    extra_args = [dprev24] if kin_inside else []
    out_specs = [spec(72), spec(24)]
    out_shape = [jax.ShapeDtypeStruct((72, E), dt),
                 jax.ShapeDtypeStruct((24, E), dt)]
    if want_triax:
        out_specs.append(spec(8))
        out_shape.append(jax.ShapeDtypeStruct((8, E), dt))
    out = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            cspec((72, 24)), cspec((24, 72)),
            spec(72), spec(24), spec(24), *extra_specs,
            spec(2), spec(2), spec(1),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=jax.default_backend() != "tpu",
    )(jnp.asarray(CJ, dt), jnp.asarray(CQ, dt), P, pos24, du24,
      *extra_args, fstat, istat, flag_i)
    return tuple(out)


def packed_element_step(model: LoweredModel, coord_e, disp_e, disp_e_prev,
                        P, flag):
    """Shared packed-kernel dispatch + fracture bookkeeping for the chunk
    steppers (solver.explicit.step_fast_packed and the halo fast path).

    Picks the MXU in-kernel-kinematics variant on pure-f32 decks (pos/du
    never materialized in HBM), the packed kernel otherwise; on fracture
    decks requests/derives the triaxiality of the final stress and walks
    the erosion table.  Returns ``(P_new, qe24, triax, flag)`` where triax
    is None on fracture-free decks (callers keep their chunk-exit triax)
    and flag is the post-erosion life mask."""
    from .element import triax_components
    from .erosion import erosion_delete_mask

    edt = model.edtype
    E = P.shape[1]
    wt = model.fracture_enabled          # in-kernel triax (MXU variant)
    if (model.config.element_kernel in ("pallas_mxu", "auto")
            and model.dtype == edt):
        out = element_core_packed_mxu(
            model, coord_e.reshape(24, E), disp_e.reshape(24, E), P, flag,
            dprev24=disp_e_prev.reshape(24, E), want_triax=wt)
    else:
        pos24 = (coord_e
                 + (disp_e - disp_e[:, 0:1, :]).astype(edt)).reshape(24, E)
        du24 = (disp_e - disp_e_prev).astype(edt).reshape(24, E)
        out = element_core_packed(model, pos24, du24, P, flag, want_triax=wt)
    return _fracture_epilogue(model, out, flag)


def _fracture_epilogue(model, out, flag):
    from .element import triax_components
    from .erosion import erosion_delete_mask

    P_new, qe = out[0], out[1]
    triax = None
    if model.fracture_enabled:
        if len(out) > 2:
            triax_raw = out[2]           # computed in-kernel (final stress)
        else:
            triax_raw = triax_components(
                [P_new[8 * c:8 * (c + 1)] for c in range(6)])
        # deferred erosion zeroing: dead elements carry stale stress; the
        # reference's triax for them is 0 (see solver.explicit.step_fast)
        triax = jnp.where(flag[None, :], triax_raw, 0.0)
        flag, _ = erosion_delete_mask(model, P_new[56:64], triax, flag)
    return P_new, qe, triax, flag


def packed_element_step_fused(model: LoweredModel, P, flag, disp_il,
                              dprev_il):
    """Fused-gather packed step: the kernel resolves the disp/dprev element
    copies from interleaved (N/128, 3, 128) nodal windows (GatherPhysPlan)
    instead of reading materialized (24, E) streams — the kernel is
    DMA-bandwidth bound, so removing ~200 MB/step at 1M is the win.
    f32-only (the mixed path must difference in f64 before the cast)."""
    E = P.shape[1]
    out = element_core_packed_mxu(
        model, model.coord_e.reshape(24, E), None, P, flag,
        want_triax=model.fracture_enabled, gplan=model.plan_gphys,
        disp_il=disp_il, dprev_il=dprev_il)
    return _fracture_epilogue(model, out, flag)
