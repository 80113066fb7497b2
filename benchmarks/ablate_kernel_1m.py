"""Ablate the MXU packed element kernel at 1M to localize its compute cost.

profile_1m measured the kernel phase at ~3.7 ms/step vs its ~1.2 ms HBM
traffic floor — the kernel is Mosaic COMPUTE bound, not HBM bound.  This
times surgically-reduced kernel bodies (same refs, same DMA pattern, less
VPU math) to find where the 2.5 ms goes:

  full      — the product kernel (element_core_packed_mxu)
  nohard    — hardening slope = constant (skips the table walk selects)
  noplast   — radial return skipped entirely (elastic update)
  nobbar    — no B-bar (volbar=0; skips detJ_abs sum, inv_V, wdet terms)
  dotsonly  — J/Gdu dots -> qe dot on a trivial M (upper bound on the
              MXU + DMA + layout floor; all data-dependent VPU math gone)

Env: NX NY NZ (default 64x64x256), N1 N2, MXU_PRECISION (default high).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
import jax.numpy as jnp

from hakai_tpu.config import SolverConfig
from hakai_tpu.core.lowering import lower
from hakai_tpu.core.state import init_state
from hakai_tpu.ops import element as _el
from hakai_tpu.ops import element_pallas as ep
from hakai_tpu.pre.synthetic import bar_model
from hakai_tpu.solver import explicit as ex

NX = int(os.environ.get("NX", 64))
NY = int(os.environ.get("NY", 64))
NZ = int(os.environ.get("NZ", 256))
N1 = int(os.environ.get("N1", 20))
N2 = int(os.environ.get("N2", 120))

cfg = SolverConfig(dtype="float32", node_pad=128, elem_pad=128,
                   element_kernel="pallas_mxu",
                   mxu_precision=os.environ.get("MXU_PRECISION", "high"))
model = lower(bar_model(nx=NX, ny=NY, nz=NZ, d_time=1e-8, end_time=1.0), cfg)
state = ex.run_chunk(model, init_state(model), 50)
float(jnp.sum(state.disp))
E = model.E
print(f"E={model.n_element} prec={cfg.mxu_precision}", flush=True)

P0 = ex.pack_gauss_state(state, E)
disp_e0 = _el.gather_disp_e(model, state.disp)
coord24 = model.coord_e.reshape(24, E)
d24 = disp_e0.reshape(24, E)
dp24 = (disp_e0 - state.velo.mean() * 0).reshape(24, E)   # same array is fine
flag0 = state.element_flag

_orig_make = ep._make_mxu_kernel


def timed(tag, make_fn):
    ep._make_mxu_kernel = make_fn

    @jax.jit
    def chunk(P, n):
        def body(_, P):
            P2, qe = ep.element_core_packed_mxu(model, coord24, d24, P,
                                                flag0, dprev24=dp24)
            return P2
        return jax.lax.fori_loop(0, n, body, P)

    out = {}
    try:
        for k in (N1, N2):
            r = chunk(P0, k)
            float(jnp.sum(r))
            t0 = time.perf_counter()
            r = chunk(P0, k)
            float(jnp.sum(r))
            out[k] = time.perf_counter() - t0
        per = (out[N2] - out[N1]) / (N2 - N1)
        print(f"{tag:10s}{per*1e6:9.1f} us/step", flush=True)
    finally:
        ep._make_mxu_kernel = _orig_make
    return


def make_variant(mode):
    def _make(pl_tables, TE, kin_inside=False, want_triax=False,
              precision="highest"):
        if mode == "nohard":
            # constant hardening slope: H tables collapse to one segment
            pt = tuple(t[:2] if len(t) >= 2 else t for t in pl_tables)
            return _orig_make(pt, TE, kin_inside=kin_inside,
                              want_triax=want_triax, precision=precision)
        if mode == "noplast":
            return _orig_make((), TE, kin_inside=kin_inside,
                              want_triax=want_triax, precision=precision)
        if mode == "full":
            return _orig_make(pl_tables, TE, kin_inside=kin_inside,
                              want_triax=want_triax, precision=precision)
        # hand-written reduced bodies
        hi = jax.lax.Precision.HIGHEST
        dn = (((1,), (0,)), ((), ()))

        def _dot(A, x, dtype):
            # mirror of element_pallas._make_mxu_kernel._dot (K-stacked
            # single-pass bf16x3)
            if precision != "high":
                return jax.lax.dot_general(A, x, dn, precision=hi,
                                           preferred_element_type=dtype)
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

        def kernel(cj_ref, cq_ref, P_ref, pos_ref, du_ref, *rest):
            rest = list(rest)
            if want_triax:
                rest.pop()
            dp_ref, fs_ref, is_ref, flag_ref, P_out, qe_ref = rest
            dtype = pos_ref.dtype
            if mode == "dmaonly":
                # pure stream: every buffer in/out, zero math — the DMA +
                # pipeline floor of this grid/BlockSpec layout
                qe_ref[:] = du_ref[:] + dp_ref[:]
                P_out[:] = P_ref[:]
                return
            d = du_ref[:]
            du24 = d - dp_ref[:]
            pos24 = jnp.concatenate(
                [pos_ref[8 * b:8 * (b + 1)]
                 + (d[8 * b:8 * (b + 1)] - d[8 * b:8 * b + 1])
                 for b in range(3)], axis=0)
            if mode == "kinonly":
                # kinematics build only (no dots): prices the pos/du
                # prologue against dmaonly; dotsonly - kinonly = the dot
                # machinery (splits + concats + MXU passes)
                qe_ref[:] = pos24 + du24
                P_out[:] = P_ref[:]
                return
            Jf = _dot(cj_ref[:], pos24, dtype)
            Gf = _dot(cj_ref[:], du24, dtype)

            if mode == "dotsonly":
                qe_ref[:] = _dot(cq_ref[:], Jf + Gf, dtype)[:24] * 0.0 \
                    + du24
                P_out[:] = P_ref[:]
                return
            if mode == "nobbar":
                w_ = _el._w
                J = [[Jf[(a * 3 + b) * 8:(a * 3 + b) * 8 + 8]
                      for b in range(3)] for a in range(3)]
                Gdu = [[Gf[(c * 3 + b) * 8:(c * 3 + b) * 8 + 8]
                        for b in range(3)] for c in range(3)]
                detJ = _el._det3(J)
                inv_det = 1.0 / w_(detJ == 0, 1.0, detJ)
                invJ = _el._inv3(J, inv_det)
                g = [[invJ[a][0] * Gdu[0][b] + invJ[a][1] * Gdu[1][b]
                      + invJ[a][2] * Gdu[2][b] for b in range(3)]
                     for a in range(3)]
                tr = g[0][0] + g[1][1] + g[2][2]
                de = [g[0][0], g[1][1], g[2][2],
                      g[0][1] + g[1][0], g[1][2] + g[2][1],
                      g[0][2] + g[2][0]]
                G_e = fs_ref[0]
                lam_e = fs_ref[1]
                final = [P_ref[8 * c:8 * (c + 1)] + lam_e * tr
                         + 2.0 * G_e * de[c] for c in range(3)] + \
                        [P_ref[8 * c:8 * (c + 1)] + G_e * de[c]
                         for c in range(3, 6)]
                sig_m = (final[0] + final[1] + final[2]) / 3.0
                s_t = [[final[0], final[3], final[5]],
                       [final[3], final[1], final[4]],
                       [final[5], final[4], final[2]]]
                M_rows = []
                for c in range(3):
                    for b in range(3):
                        acc = invJ[0][c] * s_t[0][b] \
                            + invJ[1][c] * s_t[1][b] \
                            + invJ[2][c] * s_t[2][b] - invJ[b][c] * sig_m
                        M_rows.append(detJ * acc)
                qe_ref[:] = _dot(cq_ref[:], jnp.concatenate(M_rows, axis=0),
                                 dtype)
                for c in range(6):
                    P_out[8 * c:8 * (c + 1)] = final[c]
                P_out[48:72] = P_ref[48:72]
                return
            raise ValueError(mode)
        return kernel
    return _make


for tag in ("dmaonly", "kinonly", "dotsonly", "full"):
    timed(tag, make_variant(tag))
