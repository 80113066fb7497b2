"""Per-phase slope profile of the car-crash-N22k step (mixed precision).

Times each component in its own chained fori_loop (value readback; state
chained between iterations so the tunnel's result cache and async dispatch
cannot shave iterations — the round-2 protocol from docs/PERF.md):

  full       — run_chunk (the product step)
  contact    — contact_forces_pv alone, position chained through the force
  epilogue   — the force-assembly epilogue alone (blocked-gather lane sums
               on synthetic compact forces; data-independent cost)
  nocontact  — step() on a pairs=() clone (integrator+element+assembly)
"""
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp

from hakai_tpu.config import SolverConfig
from hakai_tpu.core.lowering import lower
from hakai_tpu.core.state import init_state
from hakai_tpu.io.inp import read_inp_file
from hakai_tpu.ops.contact import contact_forces_pv
from hakai_tpu.ops.gather_pallas import blocked_gather
from hakai_tpu.solver import explicit as ex

DECK = os.environ.get(
    "DECK", "/root/reference/HAKAI-v0.0.2/input/car-crash-N22k.inp")
N_WARM = int(os.environ.get("N_WARM", 5000))
N1 = int(os.environ.get("N1", 200))
N2 = int(os.environ.get("N2", 1200))

model = lower(read_inp_file(DECK), SolverConfig(dtype="mixed"))
print(f"E={model.n_element} N={model.n_node} pairs={len(model.pairs)}",
      flush=True)
cfgc = model.config.contact
for pi, pair in enumerate(model.pairs):
    F2 = pair.tri_nodes.shape[1]
    Ci = pair.cand_nodes.shape[0]
    TB = min(cfgc.tri_block_self if pair.is_self else cfgc.tri_block, F2)
    nbc = cfgc.node_block_self if pair.is_self else cfgc.node_block
    nb = max(min(nbc, Ci, (1 << 21) // TB), 8)
    print(f"  pair{pi}: F2={F2} Ci={Ci} Cj={pair.jnode_nodes.shape[0]} "
          f"self={pair.is_self} TB={TB} nb={nb} "
          f"tri_chunks={-(-F2//TB)} n_chunks={-(-Ci//nb)} "
          f"fgt_seg={'y' if pair.fgt_segmask is not None else 'n'}",
          flush=True)

state = ex.run_chunk(model, init_state(model), N_WARM)
float(jnp.sum(state.disp))


def _readback(r):
    float(jnp.sum(getattr(r, "disp", r)))


def slope(fn, init, label):
    out = {}
    for k in (N1, N2):
        _readback(fn(init, k))
        t0 = time.perf_counter()
        _readback(fn(init, k))
        out[k] = time.perf_counter() - t0
    per = (out[N2] - out[N1]) / (N2 - N1)
    print(f"{label:18s}{per*1e6:8.1f} us/step", flush=True)
    return per


full = jax.jit(lambda s, n: ex.run_chunk(model, s, n), static_argnums=1)
slope(full, state, "full step:")

edt = model.edtype
pos0 = (model.coord + state.disp).astype(edt)
vel0 = state.velo.astype(edt)
flag = state.element_flag


@jax.jit
def contact_loop(pos, n):
    def body(_, p):
        f = contact_forces_pv(model, p, vel0, flag)
        return p + jnp.asarray(1e-30, edt) * f.astype(edt)
    return jax.lax.fori_loop(0, n, body, pos)


slope(lambda p, n: contact_loop(p, n), pos0, "contact (all):")


def epilogue(pair, force_i, force_t, N):
    fi = jnp.pad(force_i, ((0, 0), (0, pair.fgi_src - force_i.shape[1])))
    gi = blocked_gather(fi, pair.plan_fgi).reshape(3, -1, N)
    g = jnp.where(pair.fgi_mask[None], gi, 0.0).sum(axis=1)
    ft = jnp.pad(force_t, ((0, 0), (0, pair.fgt_src - force_t.shape[1])))
    if pair.fgt_segmask is not None:
        c = blocked_gather(ft, pair.plan_fgt)
        for si, s in enumerate(pair.fgt_strides):
            sh = jnp.pad(c[:, s:], ((0, 0), (0, s)))
            c = c + jnp.where(pair.fgt_segmask[si][None], sh, 0.0)
        c = jnp.pad(c, ((0, 0), (0, pair.fgt_k - c.shape[1])))
        f_tn = blocked_gather(c, pair.plan_pick)
        f_tn = jnp.where(pair.fgt_tnvalid[None], f_tn, 0.0)
    else:
        gt = blocked_gather(ft, pair.plan_fgt).reshape(
            3, pair.fgt_vl, pair.fgt_n)
        f_tn = jnp.where(pair.fgt_mask[None], gt, 0.0).sum(axis=1)
    fx = blocked_gather(f_tn, pair.plan_fx)[:, :N]
    return g - jnp.where(pair.fx_mask[None], fx, 0.0)


N = pos0.shape[1]
pairs_ep = [p for p in model.pairs if p.plan_fgi is not None]
if pairs_ep:
    @jax.jit
    def epi_loop(x, n):
        def body(_, xx):
            g = jnp.zeros((3, N), edt)
            for pair in pairs_ep:
                Ci = pair.cand_nodes.shape[0]
                F2 = pair.tri_nodes.shape[1]
                fi = jnp.broadcast_to(xx[:, :1], (3, Ci)).astype(edt)
                ft = jnp.broadcast_to(xx[:, :1], (3, F2)).astype(edt)
                g = g + epilogue(pair, fi, ft, N)
            return xx + jnp.asarray(1e-30, edt) * g
        return jax.lax.fori_loop(0, n, body, x)

    slope(lambda p, n: epi_loop(p, n), pos0,
          f"epilogue (x{len(pairs_ep)}):")

model_nc = dataclasses.replace(model, pairs=())


@jax.jit
def nocontact_loop(s, n):
    return jax.lax.fori_loop(0, n, lambda _, st: ex.step(model_nc, st), s)


slope(lambda s, n: nocontact_loop(s, n), state, "step w/o contact:")
