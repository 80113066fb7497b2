"""Blocked-gather planning unit tests (kernel itself runs on TPU only;
CPU exercises the plan + XLA fallback)."""
import numpy as np
import jax.numpy as jnp

from hakai_tpu.ops.gather_pallas import blocked_gather, plan_blocked_gather


def test_plan_windows_and_fallback():
    rng = np.random.default_rng(0)
    S = 12800
    idx = np.minimum(np.arange(4096) // 2 + rng.integers(0, 300, 4096), S - 1)
    plan = plan_blocked_gather(idx, S, r_tile=2048)
    assert plan.ok
    assert plan.n_tiles == 2
    # window covers every index of its tile
    starts = np.asarray(plan.starts)
    lidx = np.asarray(plan.local_idx).reshape(-1)
    for t in range(plan.n_tiles):
        tl = lidx[t * 2048:(t + 1) * 2048]
        assert tl.min() >= 0
        assert tl.max() < plan.w_rows * 128
    # CPU fallback produces exact gather
    src = jnp.asarray(rng.normal(size=(2, S)), jnp.float32)
    out = blocked_gather(src, plan)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(src)[:, idx])


def test_plan_rejects_scattered():
    rng = np.random.default_rng(1)
    S = 1 << 20
    idx = rng.integers(0, S, 4096)   # random: no locality
    plan = plan_blocked_gather(idx, S, r_tile=2048, max_w_rows=64)
    assert not plan.ok
    # fallback still correct
    src = jnp.asarray(rng.normal(size=(1, S)), jnp.float32)
    out = blocked_gather(src, plan)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(src)[:, idx])


def test_plan_masked_entries_ignored():
    S = 2560
    idx = np.concatenate([np.arange(2000), np.full(48, S - 1)])
    valid = np.concatenate([np.ones(2000, bool), np.zeros(48, bool)])
    plan = plan_blocked_gather(idx, S, valid=valid, r_tile=2048)
    # masked far-away entries must not widen the window
    assert plan.ok
    assert plan.w_rows <= 16 + 1


def test_diag_plan_decode():
    """Diag plans: valid entries decode to the original index under the
    linear per-row base (starts[t]+s)*128 + local_idx."""
    rng = np.random.default_rng(3)
    idx = np.sort(np.cumsum(rng.integers(0, 3, 60000)) % 150000)
    valid = rng.random(60000) > 0.1
    p = plan_blocked_gather(idx, 153600, valid=valid, subgroups=4)
    assert p.dk > 0
    rows_t = p.r_tile // 128
    li = np.asarray(p.local_idx).reshape(-1, rows_t, 128)[:p.n_tiles]
    st = np.asarray(p.starts).astype(np.int64)
    s = np.arange(rows_t)[None, :, None]
    dec = ((st[:, None, None] + s) * 128 + li).reshape(-1)
    n = p.n_tiles * p.r_tile
    idxp = np.zeros(n, np.int64); idxp[:len(idx)] = idx
    vp = np.zeros(n, bool); vp[:len(valid)] = valid
    assert (dec[vp] == idxp[vp]).all()
    assert (li >> 7).max() < p.dk
    # DMA geometry: copies stay inside the source at both ends
    ss = np.asarray(p.m_starts)
    assert (ss >= 0).all() and (ss + p.m_w_rows <= 153600 // 128).all()
    do = np.asarray(p.d_off)
    assert (do >= 0).all() and do.max() <= p.pad


def test_diag_plan_negative_base():
    """Index drift slope < 1 near the origin forces a virtual front pad."""
    # slope 0.9: early tiles need window rows "before" source row 0
    idx = (np.arange(40960) * 0.9).astype(np.int64)
    p = plan_blocked_gather(idx, 81920, subgroups=4)
    assert p.dk > 0 and p.pad > 0
    src = np.arange(3 * 81920, dtype=np.float32).reshape(3, 81920)
    out = np.asarray(blocked_gather(jnp.asarray(src), p))  # CPU: XLA fallback
    np.testing.assert_array_equal(out, src[:, idx])


def test_diag_fallback_scattered():
    """Random (non-local) indices must reject diag AND stay correct."""
    rng = np.random.default_rng(4)
    idx = rng.integers(0, 150000, 40960)
    p = plan_blocked_gather(idx, 153600, subgroups=4)
    assert p.dk == 0
    src = rng.standard_normal((2, 153600)).astype(np.float32)
    out = np.asarray(blocked_gather(jnp.asarray(src), p))
    np.testing.assert_array_equal(out, src[:, idx])


def _emulate_phys_asm(qe, plan):
    """NumPy emulation of the physical-layout assembly kernel (the exact
    per-group window/scratch/diagonal indexing the Mosaic kernel performs —
    the UNPADDED source with per slot-group DMA offsets)."""
    from hakai_tpu.ops.gather_pallas import LANE
    C, _, E = qe.shape
    out = np.zeros((C, plan.N), qe.dtype)
    lidx = np.asarray(plan.lidx)
    g_starts = np.asarray(plan.g_starts).reshape(plan.n_tiles, -1)
    g_shifts = np.asarray(plan.g_shifts).reshape(plan.n_tiles, -1)
    W = plan.scratch_blocks * LANE
    rows, rounds, dke = plan.rows, plan.rounds, plan.dke
    k0m = plan.k0 + plan.margin
    w = plan.w_blocks * LANE
    s_off = np.asarray(plan.s_off).reshape(plan.n_tiles, rows)
    for t in range(plan.n_tiles):
        scratch = np.zeros((C, 8, W), qe.dtype)
        for g, (_, lo, hi) in enumerate(plan.pad_groups):
            cs = g_starts[t, g] * LANE
            ds = g_shifts[t, g] * LANE
            scratch[:, lo:hi, ds:ds + w] = qe[:, lo:hi, cs:cs + w]
        for s in range(rows):
            acc = np.zeros((C, 8, LANE), qe.dtype)
            for r in range(rounds):
                li = lidx[((t * rounds + r) * rows + s) * 8:
                          ((t * rounds + r) * rows + s) * 8 + 8]
                lane = li & (LANE - 1)
                d = li >> 7
                for i in range(8):
                    sel = d[i] < dke
                    col = (k0m + s_off[t, s] + d[i]) * LANE + lane[i]
                    acc[:, i, sel] += scratch[:, i, col[sel] % W]
            out[:, t*rows*LANE + s*LANE:(t*rows + s + 1)*LANE] = \
                acc.sum(axis=1)
    return out


def test_phys_asm_plan_matches_direct():
    """plan_assemble_phys + the kernel's exact indexing reproduce a direct
    scatter-add assembly, including per-slot alignment pads and edge
    clamping."""
    from hakai_tpu.ops.gather_pallas import plan_assemble_phys
    from hakai_tpu.core.lowering import lower
    from hakai_tpu.config import SolverConfig
    from hakai_tpu.pre.synthetic import bar_model

    m = bar_model(nx=10, ny=12, nz=24, d_time=1e-8, end_time=1.0)
    lm = lower(m, SolverConfig(dtype="float32", node_pad=128, elem_pad=128))
    elem = np.asarray(lm.elem)
    plan = plan_assemble_phys(elem, lm.n_element, lm.E, lm.N)
    assert plan.ok, "structured bar must plan"
    rng = np.random.default_rng(0)
    qe = rng.standard_normal((3, 8, lm.E)).astype(np.float32)
    # direct reference
    ref = np.zeros((3, lm.N), np.float32)
    for i in range(8):
        np.add.at(ref, (slice(None), elem[i, :lm.n_element]),
                  qe[:, i, :lm.n_element])
    got = _emulate_phys_asm(qe, plan)
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def test_sharded_phys_asm_plan_matches_direct():
    """plan_sharded_assemble_phys: uniform static meta across shards (the
    boundary shards' slot pads are forced common) and each shard's kernel
    indexing reproduces a direct scatter-add on its window."""
    import dataclasses as _dc

    from hakai_tpu.config import SolverConfig
    from hakai_tpu.core.lowering import lower
    from hakai_tpu.parallel.halo import partition
    from hakai_tpu.pre.synthetic import bar_model

    from hakai_tpu.ops.gather_pallas import plan_sharded_assemble_phys

    m = bar_model(nx=16, ny=16, nz=128, d_time=1e-8, end_time=1.0)  # 32k
    lm = lower(m, SolverConfig(dtype="float32", node_pad=128 * 8,
                               elem_pad=128, renumber="always"))
    hm = partition(lm, 8)
    W = hm.No + 2 * hm.H
    ew_np = np.asarray(hm.elem_w)
    al_np = np.asarray(hm.elem_alive0)
    # partition skips the build below the engagement gate; build directly
    plan = plan_sharded_assemble_phys(
        [ew_np[d] for d in range(8)],
        [int(al_np[d].sum()) for d in range(8)], hm.El, W)
    assert plan is not None, "bar windows must produce a sharded phys plan"
    assert plan.N == W
    ew = np.asarray(hm.elem_w)
    al = np.asarray(hm.elem_alive0)
    rng = np.random.default_rng(3)
    for d in range(8):
        local = _dc.replace(plan,
                            starts=plan.starts[d], shifts=plan.shifts[d],
                            g_starts=plan.g_starts[d],
                            g_shifts=plan.g_shifts[d],
                            lidx=plan.lidx[d], s_off=plan.s_off[d])
        k = int(al[d].sum())
        qe = rng.standard_normal((3, 8, hm.El)).astype(np.float32)
        qe[:, :, k:] = 0.0            # padding elements carry no force
        ref = np.zeros((3, W), np.float32)
        for i in range(8):
            np.add.at(ref, (slice(None), ew[d, i, :k]), qe[:, i, :k])
        got = _emulate_phys_asm(qe, local)
        np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def test_sharded_gather_diag_mode():
    """plan_sharded_gather: the halo disp_e gather (per-shard window
    element-node indices off a renumbered bar) must land on the diagonal
    kernel with ONE static meta across shards, and every shard's stacked
    index arrays must decode back to its original indices."""
    from hakai_tpu.config import SolverConfig
    from hakai_tpu.core.lowering import lower
    from hakai_tpu.parallel.halo import partition
    from hakai_tpu.pre.synthetic import bar_model

    from hakai_tpu.ops.gather_pallas import plan_sharded_gather

    m = bar_model(nx=16, ny=16, nz=128, d_time=1e-8, end_time=1.0)  # 32k
    lm = lower(m, SolverConfig(dtype="float32", node_pad=128 * 8,
                               elem_pad=128, renumber="always"))
    hm = partition(lm, 8)
    W = hm.No + 2 * hm.H
    ew = np.asarray(hm.elem_w)
    al = np.asarray(hm.elem_alive0)
    idx_list = [ew[d].reshape(-1) for d in range(8)]
    val_list = [np.tile(al[d], 8) for d in range(8)]
    p = plan_sharded_gather(idx_list, W, valid_per_shard=val_list)
    assert p.ok
    assert p.dk > 0, "bar windows must qualify for the diagonal kernel"
    # stacked shard axis on every array field
    assert p.starts.shape[0] == 8 and p.local_idx.shape[0] == 8
    assert p.m_starts.shape[0] == 8 and p.d_off.shape[0] == 8
    rows_t = p.r_tile // 128
    src_rows = W // 128
    for d in range(8):
        li = np.asarray(p.local_idx[d]).reshape(-1, rows_t, 128)[:p.n_tiles]
        st = np.asarray(p.starts[d]).astype(np.int64)
        s = np.arange(rows_t)[None, :, None]
        dec = ((st[:, None, None] + s) * 128 + li).reshape(-1)
        n = p.n_tiles * p.r_tile
        idxp = np.zeros(n, np.int64); idxp[:8 * hm.El] = idx_list[d]
        vp = np.zeros(n, bool); vp[:8 * hm.El] = val_list[d]
        assert (dec[vp] == idxp[vp]).all()
        assert (li >> 7).max() < p.dk
        ss = np.asarray(p.m_starts[d])
        assert (ss >= 0).all() and (ss + p.m_w_rows <= src_rows).all()
        do = np.asarray(p.d_off[d])
        assert (do >= 0).all() and do.max() <= p.pad


def test_phys_asm_kernel_traces():
    """The REAL blocked_assemble_phys pallas_call must abstract-eval cleanly
    (not just the numpy emulation): jax >= 0.9 rejects DMA signaling on a
    non-scalar semaphore slice, which the emulator can never catch.  Uses a
    mesh whose plan has a pad-group count different from the channel count
    so a (slot, channel, group)-shaped semaphore mis-indexing cannot hide
    behind a C == n_groups coincidence."""
    import jax

    from hakai_tpu.config import SolverConfig
    from hakai_tpu.core.lowering import lower
    from hakai_tpu.ops.gather_pallas import (blocked_assemble_phys,
                                             plan_assemble_phys)
    from hakai_tpu.pre.synthetic import bar_model

    for dims in ((10, 12, 24), (16, 16, 48)):
        m = bar_model(nx=dims[0], ny=dims[1], nz=dims[2], d_time=1e-8,
                      end_time=1.0)
        lm = lower(m, SolverConfig(dtype="float32", node_pad=128,
                                   elem_pad=128, renumber="always"))
        plan = plan_assemble_phys(np.asarray(lm.elem), lm.n_element,
                                  lm.E, lm.N)
        assert plan.ok
        qe = jnp.zeros((3, 8, lm.E), jnp.float32)
        out = jax.eval_shape(lambda q, p=plan: blocked_assemble_phys(q, p),
                             qe)
        assert out.shape == (3, plan.N)
