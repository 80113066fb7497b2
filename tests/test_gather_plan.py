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
