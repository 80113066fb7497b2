"""Contact subsystem tests: surface extraction, penalty force, erosion
re-exposure."""
import jax.numpy as jnp
import numpy as np

from hakai_tpu.config import SolverConfig, ContactConfig
from hakai_tpu.core.lowering import lower, _instance_faces
from hakai_tpu.core.state import init_state
from hakai_tpu.io.model import Model, Part, Instance, Material, IC
from hakai_tpu.ops.contact import contact_forces
from test_element import unit_cube_model


def two_body_model(gap=-0.01, upper_shift=(0.1, 0.1), nx_low=2):
    """Lower slab (nx_low^2 elements in plan, one thick) + upper unit cube
    whose bottom face sits at z = 1 + gap (gap<0 => penetration)."""
    low = unit_cube_model(nx=nx_low, ny=nx_low, nz=1, young=100.0)
    lp = low.parts[0]
    up = unit_cube_model(young=100.0)
    upp = up.parts[0]
    upp.name = "upper"
    coord_u = upp.coordmat.copy()
    coord_u[0] += upper_shift[0]
    coord_u[1] += upper_shift[1]
    coord_u[2] += 1.0 + gap
    upp.coordmat = coord_u

    inst2 = Instance(name="u-1", part_name="upper", part_id=2, material_id=1,
                     node_offset=lp.n_node, element_offset=lp.n_element,
                     n_node=upp.n_node, n_element=upp.n_element)
    m = Model(
        parts=[lp, upp],
        instances=[low.instances[0], inst2],
        materials=[low.materials[0]],
        n_node=lp.n_node + upp.n_node,
        coordmat=np.concatenate([lp.coordmat, coord_u], axis=1),
        n_element=lp.n_element + upp.n_element,
        elementmat=np.concatenate([lp.elementmat,
                                   upp.elementmat + lp.n_node], axis=1),
        element_material=np.ones(lp.n_element + upp.n_element, np.int64),
        element_instance=np.concatenate([
            np.ones(lp.n_element, np.int64),
            np.full(upp.n_element, 2, np.int64)]),
        d_time=1e-4, end_time=1.0, contact_flag=1,
    )
    return m


def test_surface_extraction_counts():
    m = unit_cube_model(nx=2, ny=2, nz=2)
    faces, face_elem, exterior, twin = _instance_faces(m, 0)
    assert faces.shape == (48, 4)
    # 2x2x2 cube: 24 exterior faces, 24 shared (12 interior planes x2)
    assert exterior.sum() == 24
    assert (twin > 0).sum() == 24
    # twins are symmetric
    for r in np.nonzero(twin > 0)[0]:
        e, t = face_elem[r], twin[r]
        partner = np.nonzero((face_elem == t) & (twin == e))[0]
        assert len(partner) >= 1


def _corner_node(m, xyz):
    for k in range(m.n_node):
        if np.allclose(m.coordmat[:, k], xyz):
            return k
    raise AssertionError("node not found")


def test_penalty_force_magnitude():
    """Strictly-interior penetrating node: F = young*S/Lmax*kc*d along +z
    (HAKAI_j.jl:2576-2581), reaction -F/3 on each triangle vertex."""
    from hakai_tpu.ops.contact import _pair_force
    d = 0.01
    m = two_body_model(gap=-d, upper_shift=(0.1, 0.2))  # off-diagonal point
    lm = lower(m)
    st = init_state(lm)
    f = np.asarray(contact_forces(lm, st))
    # total momentum exchange is zero (f on node, -f/3 on 3 vertices)
    np.testing.assert_allclose(f.sum(axis=1), 0.0, atol=1e-10)
    # single directional pair: upper-cube nodes vs slab triangles
    pair = next(p for p in lm.pairs if p.j_instance == 0)
    fp = np.asarray(_pair_force(lm, pair, lm.coord + st.disp, st.velo,
                                st.element_flag))
    nid = _corner_node(m, [0.1, 0.2, 1 - d])
    S, Lmax = 0.125, np.sqrt(0.5)
    expect = 100.0 * S / Lmax * d
    np.testing.assert_allclose(fp[:, nid], [0.0, 0.0, expect], atol=1e-12)


def test_no_force_when_separated():
    m = two_body_model(gap=0.05)
    lm = lower(m)
    st = init_state(lm)
    f = np.asarray(contact_forces(lm, st))
    np.testing.assert_allclose(f, 0.0)


def test_depth_limit_rejects_deep_penetration():
    # d_lim = 0.3 * elementMinSize = 0.15; depth 0.2 must be ignored
    m = two_body_model(gap=-0.2)
    lm = lower(m)
    st = init_state(lm)
    f = np.asarray(contact_forces(lm, st))
    np.testing.assert_allclose(f, 0.0)


def test_friction_force_direction():
    """Sliding node: friction opposes the tangential unit relative velocity,
    |f_fric| = myu*F (HAKAI_j.jl:2606-2618)."""
    from hakai_tpu.ops.contact import _pair_force
    d = 0.01
    m = two_body_model(gap=-d, upper_shift=(0.1, 0.2))
    lm = lower(m)
    st = init_state(lm)
    nid = _corner_node(m, [0.1, 0.2, 1 - d])
    velo = st.velo.at[0, nid].set(3.0)   # slide +x
    st = st.replace(velo=velo)
    pair = next(p for p in lm.pairs if p.j_instance == 0)
    f = np.asarray(_pair_force(lm, pair, lm.coord + st.disp, st.velo,
                               st.element_flag))
    S, Lmax = 0.125, np.sqrt(0.5)
    F = 100.0 * S / Lmax * d
    np.testing.assert_allclose(f[2, nid], F, atol=1e-12)
    np.testing.assert_allclose(f[0, nid], -0.25 * F, atol=1e-12)


def test_erosion_reexposes_interior_face():
    """Killing a surface element activates its twin's buried face and keeps
    the dead element's triangles out (HAKAI_j.jl:767-804 semantics)."""
    m = two_body_model(gap=0.5, nx_low=2)  # separated; only masks matter
    # static_cull would drop the twin inventory (this deck is fracture-free);
    # keep it so the re-exposure mask logic stays exercised
    lm = lower(m, SolverConfig(contact=ContactConfig(static_cull=False)))
    pair = lm.pairs[0]   # nodes of instance 0 vs triangles of instance 1... order
    # pick the pair whose triangle side is the lower slab (instance 0)
    pair = next(p for p in lm.pairs if p.j_instance == 0)
    flag = np.asarray(lm.elem_exists).copy()
    from hakai_tpu.ops.contact import _node_active
    tri_active0 = np.asarray((pair.tri_init |
                              ((pair.tri_twin >= 0) &
                               ~jnp.asarray(flag)[jnp.clip(pair.tri_twin, 0, None)]))
                             & jnp.asarray(flag)[pair.tri_elem])
    n0 = tri_active0.sum()
    # kill element 0 of the lower slab
    flag[0] = False
    jflag = jnp.asarray(flag)
    tri_active1 = np.asarray((pair.tri_init |
                              ((pair.tri_twin >= 0) &
                               ~jflag[jnp.clip(pair.tri_twin, 0, None)]))
                             & jflag[pair.tri_elem])
    te = np.asarray(pair.tri_elem)
    tw = np.asarray(pair.tri_twin)
    # all triangles of the dead element are gone
    assert not tri_active1[te == 0].any()
    # twins of the dead element are now exposed
    assert tri_active1[(tw == 0) & (te != 0)].all()
    # net: removed (element 0's active tris), added (its twins)
    assert tri_active1.sum() == n0 - tri_active0[te == 0].sum() + ((tw == 0) & (te != 0)).sum()


def test_self_contact_excludes_own_element():
    """Self-contact pair: nodes of a triangle's own element are skipped
    (HAKAI_j.jl:2496-2507), so an isolated cube exerts no self force."""
    m = unit_cube_model()
    m.contact_flag = 2
    lm = lower(m)
    assert len(lm.pairs) == 1 and lm.pairs[0].is_self
    st = init_state(lm)
    f = np.asarray(contact_forces(lm, st))
    np.testing.assert_allclose(f, 0.0)


def test_tree_mode_force_assembly():
    """Large shell inventories (the 127k-triangle N22k car) overflow the
    compact lane plan's tile windows and fall back to the sorted-
    contribution segmented tree-sum; validate that epilogue against a
    direct scatter (ops/contact.py tree branch)."""
    import jax
    import jax.numpy as jnp
    from conftest import ref_deck
    from hakai_tpu.io.inp import read_inp_file
    from hakai_tpu.ops.contact import _pad_last
    from hakai_tpu.ops.gather_pallas import blocked_gather

    lm = lower(read_inp_file(ref_deck("car-crash-N22k.inp")),
               SolverConfig(dtype="float32"))
    tree_pairs = [p for p in lm.pairs if p.fgt_segmask is not None]
    lane_pairs = [p for p in lm.pairs if p.fgt_segmask is None]
    assert tree_pairs and lane_pairs     # deck exercises both modes
    N = lm.N
    rng = np.random.default_rng(7)
    for pair in lm.pairs:
        F2 = pair.tri_nodes.shape[1]
        force_t = jnp.asarray(rng.normal(size=(3, F2)), jnp.float32)

        @jax.jit
        def fast(ft, pair=pair):
            ftp = _pad_last(ft, pair.fgt_src)
            if pair.fgt_segmask is not None:
                c = blocked_gather(ftp, pair.plan_fgt)
                for si, s in enumerate(pair.fgt_strides):
                    sh = jnp.pad(c[:, s:], ((0, 0), (0, s)))
                    c = c + jnp.where(pair.fgt_segmask[si][None], sh, 0.0)
                c = _pad_last(c, pair.fgt_k)
                f_tn = blocked_gather(c, pair.plan_pick)
                f_tn = jnp.where(pair.fgt_tnvalid[None], f_tn, 0.0)
            else:
                gt = blocked_gather(ftp, pair.plan_fgt).reshape(
                    3, pair.fgt_vl, pair.fgt_n)
                f_tn = jnp.where(pair.fgt_mask[None], gt, 0.0).sum(axis=1)
            fx = blocked_gather(f_tn, pair.plan_fx)[:, :N]
            return jnp.where(pair.fx_mask[None], fx, 0.0)

        @jax.jit
        def ref(ft, pair=pair):
            g = jnp.zeros((3, N), ft.dtype)
            for v in range(3):
                g = g.at[:, pair.tri_nodes[v]].add(ft, mode="drop")
            return g

        a, b = np.asarray(fast(force_t)), np.asarray(ref(force_t))
        err = np.abs(a - b).max() / max(np.abs(b).max(), 1e-30)
        assert err < 1e-5, (pair.fgt_segmask is not None, err)


def test_inventory_partition_segment_invariants():
    """The active-first face reorder (core/lowering.py) must (a) keep each
    2048-aligned segment's index SET unchanged (so the gather-plan tile
    windows can't degrade) and (b) pack tri_init faces at each segment's
    front (so the narrow phase's block-activity cull drops dead blocks)."""
    m = two_body_model()
    model = lower(m, SolverConfig(contact=ContactConfig(static_cull=False)))
    for pair in model.pairs:
        init = np.asarray(pair.tri_init)
        elem = np.asarray(pair.tri_elem)
        n = init.shape[0]
        for s in range(0, n, 2048):
            seg = init[s:s + 2048]
            k = int(seg.sum())
            # (b) actives form a prefix of the segment
            assert seg[:k].all() and not seg[k:].any()
        # within each group the original (element-order) coherence is kept:
        # stable partition => element ids non-decreasing runs per face pair
        # (weak sanity: actives' element ids are sorted within a segment
        # because the unpermuted inventory is element-ordered)
        for s in range(0, n, 2048):
            seg_el = elem[s:s + 2048][init[s:s + 2048]]
            assert (np.diff(seg_el) >= 0).all()


def test_static_cull_matches_full_inventory():
    """Fracture-free decks lower with the twin inventory culled
    (static_activity); the contact force must be identical to the full-
    inventory lowering on an engaged, off-grid configuration."""
    m = two_body_model(gap=-0.02, upper_shift=(0.13, 0.07))
    lm_cull = lower(m)
    lm_full = lower(m, SolverConfig(contact=ContactConfig(static_cull=False)))
    assert all(p.static_activity for p in lm_cull.pairs)
    assert not any(p.static_activity for p in lm_full.pairs)
    assert (lm_cull.pairs[0].tri_nodes.shape[1]
            < lm_full.pairs[0].tri_nodes.shape[1])
    f_cull = np.asarray(contact_forces(lm_cull, init_state(lm_cull)))
    f_full = np.asarray(contact_forces(lm_full, init_state(lm_full)))
    assert np.abs(f_cull).max() > 0  # engaged
    np.testing.assert_allclose(f_cull, f_full, rtol=1e-12, atol=1e-14)
