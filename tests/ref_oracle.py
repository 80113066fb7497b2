"""Cross-implementation ORACLE: a test-only NumPy transliteration of the
reference solver's math (yozoyugen/HAKAI-fem, HAKAI-v0.0.2/Julia/HAKAI_j.jl).

This module exists so hakai_tpu can be validated the same way the reference
author validated the Julia port against the Matlab original: by diffing
intermediate state values step-by-step ("-> Match with Matlab",
HAKAI_j.jl:397, 864, 923).  It deliberately follows the reference's
FORMULATION (explicit (6,24) B matrices, np.linalg.inv/eigvalsh, dynamic
per-pair triangle lists, grow-on-erosion surface sets) rather than
hakai_tpu's (tensor re-derivation, closed-form eigenvalues, static masked
inventories), so agreement between the two is meaningful evidence of
correctness, not shared code.

ORACLE CODE — NOT PART OF THE FRAMEWORK.  Never import from hakai_tpu.ops /
solver here; only the parsed deck (hakai_tpu.io) is shared, because parsing
is validated separately against deck facts.

Reference anchors (file:line all HAKAI-v0.0.2/Julia unless noted):
  setup              hakai()            HAKAI_j.jl:81-486
  time step          time loop          HAKAI_j.jl:487-951
  element kernel     cal_stress_hexa    HAKAI_j.jl:1033-1371
  B-bar              cal_BVbar_hexa     HAKAI_j.jl:1705-1784
  B final            cal_Bfinal         HAKAI_j.jl:1415-1519
  shape gradients    cal_Pusai_hexa     HAKAI_j.jl:1895-1943
  triaxiality        cal_triax_stress   HAKAI_j.jl:982-1022
  contact            cal_contact_force  HAKAI_j.jl:2248-2706
  surface topology   get_element_face / get_surface_triangle /
                     add_surface_triangle  HAKAI_j.jl:1946-2245
"""
from __future__ import annotations

import numpy as np

from hakai_tpu.io.model import Model

# ---------------------------------------------------------------------------
# shape-function gradients (cal_Pusai_hexa, HAKAI_j.jl:1895-1943)
# ---------------------------------------------------------------------------

_DELTA = np.array([
    [-1.0, -1.0, -1.0], [1.0, -1.0, -1.0], [1.0, 1.0, -1.0], [-1.0, 1.0, -1.0],
    [-1.0, -1.0, 1.0], [1.0, -1.0, 1.0], [1.0, 1.0, 1.0], [-1.0, 1.0, 1.0]])


def _pusai_mat():
    g = 1.0 / np.sqrt(3.0)
    gc = np.array([[-g, -g, -g], [-g, -g, g], [-g, g, -g], [-g, g, g],
                   [g, -g, -g], [g, -g, g], [g, g, -g], [g, g, g]])
    pus = np.zeros((8, 3, 8))
    for k in range(8):
        gzai, eta, tueta = gc[k]
        for i in range(8):
            d = _DELTA[i]
            pus[k, 0, i] = 0.125 * d[0] * (1 + eta * d[1]) * (1 + tueta * d[2])
            pus[k, 1, i] = 0.125 * d[1] * (1 + gzai * d[0]) * (1 + tueta * d[2])
            pus[k, 2, i] = 0.125 * d[2] * (1 + gzai * d[0]) * (1 + eta * d[1])
    return pus


# ---------------------------------------------------------------------------
# surface topology (HAKAI_j.jl:1946-2245)
# ---------------------------------------------------------------------------

# hex8 face node slots (get_element_face, HAKAI_j.jl:1960-1965), 0-based
_FACE_SLOTS = np.array([
    [0, 1, 2, 3], [4, 5, 6, 7], [0, 1, 5, 4],
    [1, 2, 6, 5], [2, 3, 7, 6], [3, 0, 4, 7]])


def _get_element_face(part):
    """faces/faces_eleid/sorted_faces of one part (HAKAI_j.jl:1946-1992).
    Node ids part-local 1-based; eleid part-local 1-based."""
    cd = np.asarray(part.coordmat, float)       # (3, n)
    el = np.asarray(part.elementmat)            # (8, E) 1-based
    nE = part.n_element
    faces = np.zeros((nE * 6, 4), np.int64)
    faces_eleid = np.zeros(nE * 6, np.int64)
    for j in range(nE):
        elem = el[:, j]
        faces[6 * j:6 * j + 6] = elem[_FACE_SLOTS]
        faces_eleid[6 * j:6 * j + 6] = j + 1
        ctr = cd[:, elem - 1].sum(axis=1) / 8.0
        for k in range(6):
            idx = 6 * j + k
            f = faces[idx]
            v1 = cd[:, f[1] - 1] - cd[:, f[0] - 1]
            v2 = cd[:, f[3] - 1] - cd[:, f[0] - 1]
            nv = np.cross(v1, v2)
            vc = ctr - cd[:, f[0] - 1]
            if np.dot(nv, vc) > 0.0:
                faces[idx] = [f[0], f[3], f[2], f[1]]
    sorted_faces = np.sort(faces, axis=1)
    return faces, faces_eleid, sorted_faces


def _get_surface_triangle(surfaces, surfaces_eleid, sorted_faces, n_element,
                          contact_element):
    """Dedup the face inventory to exterior surfaces, filter to the CP's
    element set, split quads into triangles (HAKAI_j.jl:1996-2164).

    Faithful to the reference's loop `for j = 1:nE*6-1`: the LAST face row is
    only ever a dedup partner, never a surface candidate.
    """
    F = surfaces.shape[0]
    keys = [tuple(r) for r in sorted_faces]
    first = {}
    count = {}
    for j, k in enumerate(keys):
        count[k] = count.get(k, 0) + 1
        first.setdefault(k, j)
    keep = [j for j in range(F - 1)            # last row excluded (j<nE*6)
            if count[keys[j]] == 1]
    c_surf = surfaces[keep]
    c_eleid = surfaces_eleid[keep]
    if len(contact_element) != n_element:
        sel = np.isin(c_eleid, contact_element)
        c_surf, c_eleid = c_surf[sel], c_eleid[sel]
    if len(c_surf) == 0:
        return (np.zeros((0, 3), np.int64), np.zeros(0, np.int64),
                np.zeros(0, np.int64))
    tri = np.empty((len(c_surf) * 2, 3), np.int64)
    tri[0::2] = c_surf[:, [0, 1, 2]]
    tri[1::2] = c_surf[:, [2, 3, 0]]
    tri_eleid = np.repeat(c_eleid, 2)
    c_nodes = np.unique(tri.reshape(-1))
    return tri, tri_eleid, c_nodes


def _add_surface_triangle(inst_surfaces, inst_sorted, inst_eleid, ele_id):
    """Faces of other elements matching a deleted element's faces
    (HAKAI_j.jl:2167-2245).  Part-local ids."""
    rows = np.arange(6 * (ele_id - 1), 6 * ele_id)
    add_surf = []
    add_eleid = []
    for j in rows:
        sj = inst_sorted[j]
        for k in range(inst_surfaces.shape[0]):
            if inst_eleid[k] == ele_id:
                continue
            if (sj == inst_sorted[k]).all():
                add_surf.append(inst_surfaces[k])
                add_eleid.append(inst_eleid[k])
                break
    if not add_surf:
        return (np.zeros((0, 3), np.int64), np.zeros(0, np.int64),
                np.zeros(0, np.int64))
    add_surf = np.asarray(add_surf)
    tri = np.empty((len(add_surf) * 2, 3), np.int64)
    tri[0::2] = add_surf[:, [0, 1, 2]]
    tri[1::2] = add_surf[:, [2, 3, 0]]
    eleid = np.repeat(add_eleid, 2)
    nodes = np.unique(tri.reshape(-1))
    return tri, eleid, nodes


def _unique_keep_order(a):
    """Julia unique!: drop later duplicates, keep first-occurrence order."""
    _, idx = np.unique(a, return_index=True)
    return a[np.sort(idx)]


class _CT:
    """One directional contact set (ContactTriangle, HAKAI_j.jl:72-78)."""

    def __init__(self, c_nodes_i, c_nodes_j, c_triangles, c_triangles_eleid,
                 young):
        self.c_nodes_i = c_nodes_i              # global 1-based node ids
        self.c_nodes_j = c_nodes_j
        self.c_triangles = c_triangles          # (T,3) global 1-based
        self.c_triangles_eleid = c_triangles_eleid  # (T,) global 1-based
        self.young = young


# ---------------------------------------------------------------------------
# the oracle solver
# ---------------------------------------------------------------------------

class Oracle:
    """Straight-line reimplementation of hakai() (HAKAI_j.jl:81-978) on a
    parsed deck.  All state is mutable f64 NumPy, ids 1-based as in Julia."""

    def __init__(self, model: Model):
        self.m = model
        self.nNode = model.n_node
        self.nElement = model.n_element
        self.fn = self.nNode * 3
        self.coordmat = np.asarray(model.coordmat, float)      # (3, N)
        self.elementmat = np.asarray(model.elementmat)         # (8, E) 1-based
        self.element_material = np.asarray(model.element_material)  # 1-based
        self.element_instance = np.asarray(model.element_instance)  # 1-based
        self.contact_flag = model.contact_flag

        # material precompute (HAKAI_j.jl:142-172)
        self.mats = []
        self.flag_fracture = any(
            (len(mt.ductile) > 0) or mt.has_failure_stress
            for mt in model.materials)
        for mt in model.materials:
            young, poisson = mt.young, mt.poisson
            G = young / 2.0 / (1.0 + poisson)
            d1, d2 = 1.0 - poisson, poisson
            d3 = (1.0 - 2.0 * poisson) / 2.0
            Dmat = (young / (1.0 + poisson) / (1.0 - 2.0 * poisson)
                    * np.array([[d1, d2, d2, 0, 0, 0],
                                [d2, d1, d2, 0, 0, 0],
                                [d2, d2, d1, 0, 0, 0],
                                [0, 0, 0, d3, 0, 0],
                                [0, 0, 0, 0, d3, 0],
                                [0, 0, 0, 0, 0, d3]]))
            self.mats.append(dict(
                G=G, Dmat=Dmat, density=mt.density, young=young,
                plastic=np.asarray(mt.plastic, float),
                Hd=np.asarray(mt.Hd, float),
                ductile=np.asarray(mt.ductile, float)))

        self.d_time = model.d_time * np.sqrt(model.mass_scaling)
        self.time_num = int(model.end_time / self.d_time)
        self.Pusai = _pusai_mat()                              # (8,3,8)

        # element volume + lumped mass (HAKAI_j.jl:183-221)
        E = self.nElement
        pos_e = self.coordmat[:, self.elementmat - 1]          # (3,8,E)
        pos_e = np.transpose(pos_e, (2, 0, 1))                 # (E,3,8)
        V = np.zeros(E)
        for k in range(8):
            J = np.einsum('ai,ebi->eab', self.Pusai[k], pos_e)
            V += np.linalg.det(J)
        self.elementVolume = V
        diag_M = np.zeros(self.fn)
        for e in range(E):
            dens = self.mats[self.element_material[e] - 1]['density']
            node_mass = dens * V[e] / 8.0
            dofs = (self.elementmat[:, e] - 1) * 3
            np.add.at(diag_M, dofs, node_mass)
            np.add.at(diag_M, dofs + 1, node_mass)
            np.add.at(diag_M, dofs + 2, node_mass)
        self.diag_M = diag_M * model.mass_scaling
        self.diag_C = np.zeros(self.fn)                        # C = 0.0

        # element size (HAKAI_j.jl:405-421)
        p1 = self.coordmat[:, self.elementmat[0] - 1]
        L1 = np.linalg.norm(p1 - self.coordmat[:, self.elementmat[1] - 1], axis=0)
        L2 = np.linalg.norm(p1 - self.coordmat[:, self.elementmat[3] - 1], axis=0)
        L3 = np.linalg.norm(p1 - self.coordmat[:, self.elementmat[4] - 1], axis=0)
        sizes = np.stack([L1, L2, L3])
        self.elementMinSize = sizes.min()
        self.elementMaxSize = sizes.max()

        # state (HAKAI_j.jl:225-239, 425-456)
        self.disp = np.zeros(self.fn)
        self.disp_pre = np.zeros(self.fn)
        self.velo = np.zeros(self.fn)
        self.Q = np.zeros(self.fn)
        self.position = self.coordmat.copy()
        for ic in model.ics:
            for dof_arr, val in zip(ic.dof, ic.value):
                self.disp_pre[np.asarray(dof_arr) - 1] = -val * self.d_time
                self.velo[np.asarray(dof_arr) - 1] = val
        self.integ_stress = np.zeros((6, E, 8))   # [:, e, i] == (e)*8+i col
        self.integ_strain = np.zeros((6, E, 8))
        self.eq_ps = np.zeros((E, 8))
        self.triax = np.zeros((E, 8))
        self.element_flag = np.ones(E, np.int64)
        self.yield_stress = np.zeros((E, 8))
        for e in range(E):
            pp = self.mats[self.element_material[e] - 1]['plastic']
            if len(pp):
                self.yield_stress[e] = pp[0, 0]

        # element dof gather index (E,24): du[e,3i+a] = d_disp[dof]
        dofs = (self.elementmat.T - 1) * 3                     # (E,8)
        self.dof24 = (dofs[:, :, None] + np.arange(3)).reshape(E, 24)

        self._setup_contact()
        self.t = 0

    # -- contact setup (HAKAI_j.jl:243-402) --------------------------------
    def _setup_contact(self):
        self.CT = []
        self.instance_pair = []
        m = self.m
        if self.contact_flag < 1:
            return
        self.inst_faces = []
        for inst in m.instances:
            part = m.parts[inst.part_id - 1]
            self.inst_faces.append(_get_element_face(part))

        cps = []
        if len(m.cps) == 0:                     # ALL EXTERIOR
            ni = len(m.instances)
            if ni > 1:
                for i in range(1, ni + 1):
                    js = i if self.contact_flag == 2 else i + 1
                    for j in range(js, ni + 1):
                        cps.append((i, j,
                                    np.arange(1, m.instances[i - 1].n_element + 1),
                                    np.arange(1, m.instances[j - 1].n_element + 1)))
            else:
                cps.append((1, 1, np.arange(1, m.instances[0].n_element + 1),
                            np.arange(1, m.instances[0].n_element + 1)))
        else:
            for cp in m.cps:
                cps.append((cp.instance_id_1, cp.instance_id_2,
                            np.asarray(cp.elements_1), np.asarray(cp.elements_2)))

        # per-CP surface triangles for both sides (HAKAI_j.jl:322-336)
        cp_tris = []
        for (i1, i2, els1, els2) in cps:
            f1, fe1, sf1 = self.inst_faces[i1 - 1]
            t1 = _get_surface_triangle(f1, fe1, sf1,
                                       m.instances[i1 - 1].n_element, els1)
            f2, fe2, sf2 = self.inst_faces[i2 - 1]
            t2 = _get_surface_triangle(f2, fe2, sf2,
                                       m.instances[i2 - 1].n_element, els2)
            cp_tris.append((t1, t2))

        # directional CT entries (HAKAI_j.jl:339-398)
        for ci, (i1, i2, els1, els2) in enumerate(cps):
            dirs = [(i1, i2)] if i1 == i2 else [(i1, i2), (i2, i1)]
            for (ii, jj) in dirs:
                inst_i = m.instances[ii - 1]
                inst_j = m.instances[jj - 1]
                young = m.materials[inst_j.material_id - 1].young
                (tri1, te1, cn1), (tri2, te2, cn2) = cp_tris[ci]
                if i1 == ii:
                    c_nodes_i = cn1 + inst_i.node_offset
                    c_nodes_j = cn2 + inst_j.node_offset
                    tri = tri2 + inst_j.node_offset
                    te = te2 + inst_j.element_offset
                else:
                    c_nodes_i = cn2 + inst_i.node_offset
                    c_nodes_j = cn1 + inst_j.node_offset
                    tri = tri1 + inst_j.node_offset
                    te = te1 + inst_j.element_offset
                self.CT.append(_CT(c_nodes_i.copy(), c_nodes_j.copy(),
                                   tri.copy(), te.copy(), young))
                self.instance_pair.append((ii, jj))

    # -- one time step (HAKAI_j.jl:487-951) --------------------------------
    def step(self):
        self.t += 1
        dt = self.d_time
        current_time = self.t * dt
        external_force = np.zeros(self.fn)
        if self.contact_flag >= 1:
            external_force += self._contact_force()

        # central difference (HAKAI_j.jl:562-567)
        a1 = self.diag_M / dt ** 2
        a2 = self.diag_C / (2.0 * dt)
        disp_new = (external_force - self.Q
                    + a1 * (2.0 * self.disp - self.disp_pre)
                    + a2 * self.disp_pre) / (a1 + a2)

        # BCs (HAKAI_j.jl:585-617)
        for bc in self.m.bcs:
            amp = 1.0
            if bc.amp_name and bc.amplitude is not None:
                a_t = np.asarray(bc.amplitude.time)
                a_v = np.asarray(bc.amplitude.value)
                time_index = 0
                for j in range(len(a_t) - 1):
                    if a_t[j] <= current_time <= a_t[j + 1]:
                        time_index = j
                        break
                amp = (a_v[time_index]
                       + (a_v[time_index + 1] - a_v[time_index])
                       * (current_time - a_t[time_index])
                       / (a_t[time_index + 1] - a_t[time_index]))
            for dof_arr, v in zip(bc.dof, bc.value):
                disp_new[np.asarray(dof_arr) - 1] = v * amp

        d_disp = disp_new - self.disp
        self.disp_pre = self.disp.copy()
        self.disp = disp_new
        self.velo = d_disp / dt
        self.position = self.coordmat + self.disp.reshape(-1, 3).T

        Qe = self._cal_stress_hexa(d_disp)
        Q = np.zeros(self.fn)
        np.add.at(Q, self.dof24.reshape(-1), Qe.reshape(-1))
        self.Q = Q

        self._cal_triax_stress()

        deleted = []
        if self.flag_fracture:
            deleted = self._fracture()
        if self.contact_flag > 0:
            self._update_surface(deleted)

    # -- element kernel (cal_stress_hexa, HAKAI_j.jl:1033-1371) ------------
    def _cal_stress_hexa(self, d_disp):
        E = self.nElement
        alive = self.element_flag == 1
        du = d_disp[self.dof24]                                # (E,24)
        pos_e = np.transpose(self.position[:, self.elementmat - 1], (2, 0, 1))

        # guard dead/degenerate elements out of the batched linalg
        pus = self.Pusai
        with np.errstate(all='ignore'):
            # BVbar + volume (cal_BVbar_hexa, HAKAI_j.jl:1705-1784)
            BVbar = np.zeros((E, 6, 24))
            V = np.zeros(E)
            P_all = np.zeros((8, E, 3, 8))     # true-inverse gradients per ip
            detJ_all = np.zeros((8, E))
            for k in range(8):
                J = np.einsum('ai,ebi->eab', pus[k], pos_e)
                det = np.linalg.det(J)
                det = np.where(alive & (det != 0), det, 1.0)
                Jsafe = np.where(alive[:, None, None], J, np.eye(3))
                invJ = np.linalg.inv(Jsafe)
                # reference quirk: BVbar/V use |detJ| (and therefore a
                # sign-flipped inverse) when detJ < 0 (HAKAI_j.jl:1736-1744)
                detabs = np.abs(det)
                P_bv = np.einsum('eab,bi->eai',
                                 invJ * np.sign(det)[:, None, None], pus[k])
                V += detabs
                # column layout: row[e, 3*i+c] = P_bv[e,c,i]
                row = (P_bv.transpose(0, 2, 1)
                       * (detabs / 3.0)[:, None, None]).reshape(E, 24)
                BVbar[:, 0] += row
                BVbar[:, 1] += row
                BVbar[:, 2] += row
                # Bfinal uses the TRUE inverse and detJ (HAKAI_j.jl:1442-1455)
                P_all[k] = np.einsum('eab,bi->eai', invJ, pus[k])
                detJ_all[k] = np.where(alive, np.linalg.det(J), 1.0)
            Vsafe = np.where(V != 0, V, 1.0)
            BVbar /= Vsafe[:, None, None]
            self.elementVolume = np.where(alive, V, self.elementVolume)

            Qe = np.zeros((E, 24))
            mat_ids = self.element_material
            for k in range(8):
                P = P_all[k]                                   # (E,3,8)
                detJ = detJ_all[k]
                B = np.zeros((E, 6, 24))
                cols = np.arange(8) * 3
                Px, Py, Pz = P[:, 0], P[:, 1], P[:, 2]          # (E,8)
                B[:, 0, cols] += Px
                B[:, 1, cols + 1] += Py
                B[:, 2, cols + 2] += Pz
                B[:, 3, cols] += Py
                B[:, 3, cols + 1] += Px
                B[:, 4, cols + 1] += Pz
                B[:, 4, cols + 2] += Py
                B[:, 5, cols] += Pz
                B[:, 5, cols + 2] += Px
                vol = np.stack([Px, Py, Pz], axis=2).reshape(E, 24) / 3.0
                for r in range(3):
                    B[:, r] += -vol + BVbar[:, r]

                d_e = np.einsum('erc,ec->er', B, du)            # (E,6)
                pre = self.integ_stress[:, :, k].T.copy()       # (E,6)
                final = np.empty_like(pre)
                d_ep_out = np.zeros(E)
                dH_out = np.zeros(E)
                for mi, mat in enumerate(self.mats):
                    sel = mat_ids == mi + 1
                    if not sel.any():
                        continue
                    d_o = d_e[sel] @ mat['Dmat'].T
                    f = pre[sel] + d_o
                    pp = mat['plastic']
                    if len(pp):
                        tri_s = f
                        mean = tri_s[:, :3].mean(axis=1)
                        dev = tri_s.copy()
                        dev[:, :3] -= mean[:, None]
                        mises = np.sqrt(1.5 * (dev[:, 0]**2 + dev[:, 1]**2
                                               + dev[:, 2]**2
                                               + 2 * (dev[:, 3]**2 + dev[:, 4]**2
                                                      + dev[:, 5]**2)))
                        y = self.yield_stress[sel, k]
                        yld = mises > y
                        if yld.any():
                            eq = self.eq_ps[sel, k]
                            npp = len(pp)
                            if npp >= 2:
                                # first j>=2 with eq <= pp[j,2]; else npp-1
                                # (HAKAI_j.jl:1257-1267)
                                pidx = np.searchsorted(pp[1:, 1], eq,
                                                       side='left')
                                pidx = np.minimum(pidx, npp - 2)
                                H = mat['Hd'][pidx]
                            else:
                                H = np.zeros(len(eq))
                            d_ep = (mises - y) / (3 * mat['G'] + H)
                            scale = (y + H * d_ep) / np.where(mises == 0, 1.0,
                                                              mises)
                            newdev = dev * scale[:, None]
                            newf = newdev.copy()
                            newf[:, :3] += mean[:, None]
                            f = np.where(yld[:, None], newf, f)
                            d_ep_sel = np.where(yld, d_ep, 0.0)
                            dH_sel = np.where(yld, H * d_ep, 0.0)
                            d_ep_out[sel] = d_ep_sel
                            dH_out[sel] = dH_sel
                    final[sel] = f

                upd = alive
                self.eq_ps[upd, k] += d_ep_out[upd]
                self.yield_stress[upd, k] += dH_out[upd]
                self.integ_strain[:, upd, k] += d_e[upd].T
                self.integ_stress[:, upd, k] = final[upd].T
                q = np.einsum('erc,er->ec', B, final) * detJ[:, None]
                Qe += np.where(upd[:, None], q, 0.0)
        return Qe

    # -- triaxiality (cal_triax_stress, HAKAI_j.jl:982-1022) ---------------
    def _cal_triax_stress(self):
        s = self.integ_stress                                  # (6,E,8)
        T = np.empty((self.nElement, 8, 3, 3))
        T[..., 0, 0] = s[0].reshape(self.nElement, 8)
        T[..., 1, 1] = s[1].reshape(self.nElement, 8)
        T[..., 2, 2] = s[2].reshape(self.nElement, 8)
        T[..., 0, 1] = T[..., 1, 0] = s[3]
        T[..., 1, 2] = T[..., 2, 1] = s[4]
        T[..., 0, 2] = T[..., 2, 0] = s[5]
        p = np.linalg.eigvalsh(T)                              # (E,8,3)
        oeq = np.sqrt(0.5 * ((p[..., 0] - p[..., 1]) ** 2
                             + (p[..., 1] - p[..., 2]) ** 2
                             + (p[..., 2] - p[..., 0]) ** 2))
        v = p.sum(axis=-1) / 3.0 / np.where(oeq < 1e-10, 1.0, oeq)
        self.triax = np.where(oeq < 1e-10, 0.0, v)

    # -- fracture (HAKAI_j.jl:684-764) --------------------------------------
    def _fracture(self):
        deleted = []
        for e in range(self.nElement):
            mat = self.mats[self.element_material[e] - 1]
            duct = mat['ductile']
            nd = len(duct)
            if nd == 0:
                continue
            v_e = self.eq_ps[e].mean()
            t_e = self.triax[e].mean()
            if t_e < 0:
                continue
            fr_e = duct[nd - 1, 0]
            for j in range(nd - 1):
                if duct[j, 1] <= t_e < duct[j + 1, 1]:
                    fr_e = (duct[j, 0] + (duct[j + 1, 0] - duct[j, 0])
                            / (duct[j + 1, 1] - duct[j, 1])
                            * (t_e - duct[j, 1]))
                    break
            if v_e >= fr_e and self.element_flag[e] == 1:
                self.element_flag[e] = 0
                deleted.append(e + 1)
                self.integ_stress[:, e, :] = 0.0
                self.integ_strain[:, e, :] = 0.0
        return deleted

    # -- surface repair (HAKAI_j.jl:767-804) --------------------------------
    def _update_surface(self, deleted):
        for gi in deleted:
            inst_id = self.element_instance[gi - 1]            # 1-based
            inst = self.m.instances[inst_id - 1]
            ele_id = gi - inst.element_offset
            faces, eleid, sorted_f = self.inst_faces[inst_id - 1]
            tri, te, nodes = _add_surface_triangle(faces, sorted_f, eleid,
                                                   ele_id)
            for c, (ii, jj) in enumerate(self.instance_pair):
                ct = self.CT[c]
                if ii == inst_id:
                    ct.c_nodes_i = _unique_keep_order(np.concatenate(
                        [ct.c_nodes_i, nodes + inst.node_offset]))
                elif jj == inst_id:
                    ct.c_nodes_j = _unique_keep_order(np.concatenate(
                        [ct.c_nodes_j, nodes + inst.node_offset]))
                    ct.c_triangles_eleid = np.concatenate(
                        [ct.c_triangles_eleid, te + inst.element_offset])
                    ct.c_triangles = np.vstack(
                        [ct.c_triangles, tri + inst.node_offset])

    # -- contact force (cal_contact_force, HAKAI_j.jl:2248-2706) -----------
    def _contact_force(self):
        cf = np.zeros(self.fn)
        pos = self.position                                    # (3,N)
        d_lim = self.elementMinSize * 0.3
        myu = 0.25
        kc_o = kc_s = 1.0
        Cr_o = Cr_s = 0.0

        for c, (ii, jj) in enumerate(self.instance_pair):
            ct = self.CT[c]
            ni_idx = ct.c_nodes_i - 1
            nj_idx = ct.c_nodes_j - 1
            if len(ni_idx) == 0 or len(ct.c_triangles) == 0:
                continue
            pi = pos[:, ni_idx]                                # (3,K)
            pj = pos[:, nj_idx]
            min_i, max_i = pi.min(axis=1), pi.max(axis=1)
            min_j, max_j = pj.min(axis=1), pj.max(axis=1)
            rmin = np.maximum(min_i, min_j)
            rmax = np.minimum(max_i, max_j)
            if (rmin > rmax).any():
                continue
            all_min = np.minimum(min_i, min_j)

            ddiv = self.elementMaxSize * (0.6 if ii == jj else 1.1)
            kc = kc_s if ii == jj else kc_o
            Cr = Cr_s if ii == jj else Cr_o

            map_i = np.ceil((pi - all_min[:, None]) / ddiv).astype(np.int64)

            tri = ct.c_triangles                               # (T,3) 1-based
            te = ct.c_triangles_eleid                          # (T,)
            act = self.element_flag[te - 1] == 1
            q0 = pos[:, tri[:, 0] - 1]                         # (3,T)
            q1 = pos[:, tri[:, 1] - 1]
            q2 = pos[:, tri[:, 2] - 1]
            lo = (((q0 < rmin[:, None]) & (q1 < rmin[:, None])
                   & (q2 < rmin[:, None])).any(axis=0))
            hi = (((q0 > rmax[:, None]) & (q1 > rmax[:, None])
                   & (q2 > rmax[:, None])).any(axis=0))
            act = act & ~lo & ~hi
            if not act.any():
                continue
            sel = np.nonzero(act)[0]
            q0s, q1s, q2s = q0[:, sel], q1[:, sel], q2[:, sel]
            tes = te[sel]
            tris = tri[sel]

            ctr = (q0s + q1s + q2s) / 3.0
            Rmax = np.maximum(np.maximum(
                np.linalg.norm(q0s - ctr, axis=0),
                np.linalg.norm(q1s - ctr, axis=0)),
                np.linalg.norm(q2s - ctr, axis=0))
            v1 = q1s - q0s
            v2 = q2s - q0s
            L1 = np.linalg.norm(v1, axis=0)
            L2 = np.linalg.norm(v2, axis=0)
            Lmax = np.maximum(L1, L2)
            n = np.cross(v1.T, v2.T).T
            n /= np.linalg.norm(n, axis=0)[None]
            d12 = (v1 * v2).sum(axis=0)
            S = 0.5 * np.sqrt(L1 ** 2 * L2 ** 2 - d12 ** 2)

            # A = [v1 v2 -n] per triangle; x = A^-1 (p - q0)
            A = np.stack([v1.T, v2.T, -n.T], axis=2)           # (T,3,3)
            invA = np.linalg.inv(A)

            map_j0 = np.ceil((q0s - all_min[:, None]) / ddiv).astype(np.int64)

            # (T,K) masks
            cell_ok = (np.abs(map_j0[:, :, None] - map_i[:, None, :]) <= 1
                       ).all(axis=0)
            in_box = ((pi >= rmin[:, None]) & (pi <= rmax[:, None])).all(axis=0)
            mask = cell_ok & in_box[None, :]
            if ii == jj:
                enodes = self.elementmat[:, tes - 1]           # (8,T)
                own = (enodes[:, :, None] == ct.c_nodes_i[None, None, :]
                       ).any(axis=0)
                mask &= ~own
            dpc = np.linalg.norm(pi[:, None, :] - ctr[:, :, None], axis=0)
            mask &= dpc < Rmax[:, None]

            b = pi[:, None, :] - q0s[:, :, None]               # (3,T,K)
            x = np.einsum('tab,btk->atk', invA, b)             # (3,T,K)
            x1, x2, d = x[0], x[1], x[2]
            mask &= (x1 >= 0) & (x2 >= 0) & (x1 + x2 <= 1.0) \
                & (d > 0) & (d <= d_lim)
            if not mask.any():
                continue

            k_pen = ct.young * S / Lmax * kc                   # (T,)
            F = np.where(mask, k_pen[:, None] * d, 0.0)
            vi = self.velo.reshape(-1, 3).T[:, ni_idx]         # (3,K)
            vj0 = self.velo.reshape(-1, 3).T[:, tris[:, 0] - 1]  # (3,T)
            vrel = vi[:, None, :] - vj0[:, :, None]            # (3,T,K)
            mag = np.linalg.norm(vrel, axis=0)
            ve = np.where(mag > 0, vrel / np.where(mag == 0, 1.0, mag), 0.0)
            dot_vn = (ve * n[:, :, None]).sum(axis=0)
            vs = ve - dot_vn * n[:, :, None]
            mass_i = self.diag_M[ct.c_nodes_i - 1]             # ref indexes by
            # node id (HAKAI_j.jl:2592) — inert while Cr == 0
            Cd = 2.0 * np.sqrt(mass_i[None, :] * k_pen[:, None]) * Cr
            f = (F[None] * n[:, :, None] - myu * F[None] * vs
                 - np.where(mask, Cd, 0.0)[None] * vrel)
            f = np.where(mask[None], f, 0.0)                   # (3,T,K)

            f_i = f.sum(axis=1)                                # (3,K)
            f_t = f.sum(axis=2) / 3.0                          # (3,T)
            dof_i = (ni_idx * 3)[None, :] + np.arange(3)[:, None]
            np.add.at(cf, dof_i.reshape(-1), f_i.reshape(-1))
            for v in range(3):
                dof_t = ((tris[:, v] - 1) * 3)[None, :] + np.arange(3)[:, None]
                np.add.at(cf, dof_t.reshape(-1), -f_t.reshape(-1))
        return cf
