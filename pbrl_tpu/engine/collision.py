"""Contact generation: static candidate pairs -> fixed-size Contact batch.

Replacement for MJX's collision drivers (the reference gets contacts
implicitly through ``mjx.step``, SURVEY.md §2.2). TPU-first design choices:

* The candidate pair list is computed once at model-compile time
  (``Model.pair_geom*``/``plane_*``), honouring the MJCF ``<exclude>`` pairs
  (``final_humanoid.xml:116-125``), same-body and parent-child filtering.
* Pairs are *grouped by type signature* and each group is evaluated as one
  vectorized computation, so the traced program contains a handful of fused
  elementwise blocks rather than per-pair scalar code.
* The contact count is a static function of the model (``ncon_max``);
  inactive slots carry ``dist = +inf`` and are masked in the solver. Shapes
  never depend on state, keeping the whole step XLA-compilable.

Exact narrow-phase: plane-{sphere, capsule, box-corners}, sphere-sphere,
sphere-capsule, sphere-box, capsule-capsule. Approximations (documented):
capsule-box uses two-pass closest-point refinement; box-box uses a
corner-vs-box manifold (8 corners of each box probed against the other,
16 candidate contacts per pair — catches corner-face and face-face
configurations; pure edge-edge crossings without corner penetration are
missed, negligible at 500 Hz substeps for the humanoid's foot-foot pair).
"""

from __future__ import annotations

from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from pbrl_tpu.maths import quaternion as quat
from pbrl_tpu.maths.numeric import safe_norm
from pbrl_tpu.model.spec import GeomType, Model
from pbrl_tpu.engine.data import Contact, Data

# All 8 corners per box-plane pair (matches the field/kernel program; the
# round-2 deepest-4 top-k diverged from the kernel whenever >4 corners
# penetrated, e.g. a flat deep foot under RSI reset noise).
_BOX_CORNERS_PER_CONTACT = 8


def _pair_groups(model: Model):
    """Static grouping of candidate pairs by (type1, type2) signature."""
    groups = {}
    for g1, g2 in zip(model.pair_geom1, model.pair_geom2):
        t1, t2 = model.geom_type[g1], model.geom_type[g2]
        groups.setdefault((t1, t2), []).append((g1, g2))
    return groups


def _plane_groups(model: Model):
    groups = {}
    for gp, go in zip(model.plane_geom, model.plane_other):
        groups.setdefault(model.geom_type[go], []).append((gp, go))
    return groups


def plane_contact_count(t: int) -> int:
    """Contacts emitted per plane-geom pair of geom type ``t``."""
    return {GeomType.SPHERE: 1, GeomType.CAPSULE: 2,
            GeomType.BOX: _BOX_CORNERS_PER_CONTACT}[t]


def pair_contact_count(t1: int, t2: int) -> int:
    """Contacts emitted per geom-geom pair (box-box: 8 corners each way)."""
    return 16 if (t1, t2) == (GeomType.BOX, GeomType.BOX) else 1


def ncon_max(model: Model) -> int:
    """Static maximum contact count for this model."""
    n = 0
    for t, pairs in _plane_groups(model).items():
        n += plane_contact_count(t) * len(pairs)
    for (t1, t2), pairs in _pair_groups(model).items():
        n += pair_contact_count(t1, t2) * len(pairs)
    return n


# ---------------------------------------------------------------------------
# Primitive helpers (vectorized over a leading pair axis)
# ---------------------------------------------------------------------------


def _make_frame(normal: jnp.ndarray) -> jnp.ndarray:
    """(n, 3, 3) orthonormal frame rows [n, t1, t2] from unit normals."""
    # pick the world axis least aligned with n, branchlessly
    ref = jnp.where(
        jnp.abs(normal[..., 0:1]) < 0.5,
        jnp.broadcast_to(jnp.array([1.0, 0.0, 0.0]), normal.shape),
        jnp.broadcast_to(jnp.array([0.0, 1.0, 0.0]), normal.shape),
    )
    t1 = jnp.cross(normal, ref)
    t1 = t1 / jnp.maximum(safe_norm(t1, axis=-1, keepdims=True), 1e-12)
    t2 = jnp.cross(normal, t1)
    return jnp.stack([normal, t1, t2], axis=-2)


def _sphere_sphere(c1, r1, c2, r2):
    """Returns (dist, pos, normal) for point-sphere pairs; normal 1 -> 2."""
    d = c2 - c1
    ln = safe_norm(d, axis=-1, keepdims=True)
    n = d / jnp.maximum(ln, 1e-9)
    dist = ln[..., 0] - (r1 + r2)
    pos = c1 + n * (r1 + 0.5 * dist)[..., None]
    return dist, pos, n


def _closest_on_segment(a, b, p):
    """Closest point to ``p`` on segment ``a``-``b`` (vectorized)."""
    ab = b - a
    t = jnp.sum((p - a) * ab, axis=-1) / jnp.maximum(jnp.sum(ab * ab, axis=-1), 1e-12)
    t = jnp.clip(t, 0.0, 1.0)
    return a + t[..., None] * ab


def _segment_segment(p1, q1, p2, q2):
    """Closest points between two segments (Ericson, branchless clamped)."""
    d1 = q1 - p1
    d2 = q2 - p2
    r = p1 - p2
    a = jnp.sum(d1 * d1, axis=-1)
    e = jnp.sum(d2 * d2, axis=-1)
    f = jnp.sum(d2 * r, axis=-1)
    c = jnp.sum(d1 * r, axis=-1)
    b = jnp.sum(d1 * d2, axis=-1)
    denom = a * e - b * b
    s = jnp.where(denom > 1e-12, (b * f - c * e) / jnp.maximum(denom, 1e-12), 0.0)
    s = jnp.clip(s, 0.0, 1.0)
    t = (b * s + f) / jnp.maximum(e, 1e-12)
    t_cl = jnp.clip(t, 0.0, 1.0)
    s = jnp.clip((b * t_cl - c) / jnp.maximum(a, 1e-12), 0.0, 1.0)
    cp1 = p1 + s[..., None] * d1
    cp2 = p2 + t_cl[..., None] * d2
    return cp1, cp2


def _point_box(p_local, half):
    """Closest point on box (local frame) to p; handles interior points.

    Returns (closest_local, normal_local, signed_dist_to_surface).
    """
    clamped = jnp.clip(p_local, -half, half)
    delta = p_local - clamped
    # safe_norm: delta is EXACTLY zero for interior points — linalg.norm's
    # backward would be 0/0 NaN there despite the `outside` where-select.
    out_d = safe_norm(delta, axis=-1)
    outside = out_d > 1e-9
    n_out = delta / jnp.maximum(out_d, 1e-9)[..., None]
    # interior: push out through the nearest face
    face_gap = half - jnp.abs(p_local)  # (n, 3) >= 0 when inside
    k = jnp.argmin(face_gap, axis=-1)
    sgn = jnp.sign(jnp.take_along_axis(p_local, k[..., None], axis=-1))[..., 0]
    sgn = jnp.where(sgn == 0, 1.0, sgn)
    n_in = jax.nn.one_hot(k, 3, dtype=p_local.dtype) * sgn[..., None]
    gap_in = jnp.take_along_axis(face_gap, k[..., None], axis=-1)[..., 0]
    closest_in = p_local + n_in * gap_in[..., None]
    normal = jnp.where(outside[..., None], n_out, n_in)
    closest = jnp.where(outside[..., None], clamped, closest_in)
    dist = jnp.where(outside, out_d, -gap_in)
    return closest, normal, dist


def _capsule_ends(pos, q, hh):
    axis = quat.rotate(q, jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0]), pos.shape))
    return pos - axis * hh[..., None], pos + axis * hh[..., None]


# ---------------------------------------------------------------------------
# Main entry
# ---------------------------------------------------------------------------


def collide(model: Model, data: Data) -> Data:
    """Populate ``data.contact`` with all candidate contacts."""
    ncon = ncon_max(model)
    if ncon == 0:
        return data

    gxpos, gxquat = data.geom_xpos, data.geom_xquat
    size = model.geom_size
    fric = model.geom_friction
    marg = model.geom_margin
    gbody = model.geom_bodyid  # static tuple

    dists: List[jnp.ndarray] = []
    poss: List[jnp.ndarray] = []
    frames: List[jnp.ndarray] = []
    frics: List[jnp.ndarray] = []
    margs: List[jnp.ndarray] = []
    b1s: List[int] = []
    b2s: List[int] = []

    def emit(dist, pos, normal, pair_fric, pair_marg, body1, body2, per=1):
        # dist: (n,) or (n, per); pos: matching (+3); normal likewise
        if per > 1:
            dist = dist.reshape(-1)
            pos = pos.reshape(-1, 3)
            normal = normal.reshape(-1, 3)
            pair_fric = jnp.repeat(pair_fric, per)
            pair_marg = jnp.repeat(pair_marg, per)
            body1 = [b for b in body1 for _ in range(per)]
            body2 = [b for b in body2 for _ in range(per)]
        dists.append(dist)
        poss.append(pos)
        frames.append(_make_frame(normal))
        frics.append(pair_fric)
        margs.append(pair_marg)
        b1s.extend(body1)
        b2s.extend(body2)

    def gather(ids):
        idx = jnp.asarray(ids, jnp.int32)
        return gxpos[idx], gxquat[idx], size[idx], fric[idx], marg[idx]

    # ----- plane contacts (normal always points plane -> geom: body1=plane) --
    for t, pairs in sorted(_plane_groups(model).items()):
        pids = [p for p, _ in pairs]
        oids = [o for _, o in pairs]
        ppos, pquat, _, pfric, pmarg = gather(pids)
        opos, oquat, osize, ofric, omarg = gather(oids)
        n = quat.rotate(pquat, jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0]), ppos.shape))
        cfric = jnp.maximum(pfric, ofric)
        cmarg = jnp.maximum(pmarg, omarg)
        body1 = [gbody[p] for p in pids]
        body2 = [gbody[o] for o in oids]

        if t == GeomType.SPHERE:
            r = osize[:, 0]
            h = jnp.sum(n * (opos - ppos), axis=-1)
            dist = h - r
            pos = opos - n * (r + 0.5 * dist)[:, None]
            emit(dist, pos, n, cfric, cmarg, body1, body2)
        elif t == GeomType.CAPSULE:
            r, hh = osize[:, 0], osize[:, 1]
            e0, e1 = _capsule_ends(opos, oquat, hh)
            ends = jnp.stack([e0, e1], axis=1)  # (n, 2, 3)
            h = jnp.sum(n[:, None, :] * (ends - ppos[:, None, :]), axis=-1)
            dist = h - r[:, None]
            pos = ends - n[:, None, :] * (r[:, None] + 0.5 * dist)[..., None]
            emit(dist, pos, jnp.broadcast_to(n[:, None, :], ends.shape), cfric, cmarg, body1, body2, per=2)
        elif t == GeomType.BOX:
            half = osize  # (n, 3)
            corners_l = jnp.asarray(
                np.array([[sx, sy, sz] for sx in (-1, 1) for sy in (-1, 1) for sz in (-1, 1)], np.float32)
            )  # (8, 3)
            cl = corners_l[None, :, :] * half[:, None, :]
            cw = opos[:, None, :] + quat.rotate(oquat[:, None, :], cl)  # (n, 8, 3)
            dist = jnp.sum(n[:, None, :] * (cw - ppos[:, None, :]), axis=-1)  # (n, 8)
            pos = cw - n[:, None, :] * (0.5 * dist)[..., None]
            emit(dist, pos, jnp.broadcast_to(n[:, None, :], cw.shape), cfric,
                 cmarg, body1, body2, per=8)
        else:
            raise NotImplementedError(f"plane vs geom type {t}")

    # ----- geom-geom contacts (normal points 1 -> 2) -------------------------
    for (t1, t2), pairs in sorted(_pair_groups(model).items()):
        ids1 = [a for a, _ in pairs]
        ids2 = [b for _, b in pairs]
        p1, q1, s1, f1, m1 = gather(ids1)
        p2, q2, s2, f2, m2 = gather(ids2)
        cfric = jnp.maximum(f1, f2)
        cmarg = jnp.maximum(m1, m2)
        body1 = [gbody[g] for g in ids1]
        body2 = [gbody[g] for g in ids2]

        if (t1, t2) == (GeomType.SPHERE, GeomType.SPHERE):
            dist, pos, n = _sphere_sphere(p1, s1[:, 0], p2, s2[:, 0])
        elif (t1, t2) == (GeomType.SPHERE, GeomType.CAPSULE):
            e0, e1 = _capsule_ends(p2, q2, s2[:, 1])
            cp = _closest_on_segment(e0, e1, p1)
            dist, pos, n = _sphere_sphere(p1, s1[:, 0], cp, s2[:, 0])
        elif (t1, t2) == (GeomType.SPHERE, GeomType.BOX):
            pl = quat.rotate_inv(q2, p1 - p2)
            closest_l, n_l, d = _point_box(pl, s2)
            r = s1[:, 0]
            dist = d - r
            n = -quat.rotate(q2, n_l)  # 1 -> 2
            pos = p2 + quat.rotate(q2, closest_l) - n * (0.5 * dist)[:, None]
        elif (t1, t2) == (GeomType.CAPSULE, GeomType.CAPSULE):
            a0, a1 = _capsule_ends(p1, q1, s1[:, 1])
            b0, b1 = _capsule_ends(p2, q2, s2[:, 1])
            cp1, cp2 = _segment_segment(a0, a1, b0, b1)
            dist, pos, n = _sphere_sphere(cp1, s1[:, 0], cp2, s2[:, 0])
        elif (t1, t2) == (GeomType.CAPSULE, GeomType.BOX):
            # two-pass refinement: segment point nearest box centre, clamp to
            # box, then re-project on the segment (documented approximation)
            a0, a1 = _capsule_ends(p1, q1, s1[:, 1])
            cp = _closest_on_segment(a0, a1, p2)
            pl = quat.rotate_inv(q2, cp - p2)
            closest_l, _, _ = _point_box(pl, s2)
            box_pt = p2 + quat.rotate(q2, closest_l)
            cp = _closest_on_segment(a0, a1, box_pt)
            pl = quat.rotate_inv(q2, cp - p2)
            closest_l, n_l, d = _point_box(pl, s2)
            dist = d - s1[:, 0]
            n = -quat.rotate(q2, n_l)
            pos = p2 + quat.rotate(q2, closest_l) - n * (0.5 * dist)[:, None]
        elif (t1, t2) == (GeomType.BOX, GeomType.BOX):
            # corner-vs-box manifold: probe the 8 corners of each box against
            # the other (16 candidates/pair; replaces round-1's inscribed
            # spheres — the MJX box-box capability the reference gets
            # implicitly, SURVEY.md §2.2)
            corners_l = jnp.asarray(
                np.array([[sx, sy, sz] for sx in (-1, 1) for sy in (-1, 1) for sz in (-1, 1)], np.float32)
            )  # (8, 3)

            def corner_probe(pc, qc, sc, pb, qb, sb):
                """Corners of box c (n,8) vs box b. Normal points box_b -> corner."""
                cw = pc[:, None, :] + quat.rotate(
                    qc[:, None, :], corners_l[None, :, :] * sc[:, None, :])
                p_loc = quat.rotate_inv(qb[:, None, :], cw - pb[:, None, :])
                closest_l, n_l, d = _point_box(p_loc, sb[:, None, :])
                n_w = quat.rotate(qb[:, None, :], n_l)
                surf = pb[:, None, :] + quat.rotate(qb[:, None, :], closest_l)
                pos = surf + n_w * (0.5 * d)[..., None]
                return d, pos, n_w

            d12, pos12, nw12 = corner_probe(p1, q1, s1, p2, q2, s2)  # n_w: 2 -> 1
            d21, pos21, nw21 = corner_probe(p2, q2, s2, p1, q1, s1)  # n_w: 1 -> 2
            dist = jnp.concatenate([d12, d21], axis=1)
            pos = jnp.concatenate([pos12, pos21], axis=1)
            n = jnp.concatenate([-nw12, nw21], axis=1)  # 1 -> 2
            emit(dist, pos, n, cfric, cmarg, body1, body2, per=16)
            continue
        else:
            raise NotImplementedError(f"pair {t1} vs {t2}")
        emit(dist, pos, n, cfric, cmarg, body1, body2)

    contact = Contact(
        dist=jnp.concatenate(dists),
        pos=jnp.concatenate(poss),
        frame=jnp.concatenate(frames),
        friction=jnp.concatenate(frics),
        includemargin=jnp.concatenate(margs),
        body1=jnp.asarray(b1s, jnp.int32),
        body2=jnp.asarray(b2s, jnp.int32),
        force=jnp.zeros((ncon, 3)),
    )
    return data.replace(contact=contact)
