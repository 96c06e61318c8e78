"""Masked, batched ray-casting and collision kernels.

TPU-first rewrite of the reference's geometry predicates and iquilezles.org
ray intersectors (gym_dockauv/objects/shape.py:169-433).  Differences by
design:

  * Obstacles live in fixed-size padded SoA arrays with validity masks, so
    every scenario compiles to one XLA program (no per-episode shape changes).
  * All conditionals are `where`-masks; the reference's boolean fancy-indexing
    becomes branch-free select chains with identical sign conventions
    (no-hit => -inf by default, "first hit along ray" may be negative).
  * Kernels broadcast over arbitrary leading batch dims: rays are
    (..., R, 3), capsules (..., K, ...) -> output (..., R) after reduction.

The `min positive else first` reduction reproduces docking3d.py:449-453 /
shape.py:264: among all candidate distances pick the smallest strictly
positive one; if none is positive, return the first candidate (whatever
negative/-inf value it has).
"""
from __future__ import annotations

import jax.numpy as jnp

NEG_INF = -jnp.inf


def ray_sphere(
    origin: jnp.ndarray,  # (..., R, 3)
    rd_unit: jnp.ndarray,  # (..., R, 3) unit directions
    center: jnp.ndarray,  # (..., S, 3)
    radius: jnp.ndarray,  # (..., S)
    valid: jnp.ndarray | None = None,  # (..., S) bool
) -> jnp.ndarray:
    """Per-(ray, sphere) signed hit distances, shape (..., R, S).

    Matches `intersec_dist_lines_spheres_vectorized` (shape.py:235-262)
    before its reduction: for each pair, min(-b+h, -b-h) with h=sqrt(b^2-c)
    when the discriminant is nonnegative, else -inf.  Invalid spheres
    report -inf (treated as no-hit downstream).
    """
    oc = origin[..., :, None, :] - center[..., None, :, :]  # (..., R, S, 3)
    b = jnp.sum(oc * rd_unit[..., :, None, :], axis=-1)  # (..., R, S)
    c = jnp.sum(oc * oc, axis=-1) - radius[..., None, :] ** 2
    h2 = b * b - c
    hit = h2 >= 0.0
    h = jnp.sqrt(jnp.where(hit, h2, 0.0))
    dist = jnp.minimum(-b + h, -b - h)
    dist = jnp.where(hit, dist, NEG_INF)
    if valid is not None:
        dist = jnp.where(valid[..., None, :], dist, NEG_INF)
    return dist


def ray_capsule(
    origin: jnp.ndarray,  # (..., R, 3)
    rd_unit: jnp.ndarray,  # (..., R, 3)
    cap_a: jnp.ndarray,  # (..., K, 3) capsule bottom end
    cap_b: jnp.ndarray,  # (..., K, 3) capsule top end
    cap_rad: jnp.ndarray,  # (..., K)
    valid: jnp.ndarray | None = None,  # (..., K) bool
    default: float = NEG_INF,
) -> jnp.ndarray:
    """Per-(ray, capsule) hit distances, shape (..., R, K).

    Branch-free form of `intersec_dist_line_capsule_vectorized`
    (shape.py:327-390) with its exact case logic:

      body hit   : h >= 0 and 0 < y < baba          -> t = (-b - sqrt(h))/a
      cap hit    : h >= 0, not body, h2 > 0         -> -b2 - sqrt(h2)
                   (end sphere chosen by sign of y)
      otherwise  : `default`; additionally any result that is exactly 0 or
                   has h <= 0 is overwritten with `default`, reproducing the
                   reference's final `res[(h <= 0) | (res == 0)] = default`.
    """
    ba = cap_b[..., None, :, :] - cap_a[..., None, :, :]  # (..., 1, K, 3)
    oa = origin[..., :, None, :] - cap_a[..., None, :, :]  # (..., R, K, 3)
    rd = rd_unit[..., :, None, :]  # (..., R, 1, 3)

    baba = jnp.sum(ba * ba, axis=-1)  # (..., 1, K)
    bard = jnp.sum(ba * rd, axis=-1)  # (..., R, K)
    baoa = jnp.sum(ba * oa, axis=-1)
    rdoa = jnp.sum(rd * oa, axis=-1)
    oaoa = jnp.sum(oa * oa, axis=-1)

    rad2 = cap_rad[..., None, :] ** 2
    a = baba - bard * bard
    b = baba * rdoa - baoa * bard
    c = baba * oaoa - baoa * baoa - rad2 * baba
    h = b * b - a * c

    mask_h = h >= 0.0
    sqrt_h = jnp.sqrt(jnp.where(mask_h, h, 0.0))
    # a == 0 <=> ray parallel to the axis (or a padded zero capsule): a body
    # hit is impossible there (the reference's NaN propagates to a False
    # mask); guard the division so NaN-checkers stay clean.
    div_ok = a != 0.0
    a_safe = jnp.where(div_ok, a, 1.0)
    t = jnp.where(mask_h & div_ok, (-b - sqrt_h) / a_safe, 0.0)
    y = baoa + t * bard
    mask_body = mask_h & div_ok & (y > 0.0) & (y < baba)

    # End caps: pick the near (y<=0) or far (y>=0) sphere center.  The
    # reference writes oa first then overwrites with (l1-cap2) for y>=0, so
    # y==0 resolves to the far end; replicate with a >=0 select.  For
    # axis-parallel rays (a == 0) the reference's t is +-inf (or NaN when
    # the numerator is 0), so its y-sign comes from sign((-b-sqrt_h)*bard)
    # with NaN comparing False — replicated via the guarded selector.
    ob = origin[..., :, None, :] - cap_b[..., None, :, :]
    y_sel = jnp.where(div_ok, y >= 0.0, (-b - sqrt_h) * bard > 0.0)
    oc = jnp.where(y_sel[..., None], ob, oa)
    b2 = jnp.sum(rd * oc, axis=-1)
    c2 = jnp.sum(oc * oc, axis=-1) - rad2
    h2 = b2 * b2 - c2
    mask_caps = mask_h & (h2 > 0.0) & ~mask_body
    t_caps = -b2 - jnp.sqrt(jnp.where(h2 > 0.0, h2, 0.0))

    res = jnp.where(mask_body, t, 0.0)
    res = jnp.where(mask_caps, t_caps, res)
    res = jnp.where((h <= 0.0) | (res == 0.0), default, res)
    if valid is not None:
        res = jnp.where(valid[..., None, :], res, default)
    return res


def min_positive(dist: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    """Smallest strictly-positive distance along `axis`; if none positive,
    the element whose positive-masked value is +inf-min (i.e. the first
    candidate in the reference's argmin-over-inf trick, shape.py:264 and
    docking3d.py:451).

    NOTE: the argmin+gather preserving the no-hit candidate's negative value
    is exact reference semantics but ~26x slower than a masked min on TPU;
    the hot radar path uses `nearest_hit_clamped` below, which is
    bit-identical AFTER the clamp step (sensor.py:104-118 maps every
    non-positive/beyond-range value to max_dist anyway)."""
    masked = jnp.where(dist > 0.0, dist, jnp.inf)
    idx = jnp.argmin(masked, axis=axis)
    return jnp.take_along_axis(dist, jnp.expand_dims(idx, axis), axis=axis).squeeze(
        axis
    )


def nearest_hit_clamped(dist: jnp.ndarray, max_dist, axis: int = -1) -> jnp.ndarray:
    """Fused min-positive + clamp: the nearest strictly-positive hit, with
    misses and beyond-range hits mapped to max_dist.  Post-clamp-equivalent
    to clamp_intersections(min_positive(dist)) for the env's candidate sets
    (capsule candidates map exact-0 to the -inf default per the reference's
    res==0 rule, and min_positive's no-hit fallback lands on a non-positive
    value, which clamps to max_dist either way).  A pure reduction — no
    gather, so it runs at VPU speed."""
    masked = jnp.where(dist > 0.0, dist, jnp.inf)
    m = jnp.min(masked, axis=axis)
    return jnp.where(m > max_dist, max_dist, m)


def dist_segment_point(
    po: jnp.ndarray,  # (..., 3) point
    l1: jnp.ndarray,  # (..., 3) segment start
    l2: jnp.ndarray,  # (..., 3) segment end
) -> jnp.ndarray:
    """Closest distance between a segment and a point (shape.py:393-417).
    Degenerate (zero-length, e.g. padded) segments are guarded: the result
    is the point-to-l1 distance instead of NaN.

    The guard is a DOUBLE where: guarding only the division still leaves
    norm(0)'s NaN partial derivatives in the backward pass, and because
    `po` is broadcast against the capsule-slot axis its cotangent SUMS
    over slots — one padded slot's 0-cotangent x NaN-partial poisons the
    whole position gradient (measured: every APG instance on the ring-
    less Capsule*_remus scenarios had non-finite grads; the flagship
    never hit it because all 5 of its capsule slots are real)."""
    diff = l2 - l1
    sq = jnp.sum(diff * diff, axis=-1, keepdims=True)
    degenerate = sq[..., 0] == 0.0
    safe = jnp.where(sq == 0.0, 1.0, diff)
    n = jnp.sqrt(jnp.sum(safe * safe, axis=-1, keepdims=True))
    d = safe / n
    s = jnp.sum((l1 - po) * d, axis=-1)
    t = jnp.sum((po - l2) * d, axis=-1)
    h = jnp.maximum(jnp.maximum(s, t), 0.0)
    c = jnp.cross(po - l1, d)
    dist = jnp.hypot(h, jnp.linalg.norm(c, axis=-1))
    return jnp.where(degenerate, jnp.linalg.norm(po - l1, axis=-1), dist)


def vec_line_point(po: jnp.ndarray, l1: jnp.ndarray, l2: jnp.ndarray) -> jnp.ndarray:
    """Vector from the (infinite) line through l1,l2 to the point's projection
    foot, pointing line->point negated... matches shape.py:420-433: returns
    projection - point."""
    n = jnp.linalg.norm(l2 - l1, axis=-1, keepdims=True)
    d = (l2 - l1) / jnp.where(n == 0.0, 1.0, n)
    v = po - l1
    t = jnp.sum(v * d, axis=-1)
    pro = l1 + t[..., None] * d
    return pro - po


def collide_sphere_spheres(
    pos: jnp.ndarray,  # (..., 3) vehicle position
    rad: jnp.ndarray,  # scalar or (...,) vehicle radius
    centers: jnp.ndarray,  # (..., S, 3)
    radii: jnp.ndarray,  # (..., S)
    valid: jnp.ndarray,  # (..., S) bool
) -> jnp.ndarray:
    """Any-sphere collision predicate (shape.py:182-192), masked."""
    d = jnp.linalg.norm(centers - pos[..., None, :], axis=-1)
    hit = (d <= rad[..., None] + radii) & valid
    return jnp.any(hit, axis=-1)


def collide_capsules_sphere(
    cap_a: jnp.ndarray,  # (..., K, 3)
    cap_b: jnp.ndarray,  # (..., K, 3)
    cap_rad: jnp.ndarray,  # (..., K)
    valid: jnp.ndarray,  # (..., K) bool
    pos: jnp.ndarray,  # (..., 3)
    rad: jnp.ndarray,  # scalar or (...,)
) -> jnp.ndarray:
    """Any-capsule vs vehicle-sphere predicate (shape.py:195-210), masked."""
    d = dist_segment_point(pos[..., None, :], cap_a, cap_b)
    hit = (d <= cap_rad + rad[..., None]) & valid
    return jnp.any(hit, axis=-1)


def maxpool_2x2_pad0(x2d: jnp.ndarray, block: int = 2) -> jnp.ndarray:
    """Max-pool with zero padding to a block multiple, flattened.

    Reproduces skimage `block_reduce(..., func=np.max)` as used by the radar
    observation reduction (sensor.py:135-137): 7x9 ray grid -> 4x5 -> 20.
    Operates on the last two dims; leading dims broadcast.
    """
    *lead, h, w = x2d.shape
    ph = (-h) % block
    pw = (-w) % block
    pad = [(0, 0)] * len(lead) + [(0, ph), (0, pw)]
    xp = jnp.pad(x2d, pad, mode="constant", constant_values=0.0)
    hh, ww = (h + ph) // block, (w + pw) // block
    xr = xp.reshape(*lead, hh, block, ww, block)
    return jnp.max(xr, axis=(-3, -1)).reshape(*lead, hh * ww)
