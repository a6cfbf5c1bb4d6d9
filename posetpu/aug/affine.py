"""Batched affine construction in jnp — device twin of
:func:`posetpu.oracles.transforms.get_transform` (reference
`utils/transforms.py`, SURVEY.md §2 C3), vectorized over the batch.

All functions are shape-polymorphic only in the batch dimension and fully
traceable: no data-dependent control flow (rot=0 flows through the same
rotation composition, which is the identity there).
"""

from __future__ import annotations

import jax.numpy as jnp


def make_transform(center, scale, res, rot_deg):
    """Batched 3x3 affine: source coords -> output-crop coords.

    Args:
      center:  (B, 2) person centers (x, y), source pixels (0-indexed space).
      scale:   (B,) person scale; box side = 200*scale source pixels.
      res:     (H, W) static output resolution.
      rot_deg: (B,) rotation in degrees.

    Returns: (B, 3, 3) float32.
    """
    center = jnp.asarray(center, jnp.float32)
    scale = jnp.asarray(scale, jnp.float32)
    rot_deg = jnp.asarray(rot_deg, jnp.float32)
    h = 200.0 * scale  # (B,)

    sx = res[1] / h
    sy = res[0] / h
    tx = res[1] * (-center[:, 0] / h + 0.5)
    ty = res[0] * (-center[:, 1] / h + 0.5)

    # Rotation about the output center (reference composes only when rot!=0;
    # at rot==0 the composition is the identity, so we always apply).  The
    # full product  T(+half) @ R @ T(-half) @ S  is expanded in closed form:
    # 3x3 matmuls would hit the MXU's bf16 default precision, and geometry
    # must stay exact f32 for oracle parity.
    rot_rad = -rot_deg * (jnp.pi / 180.0)
    sn, cs = jnp.sin(rot_rad), jnp.cos(rot_rad)
    hw = jnp.float32(res[1] / 2.0)
    hh = jnp.float32(res[0] / 2.0)

    a00 = cs * sx
    a01 = -sn * sy
    a02 = cs * (tx - hw) - sn * (ty - hh) + hw
    a10 = sn * sx
    a11 = cs * sy
    a12 = sn * (tx - hw) + cs * (ty - hh) + hh

    zeros = jnp.zeros_like(sx)
    ones = jnp.ones_like(sx)
    return jnp.stack(
        [
            jnp.stack([a00, a01, a02], axis=-1),
            jnp.stack([a10, a11, a12], axis=-1),
            jnp.stack([zeros, zeros, ones], axis=-1),
        ],
        axis=1,
    )


def compose_affine(a, b):
    """Closed-form product a @ b of batched (B, 3, 3) affines (last row
    [0,0,1]), in exact f32 — avoids MXU bf16 default precision on 3x3
    matmuls."""
    r00 = a[:, 0, 0] * b[:, 0, 0] + a[:, 0, 1] * b[:, 1, 0]
    r01 = a[:, 0, 0] * b[:, 0, 1] + a[:, 0, 1] * b[:, 1, 1]
    r02 = a[:, 0, 0] * b[:, 0, 2] + a[:, 0, 1] * b[:, 1, 2] + a[:, 0, 2]
    r10 = a[:, 1, 0] * b[:, 0, 0] + a[:, 1, 1] * b[:, 1, 0]
    r11 = a[:, 1, 0] * b[:, 0, 1] + a[:, 1, 1] * b[:, 1, 1]
    r12 = a[:, 1, 0] * b[:, 0, 2] + a[:, 1, 1] * b[:, 1, 2] + a[:, 1, 2]
    zeros = jnp.zeros_like(r00)
    ones = jnp.ones_like(r00)
    return jnp.stack(
        [
            jnp.stack([r00, r01, r02], axis=-1),
            jnp.stack([r10, r11, r12], axis=-1),
            jnp.stack([zeros, zeros, ones], axis=-1),
        ],
        axis=1,
    )


def invert_affine(t):
    """Closed-form inverse of a batch of (B, 3, 3) affine matrices.

    Cheaper and more stable than jnp.linalg.inv for the affine case; the last
    row is assumed to be [0, 0, 1].
    """
    a, b, c = t[:, 0, 0], t[:, 0, 1], t[:, 0, 2]
    d, e, f = t[:, 1, 0], t[:, 1, 1], t[:, 1, 2]
    det = a * e - b * d
    ia = e / det
    ib = -b / det
    id_ = -d / det
    ie = a / det
    ic = -(ia * c + ib * f)
    if_ = -(id_ * c + ie * f)
    zeros = jnp.zeros_like(a)
    ones = jnp.ones_like(a)
    return jnp.stack(
        [
            jnp.stack([ia, ib, ic], axis=-1),
            jnp.stack([id_, ie, if_], axis=-1),
            jnp.stack([zeros, zeros, ones], axis=-1),
        ],
        axis=1,
    )


def _apply_affine_0idx(pts, t):
    """Raw 0-indexed affine application: (B, K, 2) pts through (B, 3, 3)."""
    pts = jnp.asarray(pts, jnp.float32)
    x = pts[..., 0] - 1.0  # (B, K)
    y = pts[..., 1] - 1.0
    # Explicit muls, not einsum: keeps the map exact f32 (see make_transform).
    ox = t[:, 0, 0, None] * x + t[:, 0, 1, None] * y + t[:, 0, 2, None]
    oy = t[:, 1, 0, None] * x + t[:, 1, 1, None] * y + t[:, 1, 2, None]
    return jnp.stack([ox, oy], axis=-1)


def transform_points(pts, t, truncate=True):
    """Map 1-indexed points (B, K, 2) through per-sample affines (B, 3, 3).

    With ``truncate`` the reference's integer semantics are kept
    (`new_pt.astype(int) + 1`, truncation toward zero) — required for
    heatmap-target parity.  Returns float32 (B, K, 2).
    """
    out = _apply_affine_0idx(pts, t)
    if truncate:
        out = jnp.trunc(out)
    return out + 1.0


def transform_points_int_float(pts, t):
    """One affine application, both views: ``(trunc(out)+1, out+1)``.

    The truncated ints MUST come from the raw 0-indexed map ``out``: in
    float32 ``trunc((out+1)-1) != trunc(out)`` for coords 1–2 ulp below an
    integer (e.g. out=0.99999994f: +1 rounds to 2.0 exactly, so the
    round-trip truncates to 1 instead of 0), which would shift a rasterized
    Gaussian peak by one pixel on rare real samples.  Returns a pair of
    float32 (B, K, 2) arrays: (1-indexed truncated ints, 1-indexed floats).
    """
    out = _apply_affine_0idx(pts, t)
    return jnp.trunc(out) + 1.0, out + 1.0


def mirror_x(x_coord, width):
    """Horizontal mirror of 1-indexed x about image ``width`` (reference
    `shufflelr` / flip convention: x' = w - x)."""
    return width - x_coord
