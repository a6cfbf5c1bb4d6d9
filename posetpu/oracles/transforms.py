"""Affine transform oracle — reference `utils/transforms.py` (SURVEY.md §2 C3).

The reference builds a 3x3 affine from (center, scale, output res, rotation)
where ``200 * scale`` is the person-box side length in source pixels, maps
1-indexed keypoints through it with integer truncation, and crop-warps images
to the output resolution.  The reference performs the warp as crop -> pad ->
rotate -> resize on the CPU per sample; this oracle expresses the identical
geometry as a single inverse-affine bilinear warp so the device kernel
(:mod:`posetpu.aug.warp`) can match it bit-for-bit on the same math.
"""

from __future__ import annotations

import numpy as np

# Left/right joint index swaps per dataset (reference `shufflelr` matchedParts).
FLIP_PAIRS = {
    "mpii": ((0, 5), (1, 4), (2, 3), (10, 15), (11, 14), (12, 13)),
    "lsp": ((0, 5), (1, 4), (2, 3), (6, 11), (7, 10), (8, 9)),
}


def get_transform(center, scale, res, rot=0):
    """3x3 affine mapping source-image coords -> output-crop coords.

    Reference semantics (SURVEY.md §2 C3): the person box has side
    ``h = 200 * scale`` source pixels centered on ``center``; it is scaled to
    ``res`` and then rotated by ``rot`` degrees about the output center.
    """
    center = np.asarray(center, dtype=np.float64)
    h = 200.0 * float(scale)
    t = np.eye(3, dtype=np.float64)
    t[0, 0] = res[1] / h
    t[1, 1] = res[0] / h
    t[0, 2] = res[1] * (-center[0] / h + 0.5)
    t[1, 2] = res[0] * (-center[1] / h + 0.5)
    if rot != 0:
        rot_rad = -rot * np.pi / 180.0
        sn, cs = np.sin(rot_rad), np.cos(rot_rad)
        rot_mat = np.eye(3, dtype=np.float64)
        rot_mat[0, :2] = [cs, -sn]
        rot_mat[1, :2] = [sn, cs]
        t_mat = np.eye(3, dtype=np.float64)
        t_mat[0, 2] = -res[1] / 2.0
        t_mat[1, 2] = -res[0] / 2.0
        t_inv = t_mat.copy()
        t_inv[:2, 2] *= -1.0
        t = t_inv @ rot_mat @ t_mat @ t
    return t


def transform(pt, center, scale, res, invert=0, rot=0):
    """Map one 1-indexed point through the (optionally inverted) affine.

    Returns integer coords (truncation toward zero, then +1), matching the
    reference's ``new_pt.astype(int) + 1``.
    """
    t = get_transform(center, scale, res, rot=rot)
    if invert:
        t = np.linalg.inv(t)
    new_pt = np.array([pt[0] - 1.0, pt[1] - 1.0, 1.0], dtype=np.float64)
    new_pt = t @ new_pt
    return new_pt[:2].astype(int) + 1


def transform_float(pt, center, scale, res, invert=0, rot=0):
    """Like :func:`transform` but without the integer truncation (used by
    sub-pixel decode paths; the reference truncates in `transform` but decode
    accuracy depends only on the affine itself)."""
    t = get_transform(center, scale, res, rot=rot)
    if invert:
        t = np.linalg.inv(t)
    new_pt = np.array([pt[0] - 1.0, pt[1] - 1.0, 1.0], dtype=np.float64)
    new_pt = t @ new_pt
    return new_pt[:2] + 1.0


def transform_preds(coords, center, scale, res):
    """Map predicted heatmap coords back to original-image coords
    (reference `transform_preds`: per-point inverse affine, rot=0)."""
    coords = np.asarray(coords, dtype=np.float64)
    out = coords.copy()
    for p in range(coords.shape[0]):
        out[p, 0:2] = transform(coords[p, 0:2], center, scale, res, invert=1, rot=0)
    return out


def crop(img, center, scale, res, rot=0):
    """Crop-warp ``img`` (H,W,C float in [0,1]) to ``res`` about (center,
    scale) with rotation — expressed as one inverse-affine bilinear warp.

    For every output pixel (0-indexed) we map through the inverse of
    :func:`get_transform` to source coords and bilinearly sample with a zero
    border.  This is the geometry the reference realizes as
    crop -> pad -> `imrotate` -> `imresize`; the single-warp form is exact
    (no double resampling) and is what the device kernel implements.
    """
    img = np.asarray(img, dtype=np.float64)
    if img.ndim == 2:
        img = img[:, :, None]
    H, W, C = img.shape
    t = get_transform(center, scale, res, rot=rot)
    tinv = np.linalg.inv(t)

    ys, xs = np.meshgrid(np.arange(res[0]), np.arange(res[1]), indexing="ij")
    ones = np.ones_like(xs, dtype=np.float64)
    dst = np.stack([xs.astype(np.float64), ys.astype(np.float64), ones], axis=0)
    src = np.tensordot(tinv, dst.reshape(3, -1), axes=1)  # (3, res0*res1)
    sx = src[0].reshape(res[0], res[1])
    sy = src[1].reshape(res[0], res[1])

    x0 = np.floor(sx).astype(np.int64)
    y0 = np.floor(sy).astype(np.int64)
    fx = sx - x0
    fy = sy - y0

    def gather(yy, xx):
        valid = (yy >= 0) & (yy < H) & (xx >= 0) & (xx < W)
        yc = np.clip(yy, 0, H - 1)
        xc = np.clip(xx, 0, W - 1)
        vals = img[yc, xc, :]
        return vals * valid[..., None]

    v00 = gather(y0, x0)
    v01 = gather(y0, x0 + 1)
    v10 = gather(y0 + 1, x0)
    v11 = gather(y0 + 1, x0 + 1)
    fx = fx[..., None]
    fy = fy[..., None]
    out = (
        v00 * (1 - fx) * (1 - fy)
        + v01 * fx * (1 - fy)
        + v10 * (1 - fx) * fy
        + v11 * fx * fy
    )
    return out


def fliplr(x):
    """Horizontally flip an image (H,W,C) or (H,W) along width."""
    return np.ascontiguousarray(np.flip(x, axis=1))


def shufflelr(pts, width, dataset="mpii"):
    """Flip keypoints: mirror 1-indexed x about the image width, then swap
    left/right joint indices (reference `shufflelr`)."""
    pts = np.asarray(pts, dtype=np.float64).copy()
    pts[:, 0] = width - pts[:, 0]
    for a, b in FLIP_PAIRS[dataset]:
        pts[[a, b]] = pts[[b, a]]
    return pts


def color_normalize(x, mean, std=None):
    """Per-channel mean subtraction on a (H,W,C) image (reference
    `color_normalize` subtracts the dataset mean; std division optional)."""
    x = np.asarray(x, dtype=np.float64).copy()
    mean = np.asarray(mean, dtype=np.float64)
    x -= mean[None, None, :]
    if std is not None:
        x /= np.asarray(std, dtype=np.float64)[None, None, :]
    return x
