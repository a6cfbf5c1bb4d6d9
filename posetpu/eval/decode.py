"""Vectorized heatmap decode + PCK on device — XLA twin of the reference
`utils/evaluation.py` (SURVEY.md §2 C9, §3.3): per-joint argmax with
1-indexed coords, quarter-pixel offset toward the larger neighbor, +0.5,
inverse affine back to source coords, and heatmap-size/10-normalized PCK.

The reference decodes on host per batch (device->host sync per step); here
decode/accuracy are fused into the jitted step — metrics cost no sync.
"""

from __future__ import annotations

import jax.numpy as jnp

from posetpu.aug.affine import invert_affine, make_transform, transform_points


def get_preds(scores):
    """(B, K, H, W) heatmaps -> (B, K, 2) 1-indexed (x, y) argmax coords,
    zeroed where the max activation is <= 0 (oracle `get_preds`)."""
    B, K, H, W = scores.shape
    flat = scores.reshape(B, K, H * W)
    idx = jnp.argmax(flat, axis=2)
    maxval = jnp.max(flat, axis=2)
    x = (idx % W + 1).astype(jnp.float32)
    y = (idx // W + 1).astype(jnp.float32)
    preds = jnp.stack([x, y], axis=-1)
    return preds * (maxval > 0)[..., None]


def quarter_offset(coords, scores):
    """Shift each coord 0.25px toward the larger of its two axis neighbors
    (oracle `final_preds` loop), vectorized with gathers.

    coords: (B, K, 2) 1-indexed integer-valued; scores: (B, K, H, W).
    """
    B, K, H, W = scores.shape
    px = coords[..., 0].astype(jnp.int32)  # 1-indexed
    py = coords[..., 1].astype(jnp.int32)
    inb = (px > 1) & (px < W) & (py > 1) & (py < H)
    pxc = jnp.clip(px, 2, W - 1)
    pyc = jnp.clip(py, 2, H - 1)

    def at(yy, xx):
        lin = (yy * W + xx).reshape(B, K, 1)
        return jnp.take_along_axis(scores.reshape(B, K, H * W), lin, axis=2)[..., 0]

    # oracle: diff_x = hm[py-1, px] - hm[py-1, px-2]   (0-indexed rows/cols)
    dx = at(pyc - 1, pxc) - at(pyc - 1, pxc - 2)
    dy = at(pyc, pxc - 1) - at(pyc - 2, pxc - 1)
    off = jnp.stack([jnp.sign(dx), jnp.sign(dy)], axis=-1) * 0.25
    return coords + off * inb[..., None]


def final_preds(scores, center, scale, res):
    """Full decode to source coords (oracle `final_preds`): argmax ->
    quarter offset -> +0.5 -> inverse affine (rot=0) with the reference's
    integer truncation."""
    coords = get_preds(scores)
    coords = quarter_offset(coords, scores)
    coords = coords + 0.5
    t = make_transform(center, scale, res, jnp.zeros_like(scale))
    tinv = invert_affine(t)
    return transform_points(coords, tinv, truncate=True)


def calc_dists(preds, target, normalize):
    """(K, B) normalized distances; -1 where the target is absent
    (coords <= 1) — oracle `calc_dists`."""
    valid = (target[..., 0] > 1) & (target[..., 1] > 1)  # (B, K)
    d = jnp.linalg.norm(preds - target, axis=-1) / normalize[:, None]
    return jnp.where(valid, d, -1.0).T


def pck_counts(output, target, thr=0.5, sample_mask=None):
    """Per-joint PCK (hit, total) counts — the reduction-friendly core of
    :func:`accuracy`.  Under data parallelism psum these across shards and
    THEN take the ratio: the global PCK is a ratio of global counts, not a
    mean of per-shard ratios.  ``sample_mask`` (B,) zeroes padded samples
    out of both counts (ragged final validation batches, SURVEY.md §3.3).
    """
    B, K, H, W = output.shape
    preds = get_preds(output)
    gts = get_preds(target)
    # reference accuracy() normalizes by heatmap WIDTH (output.size(3) on
    # NCHW), matching the oracle — identical on square maps
    norm = jnp.full((B,), W / 10.0)
    dists = calc_dists(preds, gts, norm)  # (K, B)
    valid = dists != -1.0
    if sample_mask is not None:
        valid = valid & (sample_mask[None, :] > 0)
    cnt = valid.sum(axis=1)
    hit = ((dists < thr) & valid).sum(axis=1)
    return hit, cnt


def pck_from_counts(hit, cnt):
    """(K,) hit/total counts -> the reference `accuracy` layout: (K+1,) with
    [0] = mean over joints that have any valid target, [1:] per-joint
    (-1 when a joint has no valid targets)."""
    per_joint = jnp.where(cnt > 0, hit / jnp.maximum(cnt, 1), -1.0)
    have = per_joint >= 0
    avg = jnp.where(
        have.sum() > 0, (per_joint * have).sum() / jnp.maximum(have.sum(), 1), 0.0
    )
    return jnp.concatenate([avg[None], per_joint])


def accuracy(output, target, thr=0.5):
    """Train-time PCK from heatmaps (oracle `accuracy`): distances between
    argmax decodes of output and target, normalized by heatmap_size/10.

    Returns (K+1,): [0] = mean over joints that have any valid target,
    [1:] per-joint (-1 when a joint has no valid targets in the batch).
    """
    hit, cnt = pck_counts(output, target, thr)
    return pck_from_counts(hit, cnt)
