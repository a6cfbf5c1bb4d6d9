"""Heatmap decode + PCK oracle — reference `utils/evaluation.py`
(SURVEY.md §2 C9): per-joint argmax with 1-indexed coords, quarter-pixel
offset toward the larger neighbor, distances normalized by heatmap-size/10
for train-time PCK, and inverse-affine mapping back to source coords.
"""

from __future__ import annotations

import math

import numpy as np

from posetpu.oracles.transforms import transform


def get_preds(scores):
    """Argmax decode: (N, K, H, W) heatmaps -> (N, K, 2) 1-indexed (x, y).

    Joints whose max score is <= 0 get coords zeroed (reference pred_mask).
    """
    scores = np.asarray(scores, dtype=np.float64)
    N, K, H, W = scores.shape
    flat = scores.reshape(N, K, H * W)
    idx = np.argmax(flat, axis=2)
    maxval = np.max(flat, axis=2)
    preds = np.zeros((N, K, 2), dtype=np.float64)
    preds[:, :, 0] = idx % W + 1
    preds[:, :, 1] = idx // W + 1
    mask = (maxval > 0).astype(np.float64)[:, :, None]
    return preds * mask


def calc_dists(preds, target, normalize):
    """Per-(joint, sample) normalized distance; -1 where the target joint is
    absent (coords <= 1, i.e. masked out by get_preds)."""
    preds = np.asarray(preds, dtype=np.float64)
    target = np.asarray(target, dtype=np.float64)
    N, K, _ = preds.shape
    dists = np.zeros((K, N), dtype=np.float64)
    for n in range(N):
        for c in range(K):
            if target[n, c, 0] > 1 and target[n, c, 1] > 1:
                dists[c, n] = np.linalg.norm(preds[n, c] - target[n, c]) / normalize[n]
            else:
                dists[c, n] = -1
    return dists


def dist_acc(dists, thr=0.5):
    """Fraction of valid distances below ``thr``; -1 if no valid entries."""
    valid = dists != -1
    if valid.sum() > 0:
        return float((dists[valid] < thr).mean())
    return -1.0


def accuracy(output, target, thr=0.5):
    """Train-time PCK from heatmaps, normalized by heatmap-size/10.

    Returns ``acc`` of length K+1: acc[0] is the mean over joints with valid
    ground truth, acc[1:] per-joint.
    """
    output = np.asarray(output, dtype=np.float64)
    target = np.asarray(target, dtype=np.float64)
    N, K, H, W = output.shape
    preds = get_preds(output)
    gts = get_preds(target)
    # reference normalizes by output.size(3) = WIDTH (NCHW), not height;
    # identical on the square maps but a real deviation off-square
    norm = np.ones(N, dtype=np.float64) * W / 10.0
    dists = calc_dists(preds, gts, norm)
    acc = np.zeros(K + 1, dtype=np.float64)
    avg_acc, cnt = 0.0, 0
    for i in range(K):
        acc[i + 1] = dist_acc(dists[i], thr)
        if acc[i + 1] >= 0:
            avg_acc += acc[i + 1]
            cnt += 1
    acc[0] = avg_acc / cnt if cnt else 0.0
    return acc


def final_preds(output, center, scale, res):
    """Full decode: argmax + quarter-offset toward the larger neighbor,
    +0.5, then inverse affine back to original-image coords."""
    output = np.asarray(output, dtype=np.float64)
    coords = get_preds(output)
    N, K, _ = coords.shape
    for n in range(N):
        for p in range(K):
            hm = output[n, p]
            px = int(math.floor(coords[n, p, 0]))
            py = int(math.floor(coords[n, p, 1]))
            # res is (H, W) repo-wide (get_transform scales x by res[1]):
            # bound the x coord by the width and y by the height — on the
            # reference's square maps the two readings coincide
            if 1 < px < res[1] and 1 < py < res[0]:
                diff = np.array(
                    [
                        hm[py - 1, px] - hm[py - 1, px - 2],
                        hm[py, px - 1] - hm[py - 2, px - 1],
                    ]
                )
                coords[n, p] += np.sign(diff) * 0.25
    coords += 0.5
    preds = coords.copy()
    for i in range(N):
        for p in range(K):
            preds[i, p, 0:2] = transform(
                coords[i, p, 0:2], center[i], scale[i], res, invert=1, rot=0
            )
    return preds
