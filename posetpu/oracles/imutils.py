"""Image/heatmap oracle — reference `utils/imutils.py` (SURVEY.md §2 C4).

The load-bearing function is :func:`draw_labelmap`: the truncated-window
Gaussian target rasterizer whose exact numerics (window placement, peak 1.0,
out-of-bounds => joint marked invisible) are a parity target per
BASELINE.json:5.
"""

from __future__ import annotations

import numpy as np


def gaussian_patch(sigma):
    """(6*sigma+1)^2 Gaussian patch with peak 1.0 at the center."""
    size = 6 * sigma + 1
    x = np.arange(0, size, 1, dtype=np.float64)
    y = x[:, None]
    x0 = y0 = size // 2
    return np.exp(-((x - x0) ** 2 + (y - y0) ** 2) / (2.0 * sigma**2))


def draw_labelmap(img, pt, sigma=1):
    """Draw a truncated Gaussian centered at integer ``pt`` (x, y; 0-indexed
    heatmap coords) onto ``img`` (H,W).  Returns ``(img, visible)``.

    Reference semantics:
      * window = [pt - 3*sigma, pt + 3*sigma + 1) per axis;
      * if the window lies entirely outside the map, the joint is marked
        invisible (return vis=0) and the map is untouched;
      * otherwise the in-bounds portion of the unit-peak Gaussian patch is
        written (not accumulated) into the map.
    """
    img = np.asarray(img, dtype=np.float64).copy()
    H, W = img.shape
    ul = [int(pt[0] - 3 * sigma), int(pt[1] - 3 * sigma)]
    br = [int(pt[0] + 3 * sigma + 1), int(pt[1] + 3 * sigma + 1)]
    if ul[0] >= W or ul[1] >= H or br[0] < 0 or br[1] < 0:
        return img, 0

    g = gaussian_patch(sigma)
    g_x = (max(0, -ul[0]), min(br[0], W) - ul[0])
    g_y = (max(0, -ul[1]), min(br[1], H) - ul[1])
    img_x = (max(0, ul[0]), min(br[0], W))
    img_y = (max(0, ul[1]), min(br[1], H))
    img[img_y[0] : img_y[1], img_x[0] : img_x[1]] = g[
        g_y[0] : g_y[1], g_x[0] : g_x[1]
    ]
    return img, 1


def rasterize_targets(pts, visible, num_joints, res, sigma=1):
    """Full per-sample target stack: (K, H, W) heatmaps + updated visibility.

    ``pts`` are integer heatmap-space coords (K, 2), 0-indexed.  Mirrors the
    reference dataset ``__getitem__`` loop over `draw_labelmap`.
    """
    H, W = res
    target = np.zeros((num_joints, H, W), dtype=np.float64)
    vis_out = np.zeros((num_joints,), dtype=np.int64)
    for k in range(num_joints):
        if visible[k] > 0:
            target[k], vis_out[k] = draw_labelmap(target[k], pts[k], sigma=sigma)
    return target, vis_out
