"""Vectorized Gaussian target rasterizer — device twin of the reference's
per-joint `draw_labelmap` loop (`utils/imutils.py`, SURVEY.md §2 C4; parity
target per BASELINE.json:5 "heatmap target values match the reference within
fp tolerance").

The reference draws a truncated (6*sigma+1)^2 unit-peak Gaussian patch per
visible joint on the host.  Here the whole (B, K, H, W) target volume is one
closed-form VPU expression:

    g[b,k,y,x] = exp(-(dx^2+dy^2)/(2 sigma^2)) * [|dx|<=3s] * [|dy|<=3s]

with dx = x - px over the integer-truncated transformed keypoint (px, py) —
algebraically identical to the reference's patch-window copy, including the
window-fully-outside => joint-marked-invisible rule.
"""

from __future__ import annotations

import jax.numpy as jnp


def window_inside(ipx, ipy, res, sigma):
    """Reference visibility rule on the *integer* window
    [pt-3s, pt+3s+1): invisible iff ul >= size or br < 0 on either axis.
    ``ipx``/``ipy`` are integer-valued f32 arrays; the ONE definition used
    by both rasterizer backends (XLA here, Pallas kernel + its vis output)
    so the rule cannot drift between them."""
    H, W = res
    s3 = jnp.float32(int(3 * sigma))
    return (
        (ipx - s3 < W)
        & (ipy - s3 < H)
        & (ipx + s3 + 1 >= 0)
        & (ipy + s3 + 1 >= 0)
    )


def rasterize_gaussians(pts, visible, res, sigma=1.0, backend="auto"):
    """Rasterize target heatmaps.

    Args:
      pts:     (B, K, 2) keypoint coords in 0-indexed heatmap space, already
               integer-valued (the reference truncates in `transform`).
      visible: (B, K) input visibility (>0 means labeled).
      res:     static (H, W) heatmap size.
      sigma:   Gaussian sigma (reference default 1).
      backend: "xla" | "pallas" | "auto" (pallas on TPU, else xla).

    Returns:
      target:  (B, K, H, W) float32.
      vis_out: (B, K) float32 — input visibility AND window-overlaps-map
               (the reference's "out of bounds => mark invisible").
    """
    if backend == "auto":
        import jax

        # this environment's TPU registers as the experimental "axon"
        # PJRT platform, not "tpu" — without it in the set, "auto" would
        # silently never run the Pallas kernel on the real chip
        backend = (
            "pallas" if jax.default_backend() in ("tpu", "axon") else "xla"
        )
    if backend == "pallas":
        from posetpu.aug.pallas_kernels import rasterize_gaussians_pallas

        return rasterize_gaussians_pallas(pts, visible, res, sigma=sigma)
    H, W = res
    pts = jnp.asarray(pts, jnp.float32)
    px = pts[..., 0][..., None, None]  # (B, K, 1, 1)
    py = pts[..., 1][..., None, None]

    xs = jnp.arange(W, dtype=jnp.float32)[None, None, None, :]
    ys = jnp.arange(H, dtype=jnp.float32)[None, None, :, None]
    dx = xs - px
    dy = ys - py

    win = 3.0 * sigma
    g = jnp.exp(-(dx * dx + dy * dy) / (2.0 * sigma * sigma))
    g = g * (jnp.abs(dx) <= win) * (jnp.abs(dy) <= win)

    inside = window_inside(
        jnp.trunc(pts[..., 0]), jnp.trunc(pts[..., 1]), res, sigma
    )
    vis_out = (jnp.asarray(visible) > 0) & inside
    vis_f = vis_out.astype(jnp.float32)
    return g * vis_f[..., None, None], vis_f
