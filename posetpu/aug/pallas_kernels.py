"""Pallas TPU kernels for the augmentation hot path (SURVEY.md §2 native-
equivalents table: "Pallas/XLA fused rasterizer: vectorized over
(batch, joint, 64, 64) grid").

Kernel inventory and the honest engineering story:

* ``rasterize_gaussians_pallas`` — the Gaussian target rasterizer as a single
  VPU kernel: each grid step materializes an (8, H*W) block of heatmaps from
  the (x, y) peak coordinates with closed-form exp + window masking.  One
  pass, no intermediate HBM traffic (the XLA fallback materializes dx/dy
  broadcasts before fusing).

* The bilinear warp stays on XLA's native gather
  (:func:`posetpu.aug.warp.affine_warp`).  Reasoned choice, not an omission:
  the warp's inner loop is a data-dependent 2-D gather; Mosaic has no
  vector gather primitive, so a Pallas version would serialize on scalar
  loads or burn MXU FLOPs on one-hot matmul tricks.  XLA:TPU lowers the
  4-corner gather efficiently, and the whole warp is ~3% of the train step
  (measured; see BASELINE.md).  A Paeth-shear Pallas warp remains a possible
  future micro-optimization for the rot=0 fast path.

Numerics match :func:`posetpu.aug.heatmap.rasterize_gaussians` (and thus the
reference `draw_labelmap` oracle) exactly on the same f32 math.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from posetpu.aug.heatmap import window_inside

_ROWS = 8  # maps per grid step (f32 sublane tile)


def _rasterize_kernel(pts_ref, vis_ref, out_ref, *, H, W, sigma):
    """One grid step: rasterize _ROWS heatmaps into an (_ROWS, H*W) block."""
    px = pts_ref[:, 0:1]  # (_ROWS, 1) f32, 0-indexed integer-valued
    py = pts_ref[:, 1:2]
    vis = vis_ref[:, 0:1]

    col = jax.lax.broadcasted_iota(jnp.int32, (_ROWS, H * W), 1)
    x = (col % W).astype(jnp.float32)
    y = (col // W).astype(jnp.float32)
    dx = x - px
    dy = y - py
    win = 3.0 * sigma
    # divide exactly as the XLA path does — multiplying by a precomputed
    # reciprocal differs in the last ulp for sigmas where 2*sigma^2 is not
    # a power of two, breaking cross-backend bit-parity
    g = jnp.exp(-(dx * dx + dy * dy) / (2.0 * sigma * sigma))
    g = g * (jnp.abs(dx) <= win) * (jnp.abs(dy) <= win)

    # reference visibility rule — the shared definition (inputs are
    # integer-valued by contract, so no trunc needed here)
    inside = window_inside(px, py, (H, W), sigma)
    keep = ((vis > 0) & inside).astype(jnp.float32)
    out_ref[:, :] = g * keep


def rasterize_gaussians_pallas(pts, visible, res, sigma=1.0, interpret=False):
    """Pallas twin of :func:`posetpu.aug.heatmap.rasterize_gaussians`.

    Args/returns identical: pts (B, K, 2) integer-valued 0-indexed heatmap
    coords, visible (B, K); returns (target (B, K, H, W) f32, vis (B, K) f32).
    """
    H, W = res
    B, K = pts.shape[:2]
    BK = B * K
    pad = (-BK) % _ROWS
    pts_f = jnp.asarray(pts, jnp.float32).reshape(BK, 2)
    vis_f = jnp.asarray(visible, jnp.float32).reshape(BK, 1)
    if pad:
        pts_f = jnp.concatenate([pts_f, jnp.full((pad, 2), -1e6, jnp.float32)])
        vis_f = jnp.concatenate([vis_f, jnp.zeros((pad, 1), jnp.float32)])
    n = pts_f.shape[0]

    kernel = functools.partial(_rasterize_kernel, H=H, W=W, sigma=float(sigma))
    out = pl.pallas_call(
        kernel,
        grid=(n // _ROWS,),
        in_specs=[
            pl.BlockSpec((_ROWS, 2), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_ROWS, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (_ROWS, H * W), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((n, H * W), jnp.float32),
        interpret=interpret,
    )(pts_f, vis_f)

    target = out[:BK].reshape(B, K, H, W)
    # vis output must also apply the window rule (same shared definition
    # as the XLA path)
    inside = window_inside(
        jnp.trunc(jnp.asarray(pts, jnp.float32)[..., 0]),
        jnp.trunc(jnp.asarray(pts, jnp.float32)[..., 1]),
        (H, W),
        sigma,
    )
    vis_out = ((jnp.asarray(visible) > 0) & inside).astype(jnp.float32)
    return target, vis_out
