"""Batched inverse-affine bilinear warp — the device replacement for the
reference's per-sample CPU crop/rotate/resize (`utils/transforms.py crop`,
SURVEY.md §2 C3 and the native-equivalents table in §2: "Pallas TPU kernel
(or fused XLA gather+bilinear): batched inverse-affine bilinear warp, on
device").

This is the fused-XLA formulation: four clamped gathers + a lerp, vectorized
over (B, H_out, W_out, C).  It matches :func:`posetpu.oracles.transforms.crop`
bit-for-bit on the same float math.  The warp deliberately stays on XLA's
native gather rather than Pallas — Mosaic has no vector gather primitive and
the warp is a small fraction of the step; see docs/design.md §3 and
:mod:`posetpu.aug.pallas_kernels` (which hosts the Pallas rasterizer).
"""

from __future__ import annotations

import jax.numpy as jnp

from posetpu.aug.affine import invert_affine


def affine_warp(images, t, out_res, valid_wh=None, src_index=None):
    """Warp ``images`` (B, H, W, C) by per-sample affines ``t`` (N, 3, 3)
    mapping source->output; sampling happens through the inverse.

    Args:
      images:   (B, H, W, C) float or uint8.
      t:        (N, 3, 3) forward affine (source px -> output px, 0-indexed).
      out_res:  static (H_out, W_out).
      valid_wh: optional (N, 2) ints (w, h) marking the un-padded region of
                each output's SOURCE image; samples outside it read as zero.
                This lets one batch hold images of different true sizes
                padded to a common static shape (XLA needs static shapes;
                the reference handled ragged sizes per-sample on the host).
      src_index: optional (N,) int mapping each output sample to a source
                image index — N may exceed B, so several differently-warped
                crops (e.g. the joint step's neutral/adversarial/reference
                triple) read the source batch in ONE gather pass.

    Returns (N, H_out, W_out, C) float32 with zero border.
    """
    images = jnp.asarray(images)
    B, H, W, C = images.shape
    Ho, Wo = out_res
    tinv = invert_affine(jnp.asarray(t, jnp.float32))
    N = tinv.shape[0]

    xs = jnp.arange(Wo, dtype=jnp.float32)[None, None, :]  # (1, 1, Wo)
    ys = jnp.arange(Ho, dtype=jnp.float32)[None, :, None]  # (1, Ho, 1)
    sx = (
        tinv[:, 0, 0, None, None] * xs
        + tinv[:, 0, 1, None, None] * ys
        + tinv[:, 0, 2, None, None]
    )  # (B, Ho, Wo)
    sy = (
        tinv[:, 1, 0, None, None] * xs
        + tinv[:, 1, 1, None, None] * ys
        + tinv[:, 1, 2, None, None]
    )

    x0 = jnp.floor(sx)
    y0 = jnp.floor(sy)
    fx = (sx - x0)[..., None]
    fy = (sy - y0)[..., None]
    x0 = x0.astype(jnp.int32)
    y0 = y0.astype(jnp.int32)

    if valid_wh is not None:
        vw = valid_wh[:, 0][:, None, None]
        vh = valid_wh[:, 1][:, None, None]
    else:
        vw = jnp.full((N, 1, 1), W, jnp.int32)
        vh = jnp.full((N, 1, 1), H, jnp.int32)

    # Flat row-gather formulation: a single (B*H*W, C) table indexed by
    # b*H*W + y*W + x.  The batched take_along_axis form made XLA:TPU
    # materialize transposed copies of the (B, H*W, C) operand in larger
    # programs (profiled: dominant copy-start/copy-done pairs in the joint
    # step); plain row gather keeps the operand in its natural layout.
    #
    # uint8 sources are gathered AS uint8 (4x smaller operand — the copies
    # above were the f32-converted source) and scaled to [0,1] after the
    # gather; scaling commutes with the bilinear lerp, so this is exact.
    post_scale = None
    if images.dtype == jnp.uint8:
        post_scale = jnp.float32(1.0 / 255.0)
    flat = images.reshape(B * H * W, C)
    if src_index is None:
        src = jnp.arange(N, dtype=jnp.int32)
    else:
        src = jnp.asarray(src_index, jnp.int32)
    boff = (src * (H * W))[:, None, None]

    def gather(yy, xx):
        valid = (yy >= 0) & (yy < vh) & (xx >= 0) & (xx < vw)
        yc = jnp.clip(yy, 0, H - 1)
        xc = jnp.clip(xx, 0, W - 1)
        idx = (boff + yc * W + xc).reshape(N * Ho * Wo)
        vals = jnp.take(flat, idx, axis=0).reshape(N, Ho, Wo, C)
        vals = vals.astype(jnp.float32)
        if post_scale is not None:
            vals = vals * post_scale
        return vals * valid[..., None]

    v00 = gather(y0, x0)
    v01 = gather(y0, x0 + 1)
    v10 = gather(y0 + 1, x0)
    v11 = gather(y0 + 1, x0 + 1)
    return (
        v00 * (1 - fx) * (1 - fy)
        + v01 * fx * (1 - fy)
        + v10 * (1 - fx) * fy
        + v11 * fx * fy
    ).astype(jnp.float32)
