"""Batched inverse-affine bilinear warp — the device replacement for the
reference's per-sample CPU crop/rotate/resize (`utils/transforms.py crop`,
SURVEY.md §2 C3 and the native-equivalents table in §2: "Pallas TPU kernel
(or fused XLA gather+bilinear): batched inverse-affine bilinear warp, on
device").

This is the fused-XLA formulation: ONE patch-table gather + a masked lerp,
vectorized over (B, H_out, W_out, C).  It matches
:func:`posetpu.oracles.transforms.crop` bit-for-bit on the same float math.
The warp stays on XLA's native gather rather than Pallas — Mosaic has no
vector gather primitive — but the formulation is tuned for how TPU gathers
actually cost (per-row, payload-width-insensitive): all four bilinear
corners ride one 12-byte-row gather over a shifted-concat 2x2-patch table
instead of four 3-byte gathers (round-2 profile: the four-gather form was
~70% of the train step; see BASELINE.md).
"""

from __future__ import annotations

import jax.numpy as jnp

from posetpu.aug.affine import invert_affine


def affine_warp(images, t, out_res, valid_wh=None, src_index=None,
                table_format="u8"):
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
      table_format: "u8" (default) keeps the patch table in raw bytes;
                "packed32" packs each RGB pixel into ONE uint32 lane before
                the shifted-concat, so the table build is 4-byte-element
                work instead of byte-granularity copies (the round-3
                xplane showed the u8 assembly lowering to while-loops +
                byte-column dynamic-update-slices, ~9 ms of the 97 ms
                step) and the gathered row is 16 lane-aligned bytes
                instead of 12.  Bit-exact with "u8" (pack/unpack moves
                the same integers); only applies to uint8 C=3 sources —
                anything else silently uses the u8 path.

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

    # SINGLE-GATHER patch formulation (round-2 profiling: with four separate
    # corner gathers of a (B*H*W, 3) u8 table, the warp was ~70% of the
    # whole 8-stack train step — TPU gather cost is per-ROW, and a 3-byte
    # payload wastes the lanes; four gathers also meant four s32 index
    # arrays and four mask copies staged through alternate memory.
    #
    # Instead, build a shifted-concat PATCH table T[b, y', x'] = the 2x2
    # pixel patch whose top-left corner is (y'-1, x'-1) of the zero-padded
    # image — pure strided slices, full HBM bandwidth — and fetch all four
    # bilinear corners with ONE 12-byte-row gather + one index array.
    #
    # Correctness at the borders: each corner is masked by its OWN true
    # coordinate's validity (vs the sample's valid_wh), and the base index
    # is clamped to [-1, H-1]/[-1, W-1].  Whenever a corner is valid its
    # clamped base equals its true base (corner valid => y0 in [-1, vh-2]),
    # so valid corners always read their exact pixel; invalid corners read
    # padding or a clamped neighbor and are zeroed by the mask — identical
    # numerics to independently clamped per-corner gathers.
    #
    # uint8 sources are gathered AS uint8 (4x smaller rows) and scaled to
    # [0,1] after the gather; scaling commutes with the bilinear lerp.
    post_scale = None
    if images.dtype == jnp.uint8:
        post_scale = jnp.float32(1.0 / 255.0)
    packed = table_format == "packed32" and images.dtype == jnp.uint8 and C == 3
    padded = jnp.pad(images, ((0, 0), (1, 1), (1, 1), (0, 0)))
    Ht, Wt = H + 1, W + 1
    if src_index is None:
        src = jnp.arange(N, dtype=jnp.int32)
    else:
        src = jnp.asarray(src_index, jnp.int32)
    boff = (src * (Ht * Wt))[:, None, None]
    yc = jnp.clip(y0, -1, H - 1) + 1
    xc = jnp.clip(x0, -1, W - 1) + 1
    idx = (boff + yc * Wt + xc).reshape(N * Ho * Wo)
    if packed:
        # one uint32 lane per pixel: r | g<<8 | b<<16 (elementwise VPU
        # work at full width; no byte-column copies), then the same
        # shifted-concat + single gather over 4-lane rows
        p32 = (
            padded[..., 0].astype(jnp.uint32)
            | (padded[..., 1].astype(jnp.uint32) << 8)
            | (padded[..., 2].astype(jnp.uint32) << 16)
        )  # (B, H+2, W+2)
        T = jnp.stack(
            [
                p32[:, :-1, :-1],  # corner (y0,   x0)
                p32[:, :-1, 1:],   # corner (y0,   x0+1)
                p32[:, 1:, :-1],   # corner (y0+1, x0)
                p32[:, 1:, 1:],    # corner (y0+1, x0+1)
            ],
            axis=-1,
        )  # (B, H+1, W+1, 4)
        rows = jnp.take(T.reshape(B * Ht * Wt, 4), idx, axis=0)
        rows = rows.reshape(N, Ho, Wo, 4)
        patch = jnp.stack(
            [rows & 0xFF, (rows >> 8) & 0xFF, (rows >> 16) & 0xFF],
            axis=-1,
        ).astype(jnp.float32)  # exact unpack of the same integers
    else:
        T = jnp.concatenate(
            [
                padded[:, :-1, :-1],  # corner (y0,   x0)
                padded[:, :-1, 1:],   # corner (y0,   x0+1)
                padded[:, 1:, :-1],   # corner (y0+1, x0)
                padded[:, 1:, 1:],    # corner (y0+1, x0+1)
            ],
            axis=-1,
        )  # (B, H+1, W+1, 4C)
        flat = T.reshape(B * Ht * Wt, 4 * C)
        patch = jnp.take(flat, idx, axis=0).reshape(N, Ho, Wo, 4, C)
        patch = patch.astype(jnp.float32)
    if post_scale is not None:
        patch = patch * post_scale

    def m(yy, xx):
        return ((yy >= 0) & (yy < vh) & (xx >= 0) & (xx < vw)).astype(
            jnp.float32
        )

    wx0, wx1 = (1 - fx)[..., 0], fx[..., 0]
    wy0, wy1 = (1 - fy)[..., 0], fy[..., 0]
    weights = jnp.stack(
        [
            m(y0, x0) * wx0 * wy0,
            m(y0, x0 + 1) * wx1 * wy0,
            m(y0 + 1, x0) * wx0 * wy1,
            m(y0 + 1, x0 + 1) * wx1 * wy1,
        ],
        axis=-1,
    )  # (N, Ho, Wo, 4)
    # explicit multiply-sum, NOT einsum: einsum lowers to dot_general at
    # DEFAULT precision, which on TPU truncates f32 operands to bf16 —
    # breaking the oracle fp-parity this module promises (same reason
    # affine.py avoids matmuls); the k=4 contraction is pure VPU work
    return (weights[..., None] * patch).sum(axis=3).astype(jnp.float32)
