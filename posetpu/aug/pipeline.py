"""On-device augmentation pipeline — replaces the reference's DataLoader
worker augmentation (`dataset/mpii.py __getitem__`, SURVEY.md §2 C1, §3.1)
with one fused, jittable batch program: sample params -> (flip, scale, rot)
affine -> bilinear warp -> color jitter/normalize -> keypoint transform ->
Gaussian rasterize.  The host only ever decodes JPEGs and pads to a static
shape (SURVEY.md §2 C15: host pipeline is decode-only).

The flip is realized as a coordinate mirror composed into the affine (no
array reversal): flipping a padded image then cropping is identical to
cropping the original through a mirrored affine, and composing keeps
everything a single gather pass.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from posetpu.aug.affine import (
    compose_affine,
    make_transform,
    transform_points_int_float,
)
from posetpu.aug.color import color_jitter, color_jitter_ps, color_normalize
from posetpu.aug.heatmap import rasterize_gaussians
from posetpu.aug.warp import affine_warp
from posetpu.oracles.transforms import FLIP_PAIRS


def per_sample_keys(key, index):
    """(B,) PRNG keys derived from the GLOBAL dataset sample index.

    Keying randomness on the sample — not on the batch position or the mesh
    shard — makes every stochastic choice (aug params, agent bin draws,
    jitter) identical whether the batch runs on one device or sharded over a
    mesh, and reproducible across device counts.  This is what lets the
    DP==single-device equivalence tests hold with stochastic augmentation
    enabled (SURVEY.md §4.4)."""
    return jax.vmap(lambda i: jax.random.fold_in(key, i))(index)


class AugParams(NamedTuple):
    """Per-sample augmentation parameters (all (B,) arrays)."""

    scale_factor: jnp.ndarray  # multiplicative on person scale
    rot: jnp.ndarray  # degrees
    flip: jnp.ndarray  # bool


def flip_permutation(num_joints, dataset="mpii"):
    """Joint index permutation for a horizontal flip (reference `shufflelr`
    matchedParts)."""
    perm = list(range(num_joints))
    for a, b in FLIP_PAIRS[dataset]:
        perm[a], perm[b] = perm[b], perm[a]
    return jnp.asarray(perm, jnp.int32)


def sample_aug_params(
    key,
    batch,
    scale_factor=0.25,
    rot_factor=30.0,
    rot_prob=0.6,
    flip_prob=0.5,
    scale_mode="exp",
):
    """Sample the reference's random augmentation distribution (SURVEY.md
    §3.1: "s·=clamp(2^N(0,.25)), r=±30° w/ prob, flip .5").

    scale_mode "exp": s *= 2^clip(N(0,1)*sf, -2sf, 2sf)  (hourglass lineage)
    scale_mode "linear": s *= clip(N(0,1)*sf + 1, 1-sf, 1+sf)
    rot: clip(N(0,1)*rf, -2rf, 2rf), zeroed with prob (1 - rot_prob).
    """
    k_s, k_r, k_rp, k_f = jax.random.split(key, 4)
    ns = jax.random.normal(k_s, (batch,))
    if scale_mode == "exp":
        sf = 2.0 ** jnp.clip(ns * scale_factor, -2 * scale_factor, 2 * scale_factor)
    elif scale_mode == "linear":
        sf = jnp.clip(ns * scale_factor + 1.0, 1.0 - scale_factor, 1.0 + scale_factor)
    else:
        raise ValueError(f"unknown scale_mode {scale_mode!r}")
    rot = jnp.clip(
        jax.random.normal(k_r, (batch,)) * rot_factor, -2 * rot_factor, 2 * rot_factor
    )
    rot = jnp.where(jax.random.uniform(k_rp, (batch,)) <= rot_prob, rot, 0.0)
    flip = jax.random.uniform(k_f, (batch,)) < flip_prob
    return AugParams(scale_factor=sf, rot=rot, flip=flip)


def sample_aug_params_ps(
    keys,
    scale_factor=0.25,
    rot_factor=30.0,
    rot_prob=0.6,
    flip_prob=0.5,
    scale_mode="exp",
):
    """Per-sample-key variant of :func:`sample_aug_params`: ``keys`` is (B,)
    PRNG keys (see :func:`per_sample_keys`), so the drawn parameters are
    sharding-invariant.  Same distribution, same clipping rules."""

    def one(k):
        k_s, k_r, k_rp, k_f = jax.random.split(k, 4)
        ns = jax.random.normal(k_s, ())
        if scale_mode == "exp":
            sf = 2.0 ** jnp.clip(
                ns * scale_factor, -2 * scale_factor, 2 * scale_factor
            )
        elif scale_mode == "linear":
            sf = jnp.clip(
                ns * scale_factor + 1.0, 1.0 - scale_factor, 1.0 + scale_factor
            )
        else:
            raise ValueError(f"unknown scale_mode {scale_mode!r}")
        rot = jnp.clip(
            jax.random.normal(k_r, ()) * rot_factor, -2 * rot_factor, 2 * rot_factor
        )
        rot = jnp.where(jax.random.uniform(k_rp, ()) <= rot_prob, rot, 0.0)
        flip = jax.random.uniform(k_f, ()) < flip_prob
        return sf, rot, flip

    sf, rot, flip = jax.vmap(one)(keys)
    return AugParams(scale_factor=sf, rot=rot, flip=flip)


def neutral_params(batch):
    """Identity augmentation (validation / the joint-training neutral crop,
    SURVEY.md §3.2)."""
    return AugParams(
        scale_factor=jnp.ones((batch,)),
        rot=jnp.zeros((batch,)),
        flip=jnp.zeros((batch,), bool),
    )


def _mirror_matrix(width, batch_shape):
    """(B, 3, 3) source-coordinate mirror x -> (w-1) - x (0-indexed; identical
    to an array fliplr of the valid region)."""
    w = jnp.broadcast_to(jnp.asarray(width, jnp.float32), batch_shape)
    zeros = jnp.zeros_like(w)
    ones = jnp.ones_like(w)
    return jnp.stack(
        [
            jnp.stack([-ones, zeros, w - 1.0], axis=-1),
            jnp.stack([zeros, ones, zeros], axis=-1),
            jnp.stack([zeros, zeros, ones], axis=-1),
        ],
        axis=1,
    )


def augment_batch(
    images,
    valid_wh,
    center,
    scale,
    pts,
    vis,
    params: AugParams,
    *,
    inp_res=(256, 256),
    out_res=(64, 64),
    sigma=1.0,
    mean=(0.0, 0.0, 0.0),
    std=None,
    dataset="mpii",
    jitter_key=None,
    jitter_keys=None,
    src_index=None,
    warp_table="u8",
    raster_backend="auto",
):
    """Fully-fused device augmentation of one batch.

    ``src_index`` (N,) maps each output crop to a source image so several
    differently-parameterized crops of the same batch warp in ONE gather
    pass (metadata args must then be length N; see affine_warp).

    Args:
      images:   (B, Hp, Wp, 3) decoded images, zero-padded to a static shape,
                float in [0, 1].
      valid_wh: (B, 2) int true (width, height) of each image before padding.
      center:   (B, 2) person center (reference coordinate convention).
      scale:    (B,) person scale (box = 200*scale px); already carries the
                dataset adjustments (x1.25, center.y += 15*s — SURVEY.md C1).
      pts:      (B, K, 2) 1-indexed keypoints in source coords.
      vis:      (B, K) visibility (>0 labeled).
      params:   AugParams from :func:`sample_aug_params`, agent bins, or
                :func:`neutral_params`.
      jitter_key: PRNG key for color jitter, or None to disable (val).
      jitter_keys: (B,) per-sample jitter keys (sharding-invariant variant;
                takes precedence over jitter_key).

    Returns dict with:
      input (B, *inp_res, 3) normalized; target (B, K, *out_res);
      target_weight (B, K); tpts (B, K, 2) 1-indexed heatmap coords.
    """
    B, K = pts.shape[:2]
    # uint8 images pass straight into the warp (gathered as uint8, scaled
    # to [0,1] post-gather inside affine_warp — 4x smaller gather operand)
    w = valid_wh[:, 0].astype(jnp.float32)

    # --- flip: mirror center/pts + joint swap (reference fliplr/shufflelr) ---
    flip = params.flip
    perm = flip_permutation(K, dataset)
    c_x = jnp.where(flip, w - center[:, 0], center[:, 0])
    center_f = jnp.stack([c_x, center[:, 1]], axis=-1)
    pts_sw = pts[:, perm, :]
    vis_sw = vis[:, perm]
    pts_mx = jnp.stack([w[:, None] - pts_sw[..., 0], pts_sw[..., 1]], axis=-1)
    pts_f = jnp.where(flip[:, None, None], pts_mx, pts)
    vis_f = jnp.where(flip[:, None], vis_sw, vis)

    s_aug = scale * params.scale_factor
    rot = params.rot

    # --- image warp (mirror composed into the affine) ---
    t_img = make_transform(center_f, s_aug, inp_res, rot)
    mirror = _mirror_matrix(w, (B,))
    t_eff = jnp.where(flip[:, None, None], compose_affine(t_img, mirror), t_img)
    inp = affine_warp(
        images, t_eff, inp_res, valid_wh=valid_wh, src_index=src_index,
        table_format=warp_table,
    )

    # Known deviation from the reference recipe: jitter runs on the WARPED
    # crop (scale -> clamp after interpolation) while the reference jitters
    # then clamps the full image before its host-side crop (clamp before
    # interpolation).  The two differ only where jittered neighbors exceed
    # 1.0; replicating exactly would mean jittering the full padded frame
    # before the warp (more bandwidth for a sub-quantization-level input
    # distribution shift).  Geometry/target parity is unaffected.
    if jitter_keys is not None:
        inp = color_jitter_ps(inp, jitter_keys)
    elif jitter_key is not None:
        inp = color_jitter(inp, jitter_key)
    inp = color_normalize(inp, mean, std)

    # --- targets ---
    t_out = make_transform(center_f, s_aug, out_res, rot)
    # one affine application serves both outputs; the ints are truncated
    # from the raw 0-indexed map (NOT trunc(tpts_float - 1), which differs
    # 1-2 ulp below integers — see transform_points_int_float)
    tpts, tpts_float = transform_points_int_float(pts_f, t_out)
    target, target_weight = rasterize_gaussians(
        tpts - 1.0, vis_f, out_res, sigma=sigma, backend=raster_backend
    )
    return {
        "input": inp,
        "target": target,
        "target_weight": target_weight,
        "tpts": tpts,
        # un-truncated float heatmap coords: consumers needing CROP-pixel
        # positions (parts-AHO occluder boxes) rescale these exactly —
        # the truncated ints above quantize to inp/out (=4px) steps
        "tpts_float": tpts_float,
        "center": center_f,
        "scale": s_aug,
    }
