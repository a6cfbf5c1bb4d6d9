"""Device-side augmentation ops (SURVEY.md §2 C3/C4 rebuilt on-device)."""

from posetpu.aug.affine import (
    make_transform,
    invert_affine,
    transform_points,
    transform_points_int_float,
    mirror_x,
)
from posetpu.aug.warp import affine_warp
from posetpu.aug.heatmap import rasterize_gaussians
from posetpu.aug.color import color_jitter, color_jitter_ps, color_normalize
from posetpu.aug.pipeline import (
    AugParams,
    augment_batch,
    flip_permutation,
    neutral_params,
    per_sample_keys,
    sample_aug_params,
    sample_aug_params_ps,
)

__all__ = [
    "make_transform",
    "invert_affine",
    "transform_points",
    "transform_points_int_float",
    "mirror_x",
    "affine_warp",
    "rasterize_gaussians",
    "color_jitter",
    "color_jitter_ps",
    "color_normalize",
    "AugParams",
    "augment_batch",
    "flip_permutation",
    "neutral_params",
    "per_sample_keys",
    "sample_aug_params",
    "sample_aug_params_ps",
]
