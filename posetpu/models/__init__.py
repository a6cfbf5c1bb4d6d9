"""Model zoo (SURVEY.md §2 C5/C6/C13)."""

from posetpu.models.hourglass import Bottleneck, Hourglass, HourglassNet, hg
from posetpu.models.agent import (
    AugAgent,
    occ_level_offsets,
    occlusion_hierarchy,
    occlusion_tree_logp,
    rotation_bin_table,
    sample_bins,
    sample_bins_ps,
    sample_occlusion_tree,
    scale_bin_table,
)

__all__ = [
    "Bottleneck",
    "Hourglass",
    "HourglassNet",
    "hg",
    "AugAgent",
    "occ_level_offsets",
    "occlusion_hierarchy",
    "occlusion_tree_logp",
    "rotation_bin_table",
    "sample_bins",
    "sample_bins_ps",
    "sample_occlusion_tree",
    "scale_bin_table",
]
