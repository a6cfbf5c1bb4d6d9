"""Model zoo (SURVEY.md §2 C5/C6/C13)."""

from posetpu.models.hourglass import Bottleneck, Hourglass, HourglassNet, hg
from posetpu.models.agent import (
    PART_GROUPS,
    AugAgent,
    occ_level_offsets,
    occlusion_hierarchy,
    occlusion_tree_logp,
    part_level_sizes,
    part_occlusion_boxes,
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
    "PART_GROUPS",
    "occ_level_offsets",
    "occlusion_hierarchy",
    "occlusion_tree_logp",
    "part_level_sizes",
    "part_occlusion_boxes",
    "rotation_bin_table",
    "sample_bins",
    "sample_bins_ps",
    "sample_occlusion_tree",
    "scale_bin_table",
]
