"""Model zoo (SURVEY.md §2 C5/C6/C13)."""

from posetpu.models.hourglass import Bottleneck, Hourglass, HourglassNet, hg
from posetpu.models.agent import (
    AugAgent,
    occlusion_hierarchy,
    rotation_bin_table,
    sample_bins,
    scale_bin_table,
)

__all__ = [
    "Bottleneck",
    "Hourglass",
    "HourglassNet",
    "hg",
    "AugAgent",
    "occlusion_hierarchy",
    "rotation_bin_table",
    "sample_bins",
    "scale_bin_table",
]
