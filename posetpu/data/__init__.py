"""Data layer: reference-schema ingestion, datasets, synthetic split,
decode-only host loader (SURVEY.md §2 C1/C2/C15)."""

from posetpu.data.schema import SampleMeta, dump_annotations, load_annotations
from posetpu.data.datasets import LspDataset, MpiiDataset, PoseDataset
from posetpu.data.synthetic import make_synthetic_dataset
from posetpu.data.loader import HostLoader, group_stack, load_sample, pad_batch

__all__ = [
    "SampleMeta",
    "dump_annotations",
    "load_annotations",
    "LspDataset",
    "MpiiDataset",
    "PoseDataset",
    "make_synthetic_dataset",
    "HostLoader",
    "load_sample",
    "group_stack",
    "pad_batch",
]
