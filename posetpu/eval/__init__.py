"""Eval layer: device decode/PCK + offline protocols + preds export
(SURVEY.md §2 C9/C10)."""

from posetpu.eval.decode import (
    accuracy,
    calc_dists,
    final_preds,
    get_preds,
    pck_counts,
    pck_from_counts,
    quarter_offset,
)
from posetpu.eval.pck import pck_lsp, pckh
from posetpu.eval.export import load_preds, save_preds

__all__ = [
    "accuracy",
    "calc_dists",
    "final_preds",
    "get_preds",
    "pck_counts",
    "pck_from_counts",
    "quarter_offset",
    "pckh",
    "pck_lsp",
    "load_preds",
    "save_preds",
]
