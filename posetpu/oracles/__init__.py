"""Numpy oracles of the reference numerics (test-only, never on the hot path).

These re-implement, in plain numpy, the exact functions of the reference's
bearpaw-lineage utility layer — SURVEY.md §2 C3 (`utils/transforms.py`),
C4 (`utils/imutils.py`), C9 (`utils/evaluation.py`).  The JAX/Pallas device
ops in :mod:`posetpu.aug` and :mod:`posetpu.eval` are asserted against these
within fp tolerance (the parity bar of BASELINE.json:5).

/root/reference was empty at survey time (SURVEY.md §0), so the semantics here
follow the reconstructed spec: integer 1-indexed keypoint coordinates, the
200*scale person-box convention, truncated-window sigma=1 Gaussian targets,
argmax + quarter-pixel-offset decoding.
"""

from posetpu.oracles.transforms import (
    get_transform,
    transform,
    transform_preds,
    crop,
    fliplr,
    shufflelr,
    color_normalize,
    FLIP_PAIRS,
)
from posetpu.oracles.imutils import gaussian_patch, draw_labelmap
from posetpu.oracles.evaluation import (
    get_preds,
    calc_dists,
    dist_acc,
    accuracy,
    final_preds,
)

__all__ = [
    "get_transform",
    "transform",
    "transform_preds",
    "crop",
    "fliplr",
    "shufflelr",
    "color_normalize",
    "FLIP_PAIRS",
    "gaussian_patch",
    "draw_labelmap",
    "get_preds",
    "calc_dists",
    "dist_acc",
    "accuracy",
    "final_preds",
]
