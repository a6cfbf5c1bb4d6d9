"""Official LSP / LSP-extended release (joints.mat) -> posetpu JSON.

The LSP fine-tune experiments (SURVEY.md §2 C2; BASELINE.json config 4)
consume bearpaw-schema JSON; the official releases ship only a MATLAB
``joints.mat``.  This converts both flavors (VERDICT r4 item 4):

    python tools/convert_lsp.py joints.mat out.json --flavor lsp
    python tools/convert_lsp.py joints.mat out.json --flavor lspet

Layouts and conventions:

- ``lsp``  : joints is 3 x 14 x 2000; images ``im0001.jpg..im2000.jpg``;
  the official protocol trains on 1-1000 and evaluates PCK@0.2 on
  1001-2000, so samples 1001-2000 get ``isValidation=1``.  The third
  row flags OCCLUDED joints (1 = occluded), so vis = 1 - flag
  [R-med — re-verify against the reference if the mount is populated].
- ``lspet``: joints is 14 x 3 x 10000; images ``im00001.jpg..``; all
  training (``isValidation=0``); the third channel flags VISIBLE
  joints, used as-is.
- Joint order (both): 0 r-ankle .. 5 l-ankle, 6 r-wrist .. 11 l-wrist,
  12 neck, 13 head-top — exactly oracles/transforms.py
  FLIP_PAIRS['lsp'] indexing.
- ``objpos``/``scale_provided`` do not exist in the release; they are
  derived from the labeled-joint bounding box: center = bbox center,
  scale = max(bbox_h, bbox_w) / 200 * margin (person-centric crop, the
  paper's LSP setting).  [R-low — the reference shipped precomputed
  values; re-verify if it ever materializes.]

Tested against synthetic scipy.io.savemat fixtures
(tests/test_converters.py).
"""

from __future__ import annotations

import argparse
import json

import numpy as np

LSP_NUM_JOINTS = 14


def _canonical(joints, flavor):
    """-> (N, 14, 3) float array with vis == 'labeled and visible'."""
    joints = np.asarray(joints, np.float64)
    if flavor == "lsp":
        if joints.shape[:2] != (3, LSP_NUM_JOINTS):
            raise ValueError(f"lsp joints.mat must be 3x14xN, got {joints.shape}")
        j = np.transpose(joints, (2, 1, 0))  # (N, 14, 3)
        j[:, :, 2] = 1.0 - j[:, :, 2]  # occluded-flag -> visible-flag
    elif flavor == "lspet":
        if joints.shape[:2] != (LSP_NUM_JOINTS, 3):
            raise ValueError(
                f"lspet joints.mat must be 14x3xN, got {joints.shape}"
            )
        j = np.transpose(joints, (2, 0, 1))  # (N, 14, 3)
    else:
        raise ValueError(f"unknown flavor {flavor!r}")
    # a (0, 0) joint is unlabeled regardless of its flag (lspet padding)
    unlabeled = (j[:, :, 0] == 0) & (j[:, :, 1] == 0)
    j[:, :, 2] = np.where(unlabeled, 0.0, j[:, :, 2])
    return j


def _bbox_center_scale(pts, vis, margin):
    lab = vis > 0
    if not lab.any():
        return None, None
    x, y = pts[lab, 0], pts[lab, 1]
    center = [float((x.min() + x.max()) / 2), float((y.min() + y.max()) / 2)]
    side = max(float(x.max() - x.min()), float(y.max() - y.min()), 1.0)
    return center, side / 200.0 * margin


def convert(mat_path, out_json, flavor="lsp", margin=1.4):
    from scipy.io import loadmat

    joints = _canonical(loadmat(mat_path)["joints"], flavor)
    digits, val_from = (4, 1000) if flavor == "lsp" else (5, None)
    samples = []
    for i, j in enumerate(joints):
        center, scale = _bbox_center_scale(j[:, :2], j[:, 2], margin)
        if center is None:
            continue  # fully unlabeled entry
        samples.append(
            {
                "img_paths": f"im{i + 1:0{digits}d}.jpg",
                "objpos": center,
                "scale_provided": scale,
                "joint_self": j.tolist(),
                "isValidation": float(val_from is not None and i >= val_from),
            }
        )
    with open(out_json, "w") as f:
        json.dump(samples, f)
    return len(samples), sum(int(s["isValidation"]) for s in samples)


def main(argv=None):
    ap = argparse.ArgumentParser(
        description="official LSP/LSPET joints.mat -> posetpu JSON"
    )
    ap.add_argument("mat", help="joints.mat")
    ap.add_argument("out", help="output annotations.json")
    ap.add_argument("--flavor", choices=["lsp", "lspet"], default="lsp")
    ap.add_argument(
        "--margin", type=float, default=1.4,
        help="person-box margin over the joint bbox (scale derivation)",
    )
    args = ap.parse_args(argv)
    n, n_val = convert(args.mat, args.out, args.flavor, args.margin)
    print(f"[convert_lsp] wrote {n} samples ({n_val} validation) to {args.out}")
    return 0 if n else 1


if __name__ == "__main__":
    raise SystemExit(main())
