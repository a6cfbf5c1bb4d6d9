"""Official MPII release (.mat) -> posetpu/bearpaw annotation JSON.

The data layer consumes the bearpaw-format JSON the reference shipped
pre-converted under ``data/mpii/`` (SURVEY.md §2 C1).  The official MPII
release is ``mpii_human_pose_v1_u12_1.mat`` — this tool is the missing
seam between "real data appears" and "posetpu-train starts" (VERDICT r4
item 4):

    python tools/convert_mpii.py mpii_human_pose_v1_u12_1.mat \
        data/mpii/annotations.json [--val-list val_images.txt]

Conventions written (all verbatim from the .mat — the center-y/scale
adjustments live in the data layer at load time, not here, matching the
reference's dataset code which also stores the raw values):

- one output sample per annotated person rect of a TRAIN image
  (``img_train==1`` and the rect has ``annopoints``),
- ``joint_self``: 16 x [x, y, vis] in the official MPII id order
  (0 r-ankle .. 15 l-wrist — the exact order oracles/transforms.py
  FLIP_PAIRS['mpii'] indexes); ``vis=1`` for every ANNOTATED point
  (the schema's ``>0 == labeled`` loss-mask semantics; the official
  ``is_visible`` sub-flag does not gate the reference's loss), missing
  joints are [0, 0, 0],
- ``objpos``/``scale_provided``: the rect's raw objpos/scale,
- ``head_rect``: [x1, y1, x2, y2] so eval runs the OFFICIAL PCKh@0.5
  normalizer (0.6 x head-rect diagonal; eval/cli.py head-rect branch),
- ``isValidation``: 1 when the image name is in ``--val-list`` (the
  Tompson ~2958-image split the reference used — one image name per
  line).  Without a list, ``--val-frac`` holds out a deterministic
  hash-based fraction (documented as NOT the official split).

Test coverage builds synthetic official-format .mat fixtures with
scipy.io.savemat (tests/test_converters.py) — the real release is not in
this environment.
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import sys

import numpy as np

MPII_NUM_JOINTS = 16


def _scalar(v, default=None):
    """Collapse scipy's mat_struct scalars/0-d arrays to a python float."""
    if v is None:
        return default
    a = np.asarray(v).ravel()
    if a.size == 0:
        return default
    return float(a[0])


def _field(obj, name):
    """mat_struct attribute access tolerating absent/empty fields."""
    v = getattr(obj, name, None)
    if v is None:
        return None
    if isinstance(v, np.ndarray) and v.size == 0:
        return None
    return v


def _as_list(v):
    """A squeezed mat cell/struct array -> python list (0-d -> [item])."""
    if v is None:
        return []
    if isinstance(v, np.ndarray):
        return list(np.atleast_1d(v))
    return [v]


def _person_samples(image_name, rect):
    """Yield one schema dict per annotated person rect, or nothing."""
    annopoints = _field(rect, "annopoints")
    objpos = _field(rect, "objpos")
    scale = _scalar(_field(rect, "scale"))
    if annopoints is None or objpos is None or not scale:
        return  # unannotated rect (test image or detector-only rect)
    joints = np.zeros((MPII_NUM_JOINTS, 3), np.float64)
    pts = _field(np.atleast_1d(annopoints).ravel()[0], "point")
    for p in _as_list(pts):
        pid = _scalar(_field(p, "id"))
        x, y = _scalar(_field(p, "x")), _scalar(_field(p, "y"))
        if pid is None or x is None or y is None:
            continue
        pid = int(pid)
        if 0 <= pid < MPII_NUM_JOINTS:
            # vis=1 == labeled: the reference's loss mask keys on "labeled",
            # not the official is_visible sub-flag (see module docstring)
            joints[pid] = (x, y, 1.0)
    if not joints[:, 2].any():
        return
    rec = {
        "img_paths": image_name,
        "objpos": [_scalar(_field(objpos, "x")), _scalar(_field(objpos, "y"))],
        "scale_provided": scale,
        "joint_self": joints.tolist(),
    }
    head = [_scalar(_field(rect, k)) for k in ("x1", "y1", "x2", "y2")]
    if all(v is not None for v in head):
        rec["head_rect"] = head
    yield rec


def _deterministic_val(name, frac):
    """Stable pseudo-random holdout: same name -> same split, any order."""
    h = int(hashlib.sha1(name.encode()).hexdigest()[:8], 16)
    return (h % 10_000) < frac * 10_000


def convert(mat_path, out_json, val_list=None, val_frac=0.0):
    from scipy.io import loadmat

    release = loadmat(
        mat_path, struct_as_record=False, squeeze_me=True
    )["RELEASE"]
    annolist = _as_list(_field(release, "annolist"))
    img_train = np.atleast_1d(
        np.asarray(_field(release, "img_train"))
    ).astype(int)

    val_names = None
    if val_list:
        with open(val_list) as f:
            val_names = {ln.strip() for ln in f if ln.strip()}

    samples, n_val = [], 0
    for i, anno in enumerate(annolist):
        if i < len(img_train) and img_train[i] != 1:
            continue  # test image: no public joints to convert
        image = _field(anno, "image")
        if image is None:
            continue
        name = str(_field(image, "name"))
        is_val = (
            name in val_names
            if val_names is not None
            else (_deterministic_val(name, val_frac) if val_frac else False)
        )
        for rec in _iter_rects(anno, name):
            rec["isValidation"] = float(is_val)
            samples.append(rec)
            n_val += int(is_val)
    with open(out_json, "w") as f:
        json.dump(samples, f)
    return len(samples), n_val


def _iter_rects(anno, name):
    for rect in _as_list(_field(anno, "annorect")):
        yield from _person_samples(name, rect)


def main(argv=None):
    ap = argparse.ArgumentParser(
        description="official MPII .mat -> posetpu annotation JSON"
    )
    ap.add_argument("mat", help="mpii_human_pose_v1_u12_1.mat")
    ap.add_argument("out", help="output annotations.json")
    ap.add_argument(
        "--val-list", default=None,
        help="file with one validation image name per line (the Tompson "
        "split the reference used; without it use --val-frac)",
    )
    ap.add_argument(
        "--val-frac", type=float, default=0.0,
        help="deterministic holdout fraction when no --val-list is given "
        "(NOT the official split; documented fallback)",
    )
    args = ap.parse_args(argv)
    n, n_val = convert(args.mat, args.out, args.val_list, args.val_frac)
    print(f"[convert_mpii] wrote {n} samples ({n_val} validation) "
          f"to {args.out}")
    if not n:
        print("[convert_mpii] WARNING: 0 samples — is this the official "
              "release .mat?", file=sys.stderr)
        return 1
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
