"""MPII / LSP dataset objects (SURVEY.md §2 C1/C2).

These replace the reference's `dataset/mpii.py` / `dataset/lsp.py`
torch Dataset subclasses, but with a crucial TPU-native split of work: the
dataset object holds *metadata only* (paths, centers, scales, joints); image
decode happens in the host loader (:mod:`posetpu.data.loader`) and ALL
augmentation happens on device (:mod:`posetpu.aug.pipeline`).  The reference
instead ran decode+augment+rasterize inside DataLoader fork workers (C15) —
the host bottleneck this design removes (BASELINE.json:5).
"""

from __future__ import annotations

import json
import os

import numpy as np
from PIL import Image

from posetpu.data.schema import load_annotations

# Reference dataset conventions (SURVEY.md §2 C1):
MPII_NUM_JOINTS = 16
LSP_NUM_JOINTS = 14
# center/scale adjustment applied per sample: center.y += 15*s, s *= 1.25
MPII_CENTER_Y_SHIFT = 15.0
MPII_SCALE_INFLATE = 1.25


class PoseDataset:
    """Metadata-only dataset over the reference annotation schema."""

    name = "generic"
    num_joints = 16
    flip_pairs = "mpii"

    def __init__(self, json_path, images_dir, split="train", adjust=True):
        samples = load_annotations(json_path, images_dir)
        if split == "train":
            samples = [s for s in samples if not s.is_validation]
        elif split == "valid":
            samples = [s for s in samples if s.is_validation]
        elif split != "all":
            raise ValueError(f"unknown split {split!r}")
        self.samples = samples
        self.split = split
        self.adjust = adjust
        # caches are split-dependent values — name them per split so a
        # val-split object can never poison the train split's numbers
        # (auto pad_hw sizing and color normalization both read these)
        self._mean_cache = os.path.join(
            os.path.dirname(json_path), f"{self.name}_{split}_mean.json"
        )

    def __len__(self):
        return len(self.samples)

    def meta(self, i):
        """(center, scale, pts, vis) with the reference per-sample
        adjustment (center.y += 15*s, s *= 1.25) applied."""
        s = self.samples[i]
        c = s.center.copy()
        sc = s.scale
        # the reference guards on the -1 sentinel exactly (`c[0] != -1`),
        # not on c[0] >= 1 — a far-left center with x in [0, 1) must still
        # get the adjustment
        if self.adjust and c[0] != -1:
            c[1] = c[1] + MPII_CENTER_Y_SHIFT * sc
            sc = sc * MPII_SCALE_INFLATE
        return c, sc, s.pts.copy(), s.vis.copy()

    def image_path(self, i):
        return self.samples[i].img_path

    def head_size(self, i):
        """Official MPII PCKh normalizer (0.6 * head-rectangle diagonal)
        when the annotation carries the head box; None otherwise (callers
        fall back to the keypoint approximation in tools/evaluate.py)."""
        r = self.samples[i].head_rect
        if r is None:
            return None
        return 0.6 * float(np.hypot(r[2] - r[0], r[3] - r[1]))

    def max_image_hw(self):
        """(max_H, max_W) over the split's images, from image HEADERS only
        (PIL's lazy open reads no pixel data), cached next to the
        annotations.  Used to cap the auto-sized pre-pad window: the
        device warp masks reads beyond ``valid_wh`` to zero, so canvas
        beyond the largest real image buys nothing but H2D bytes."""
        cache = os.path.join(
            os.path.dirname(self._mean_cache),
            f"{self.name}_{self.split}_maxhw.json",
        )
        if os.path.exists(cache):
            with open(cache) as f:
                d = json.load(f)
            return int(d["h"]), int(d["w"])
        mh = mw = 0
        for i in range(len(self)):
            with Image.open(self.image_path(i)) as im:
                w, h = im.size
            mh, mw = max(mh, h), max(mw, w)
        try:
            with open(cache, "w") as f:
                json.dump({"h": mh, "w": mw}, f)
        except OSError:
            pass  # read-only data dir: recompute next time
        return mh, mw

    def mean_std(self, max_samples=512):
        """Dataset RGB mean/std, cached next to the annotations (the
        reference caches `mean.pth.tar` computed over the train set)."""
        if os.path.exists(self._mean_cache):
            with open(self._mean_cache) as f:
                d = json.load(f)
            return np.asarray(d["mean"], np.float32), np.asarray(
                d["std"], np.float32
            )
        acc = np.zeros(3, np.float64)
        acc2 = np.zeros(3, np.float64)
        n = 0
        for i in range(min(len(self), max_samples)):
            img = (
                np.asarray(Image.open(self.image_path(i)).convert("RGB"), np.float64)
                / 255.0
            )
            acc += img.mean(axis=(0, 1))
            acc2 += (img**2).mean(axis=(0, 1))
            n += 1
        mean = acc / max(n, 1)
        std = np.sqrt(np.maximum(acc2 / max(n, 1) - mean**2, 1e-8))
        try:
            with open(self._mean_cache, "w") as f:
                json.dump({"mean": mean.tolist(), "std": std.tolist()}, f)
        except OSError:
            pass  # read-only data dir: recompute next time
        return mean.astype(np.float32), std.astype(np.float32)


class MpiiDataset(PoseDataset):
    """MPII (reference `dataset/mpii.py`): 16 joints, Tompson val split via
    the `isValidation` flag in the annotation JSON."""

    name = "mpii"
    num_joints = MPII_NUM_JOINTS
    flip_pairs = "mpii"


class LspDataset(PoseDataset):
    """LSP + LSP-extended (reference `dataset/lsp.py`): 14 joints,
    person-centric; used for the fine-tune experiments (C2, C13)."""

    name = "lsp"
    num_joints = LSP_NUM_JOINTS
    flip_pairs = "lsp"
