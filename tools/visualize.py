"""Prediction visualization (reference `imutils` sample/heatmap helpers,
SURVEY.md §2 C4/C11 adjacency): renders skeleton + joints over validation
images, optionally with the predicted heatmap overlay, to PNG files.

Usage: python tools/visualize.py --config hg2_mpii_mini --checkpoint DIR
       [--n 4] [--out /tmp/viz] [--cpu]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

MPII_BONES = [
    (0, 1), (1, 2), (2, 6), (3, 6), (3, 4), (4, 5),
    (6, 7), (7, 8), (8, 9),
    (10, 11), (11, 12), (12, 7), (13, 7), (13, 14), (14, 15),
]
LSP_BONES = [
    (0, 1), (1, 2), (3, 4), (4, 5), (2, 3),
    (6, 7), (7, 8), (9, 10), (10, 11), (8, 12), (9, 12), (12, 13),
]


def draw_pose(img_u8, pts, bones, color=(0, 255, 80)):
    from PIL import Image, ImageDraw

    im = Image.fromarray(img_u8).convert("RGB")
    d = ImageDraw.Draw(im)
    for a, b in bones:
        d.line([tuple(pts[a] - 1), tuple(pts[b] - 1)], fill=color, width=2)
    for x, y in pts:
        d.ellipse([x - 3, y - 3, x + 1, y + 1], outline=(255, 60, 60), width=2)
    return im


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="hg2_mpii_mini")
    ap.add_argument("--best", action="store_true")
    ap.add_argument("--n", type=int, default=4)
    ap.add_argument("--out", default="/tmp/posetpu_viz")
    ap.add_argument("--cpu", action="store_true")
    from posetpu.configs import add_overrides

    add_overrides(ap)
    args = ap.parse_args(argv)

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    from PIL import Image

    from posetpu.configs import apply_overrides, named_config
    from posetpu.train.loop import Experiment

    cfg = named_config(args.config)
    cfg = apply_overrides(cfg, args)
    cfg.resume = ""
    exp = Experiment(cfg, eval_only=True)
    exp.state, epoch, _ = exp.ckpt.restore(
        exp.state, exp.ckpt.best_path if args.best else None
    )

    _, preds = exp.validate(epoch)
    os.makedirs(args.out, exist_ok=True)
    bones = LSP_BONES if cfg.aug.dataset == "lsp" else MPII_BONES
    for i in range(min(args.n, len(preds))):
        img = np.asarray(Image.open(exp.val_ds.image_path(i)).convert("RGB"))
        gt = exp.val_ds.meta(i)[2]
        im = draw_pose(img, preds[i], bones, color=(0, 255, 80))
        im = draw_pose(np.asarray(im), gt, bones, color=(90, 120, 255))
        p = os.path.join(args.out, f"val_{i:03d}.png")
        im.save(p)
        print(f"[viz] {p} (green=pred, blue=gt)")


if __name__ == "__main__":
    main()
