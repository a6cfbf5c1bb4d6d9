"""Offline evaluation CLI (SURVEY.md §3.3): restore a checkpoint, run the
validation split, report PCKh@0.5 (MPII) / PCK@0.2 (LSP), write preds.mat.

Head sizes: the official MPII protocol uses the annotated head rectangle
(0.6 * diag); the bearpaw JSON schema does not carry it, so we fall back to
1.2 * |head_top - upper_neck| from the keypoints (documented approximation;
matches the official sizes closely on MPII).

Installed as ``posetpu-eval``; ``tools/evaluate.py`` is a compatibility
shim around this module.

Usage: posetpu-eval --config hg2_mpii_mini --checkpoint DIR
       [--best] [--synthetic] [--cpu] [--no-probe]
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def head_sizes_from_pts(gts, dataset="mpii"):
    if dataset == "mpii":
        seg = np.linalg.norm(gts[:, 9] - gts[:, 8], axis=-1)  # head-top..neck
    else:
        seg = np.linalg.norm(gts[:, 13] - gts[:, 12], axis=-1)
    return np.maximum(seg * 1.2, 1.0)


def head_sizes(val_ds, gts, dataset="mpii"):
    """Per-sample PCKh normalizers: the OFFICIAL 0.6*head-box diagonal
    where the annotation carries a head rectangle (schema head_rect),
    keypoint fallback elsewhere."""
    fallback = head_sizes_from_pts(gts, dataset)
    out = fallback.copy()
    n_official = 0
    for i in range(len(gts)):
        h = val_ds.head_size(i)
        if h is not None:
            out[i] = max(h, 1.0)
            n_official += 1
    if 0 < n_official < len(gts):
        print(
            f"[eval] head sizes: {n_official}/{len(gts)} official head "
            f"boxes, rest keypoint-approximated"
        )
    return out


def main(argv=None):
    ap = argparse.ArgumentParser(prog="posetpu-eval")
    ap.add_argument("--config", default="hg2_mpii_mini")
    ap.add_argument("--best", action="store_true")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--no-probe", action="store_true")
    ap.add_argument("--probe-deadline", type=float, default=120.0)
    from posetpu.configs import add_overrides

    add_overrides(ap)
    args = ap.parse_args(argv)

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    elif not (args.no_probe or os.environ.get("POSETPU_SKIP_PROBE") == "1"):
        # same fail-fast liveness check as posetpu-train (SURVEY.md §5.3):
        # a wedged tunnel otherwise hangs the restore for many minutes
        from posetpu.utils.probe import probe_backend

        ok, detail = probe_backend(deadline=args.probe_deadline)
        if not ok:
            print(f"[eval] FATAL: device unreachable: {detail}")
            raise SystemExit(2)

    from posetpu.utils.xla_cache import enable_persistent_cache

    enable_persistent_cache()

    from posetpu.configs import apply_overrides, named_config
    from posetpu.eval import pck_lsp, pckh, save_preds
    from posetpu.train.loop import Experiment

    cfg = named_config(args.config)
    cfg = apply_overrides(cfg, args)
    cfg.resume = ""  # restore manually below

    exp = Experiment(cfg, eval_only=True)
    path = exp.ckpt.best_path if args.best else None
    exp.state, epoch, best = exp.ckpt.restore(exp.state, path)
    print(f"[eval] restored epoch {epoch} (best_acc {best:.4f})")

    metrics, preds = exp.validate(epoch)
    n = len(preds)
    gts = np.stack([exp.val_ds.meta(i)[2] for i in range(n)])
    vis = np.stack([exp.val_ds.meta(i)[3] for i in range(n)])
    if cfg.aug.dataset == "lsp":
        mean_pck, per_joint = pck_lsp(preds, gts, vis)
        label = "PCK@0.2"
    else:
        heads = head_sizes(exp.val_ds, gts, "mpii")
        mean_pck, per_joint = pckh(preds, gts, heads, vis)
        label = "PCKh@0.5"
    out = os.path.join(cfg.checkpoint_dir, cfg.name, "preds.mat")
    save_preds(preds, out)
    print(f"[eval] val loss {metrics['loss']:.5f} acc {metrics['acc']:.4f}")
    print(f"[eval] {label} = {mean_pck:.2f}")
    print(
        "[eval] per-joint:",
        " ".join(f"{p:.1f}" for p in np.nan_to_num(per_joint)),
    )
    print(f"[eval] preds saved to {out}")
    return mean_pck


def entry() -> int:
    """Console-script wrapper: setuptools does ``sys.exit(entry())``, and
    ``main`` returns the float PCKh for programmatic callers — sys.exit on
    a float prints it and exits 1, so the script must return an int."""
    main()
    return 0


if __name__ == "__main__":
    main()
