"""Adversarial-gain demonstration (SURVEY.md §6 accuracy anchors).

Every other adversarial test in the suite proves PLUMBING (reward sign,
probability-mass shift, DP equivalence); this script demonstrates the
METHOD: under an equal epoch budget from the same phase-1 init, the
phase-2 adversarial recipe (ASR scale/rot agent + body-part AHO
occlusion, SURVEY.md C6/C7/C13) should hold or beat the baseline
random-augmentation recipe on a HARD validation split it never saw —
wider person-scale range, random occluder patches over joints, and a
bones-only distractor figure (``make_synthetic_dataset(hard_val=True)``).
Train images are the standard synthetic renderings for both arms, so any
val gap is robustness, not fitting the perturbations.

Protocol (all arms share seed, data, schedule):
  phase 1   baseline aug, E1 epochs, from scratch
  arm A     baseline aug,   E2 epochs, init from phase-1 best, lr/4
  arm B     adversarial,    E2 epochs, init from phase-1 best, lr/4
  report    best val acc (train-time PCK) + final PCKh@0.5 on the hard
            val for both arms; curves land in each arm's checkpoint dir
            (log.txt + log.png via the fit-end Logger.plot()).

Usage: python tools/adversarial_gain.py [--out DIR] [--epochs1 N]
       [--epochs2 N] [--stacks N] [--cpu] [--quick]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_cfg(name, ann, imgs, out_dir, args, *, adversarial, init_from=""):
    from posetpu.configs import named_config

    cfg = named_config("hg2_mpii_mini")
    cfg.name = name
    cfg.model.stacks = args.stacks
    cfg.model.feats = args.feats
    cfg.aug.inp_res = (args.res, args.res)
    cfg.aug.out_res = (args.res // 4, args.res // 4)
    cfg.batch_size = args.batch
    cfg.synthetic = False
    cfg.annotations = ann
    cfg.images_dir = imgs
    cfg.checkpoint_dir = out_dir
    cfg.num_devices = 1
    cfg.seed = args.seed
    if init_from:
        cfg.init_pose_from = init_from
        cfg.optim.lr = 2.5e-4 / 4  # phase-2 fine-tune LR (BASELINE.md)
        cfg.optim.epochs = args.epochs2
        cfg.optim.schedule = (int(args.epochs2 * 0.7),)
    else:
        cfg.optim.epochs = args.epochs1
        cfg.optim.schedule = (
            int(args.epochs1 * 0.65),
            int(args.epochs1 * 0.85),
        )
    if adversarial:
        cfg.agent.enabled = True
        if not getattr(args, "no_occlusion", False):
            cfg.agent.occ_mode = "parts"
            cfg.agent.occ_nodes = 9  # 1 + sum(PART_GROUPS["mpii"] levels)
        cfg.agent.pose_ref_weight = args.pose_ref_weight
    return cfg


def run_arm(cfg, progress, skip=False):
    from posetpu.train.loop import Experiment

    if skip:
        # arm already trained in this out dir (phase1/armA are seed-
        # deterministic — verified identical across three runs); reload
        # its best checkpoint instead of re-training.  eval_only keeps the
        # constructor from touching the arm's artifacts (log.txt stays
        # append-mode, config.json is not rewritten)
        exp = Experiment(cfg, eval_only=True)
        exp.state, _, best = exp.ckpt.restore(exp.state, exp.ckpt.best_path)
        return exp, float(best)
    exp = Experiment(cfg)
    state, best = exp.fit(progress=progress)
    return exp, best


def final_pckh(exp):
    import numpy as np

    from posetpu.eval import pckh

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from evaluate import head_sizes_from_pts

    # evaluate the BEST checkpoint, not the last epoch
    exp.state, epoch, best = exp.ckpt.restore(exp.state, exp.ckpt.best_path)
    metrics, preds = exp.validate(epoch)
    n = len(preds)
    gts = np.stack([exp.val_ds.meta(i)[2] for i in range(n)])
    vis = np.stack([exp.val_ds.meta(i)[3] for i in range(n)])
    heads = head_sizes_from_pts(gts, "mpii")
    mean_pck, _ = pckh(preds, gts, heads, vis)
    return float(mean_pck), float(metrics["acc"])


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="checkpoints/adversarial_gain")
    ap.add_argument("--epochs1", type=int, default=40)
    ap.add_argument("--epochs2", type=int, default=20)
    ap.add_argument("--stacks", type=int, default=2)
    ap.add_argument("--feats", type=int, default=128)
    ap.add_argument("--res", type=int, default=256)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--num-train", type=int, default=96)
    ap.add_argument("--num-val", type=int, default=32)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument(
        "--skip-phase1", action="store_true",
        help="reuse <out>/phase1 from a previous run (deterministic)",
    )
    ap.add_argument(
        "--skip-arm-a", action="store_true",
        help="reuse <out>/armA_baseline from a previous run",
    )
    ap.add_argument(
        "--arm-b-tag", default="",
        help="suffix for arm B's dir + result file (sweep without clobbering)",
    )
    ap.add_argument(
        "--no-occlusion", action="store_true",
        help="arm B: scale/rot ASR agent only (no AHO occlusion head)",
    )
    ap.add_argument(
        "--pose-ref-weight", type=float, default=0.0,
        help="arm B: weight of reference crops in the pose update "
        "(0 = reference protocol, pose trains on adversarial crops only; "
        "0.5 anchors BN/training distribution on the reference recipe)",
    )
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument(
        "--quick", action="store_true",
        help="tiny shapes for a smoke run (CPU-safe)",
    )
    args = ap.parse_args(argv)
    if args.quick:
        args.epochs1, args.epochs2 = 2, 2
        args.stacks, args.feats, args.res = 1, 16, 64
        args.num_train, args.num_val, args.batch = 16, 8, 8

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from posetpu.data import make_synthetic_dataset

    root = os.path.join(args.out, "data")
    ann = os.path.join(root, "annotations.json")
    meta_path = os.path.join(root, "meta.json")
    data_meta = {
        "seed": args.seed,
        "num_train": args.num_train,
        "num_val": args.num_val,
        "hard_val": True,
    }
    if not os.path.exists(ann):
        make_synthetic_dataset(
            root,
            num_train=args.num_train,
            num_val=args.num_val,
            res=(320, 240),
            seed=args.seed,
            hard_val=True,
        )
        with open(meta_path, "w") as f:
            json.dump(data_meta, f)
    elif os.path.exists(meta_path):
        # reusing an existing split: the CLI args must describe THE SAME
        # data, or result.json would misrecord the study's provenance
        with open(meta_path) as f:
            prev = json.load(f)
        if prev != data_meta:
            raise SystemExit(
                f"[adv-gain] {root} holds a split generated with {prev}, "
                f"but this invocation says {data_meta} — pick a fresh --out "
                "or match the generation args"
            )
    imgs = os.path.join(root, "images")

    log = lambda s: print(f"[adv-gain] {s}", flush=True)

    log(f"phase 1: baseline, {args.epochs1} epochs"
        + (" [skip: reuse]" if args.skip_phase1 else ""))
    cfg1 = build_cfg("phase1", ann, imgs, args.out, args, adversarial=False)
    exp1, best1 = run_arm(cfg1, log, skip=args.skip_phase1)
    p1_dir = os.path.join(args.out, "phase1")
    log(f"phase 1 best val acc {best1:.4f}")

    log(f"arm A: baseline fine-tune, {args.epochs2} epochs"
        + (" [skip: reuse]" if args.skip_arm_a else ""))
    if args.skip_arm_a:
        # equal-budget contract: the reused arm must have trained exactly
        # the epoch count this sweep's arm B is about to get
        a_log = os.path.join(args.out, "armA_baseline", "log.txt")
        with open(a_log) as f:
            trained = sum(1 for _ in f) - 1  # minus header
        if trained != args.epochs2:
            raise SystemExit(
                f"[adv-gain] reused arm A trained {trained} epochs but "
                f"--epochs2 is {args.epochs2} — the A/B would not be "
                "equal-budget; re-train arm A or match --epochs2"
            )
    cfgA = build_cfg(
        "armA_baseline", ann, imgs, args.out, args,
        adversarial=False, init_from=p1_dir,
    )
    expA, bestA = run_arm(cfgA, log, skip=args.skip_arm_a)
    pckhA, accA = final_pckh(expA)

    arm_b = "armB_adversarial" + (f"_{args.arm_b_tag}" if args.arm_b_tag else "")
    log(f"arm B ({arm_b}): adversarial fine-tune, {args.epochs2} epochs")
    cfgB = build_cfg(
        arm_b, ann, imgs, args.out, args,
        adversarial=True, init_from=p1_dir,
    )
    expB, bestB = run_arm(cfgB, log)
    pckhB, accB = final_pckh(expB)

    result = {
        "phase1_best_acc": float(best1),
        "armA_baseline": {"best_acc": float(bestA), "pckh": pckhA, "acc": accA},
        "armB_adversarial": {"best_acc": float(bestB), "pckh": pckhB, "acc": accB},
        "pckh_gain": pckhB - pckhA,
        "epochs": [args.epochs1, args.epochs2],
        "hard_val": True,
        "pose_ref_weight": args.pose_ref_weight,
        "occlusion": not args.no_occlusion,
        "seed": args.seed,
        "reused_phase1": args.skip_phase1,
        "reused_arm_a": args.skip_arm_a,
    }
    out_json = os.path.join(
        args.out,
        f"result_{args.arm_b_tag}.json" if args.arm_b_tag else "result.json",
    )
    with open(out_json, "w") as f:
        json.dump(result, f, indent=2)
    log(f"hard-val PCKh@0.5: baseline {pckhA:.2f} vs adversarial {pckhB:.2f} "
        f"(gain {pckhB - pckhA:+.2f}); details in {out_json}")
    return result


if __name__ == "__main__":
    main()
