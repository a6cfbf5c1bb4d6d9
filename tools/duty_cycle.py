"""Measure TPU duty cycle of the real training pipeline (synthetic split,
flagship-ish model): loader decode -> H2D -> fused aug+train step.

Usage: python tools/duty_cycle.py [--stacks 8] [--batch 16] [--res 256]
       [--steps 30] [--backend native|pil] [--trace DIR]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--stacks", type=int, default=8)
    ap.add_argument("--feats", type=int, default=128)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--res", type=int, default=256)
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--backend", default="auto")
    ap.add_argument(
        "--k-per-dispatch", type=int, default=1,
        help="measure the production steps_per_dispatch=K fused path "
        "(K batches stacked per lax.scan dispatch)",
    )
    ap.add_argument("--trace", default=None)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from posetpu.configs import named_config
    from posetpu.data import HostLoader, MpiiDataset, make_synthetic_dataset
    from posetpu.models import hg
    from posetpu.train import TrainState, make_train_step
    from posetpu.train.state import make_optimizer
    from posetpu.utils.profiling import (
        measure_duty_cycle,
        measure_duty_cycle_fused,
        trace,
    )

    root = "/tmp/posetpu_duty_synth"
    json_path = os.path.join(root, "annotations.json")
    # whole K*B groups only: a ragged final group would be skipped by
    # measure_duty_cycle_fused (recompile + short-credit hazard, ADVICE r3),
    # wasting its decode time in the measured wall clock
    unit = args.batch * max(1, args.k_per_dispatch)
    n_train = -(-256 // unit) * unit
    if os.path.exists(json_path):
        from posetpu.data import schema

        n_have = sum(
            not s.is_validation for s in schema.load_annotations(json_path)
        )
        # the loader iterates the WHOLE train split, so reuse requires the
        # existing split itself to divide into whole K*B groups — a
        # size-only check would still yield the ragged group every epoch
        if n_have < n_train or n_have % unit:
            import shutil

            shutil.rmtree(root)
    if not os.path.exists(json_path):
        make_synthetic_dataset(
            root, num_train=n_train, num_val=8, res=(512, 384)
        )
    ds = MpiiDataset(json_path, os.path.join(root, "images"), split="train")
    from posetpu.parallel import make_batch_placer

    loader = HostLoader(
        ds, args.batch, pad_hw=(384, 512), backend=args.backend, prefetch=4,
        place=make_batch_placer(None),  # async H2D, as Experiment wires it
        group=args.k_per_dispatch,
    )

    cfg = named_config("hg8_mpii")
    cfg.aug.inp_res = (args.res, args.res)
    cfg.aug.out_res = (args.res // 4, args.res // 4)
    model = hg(
        num_stacks=args.stacks, num_blocks=1, num_classes=16, num_feats=args.feats
    )
    tx = make_optimizer(cfg.optim, 1000)
    v = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, args.res, args.res, 3)), train=True
    )
    state = TrainState(
        params=v["params"],
        batch_stats=v["batch_stats"],
        opt_state=tx.init(v["params"]),
        step=jnp.zeros((), jnp.int32),
    )
    key = jax.random.PRNGKey(0)
    raw_step = make_train_step(model, tx, cfg.aug, (0.44, 0.44, 0.43))
    step = jax.jit(raw_step)  # per-dispatch mode; fused mode jits its scan
    if args.k_per_dispatch > 1:
        def run():
            return measure_duty_cycle_fused(
                raw_step, state, loader, key,
                max_dispatches=max(1, args.steps // args.k_per_dispatch),
            )
    else:
        def run():
            return measure_duty_cycle(step, state, loader, key, args.steps)
    if args.trace:
        with trace(args.trace):
            duty, t_dev, t_wall = run()
    else:
        duty, t_dev, t_wall = run()
    ips = args.batch / t_wall
    mode = (
        f"K={args.k_per_dispatch}/dispatch" if args.k_per_dispatch > 1
        else "per-dispatch"
    )
    print(
        f"device_step={t_dev*1e3:.2f}ms wall_step={t_wall*1e3:.2f}ms "
        f"duty_cycle={duty*100:.1f}% images/sec={ips:.1f} "
        f"(backend={args.backend}, {mode}, decode+H2D overlap "
        f"{'OK' if duty >= 0.95 else 'LIMITED'})"
    )


if __name__ == "__main__":
    main()
