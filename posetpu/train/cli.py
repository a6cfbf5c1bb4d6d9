"""Training CLI (SURVEY.md §2 C12; L5/L6 public entry point).

Usage mirrors the reference's per-experiment scripts through one binary:

    posetpu-train --config hg8_mpii --json data/mpii/annotations.json \
        --image-path data/mpii/images --checkpoint checkpoints/hg8
    posetpu-train --config hg2_mpii_mini --synthetic --epochs 2

Flag names (`--stacks --blocks --sigma --scale-factor --rot-factor --lr
--schedule --resume ...`) match the reference CLI (SURVEY.md §5.6).
"""

from __future__ import annotations

import argparse
import os

from posetpu.configs import NAMED_CONFIGS, add_overrides, apply_overrides, named_config


def build_parser():
    p = argparse.ArgumentParser(
        prog="posetpu-train",
        description="TPU-native pose-adv-aug training (posetpu)",
    )
    p.add_argument(
        "--config",
        default="hg2_mpii_mini",
        choices=sorted(NAMED_CONFIGS),
        help="named experiment config (BASELINE.json build configs)",
    )
    p.add_argument("--cpu", action="store_true", help="force CPU backend")
    p.add_argument(
        "--cpu-devices", type=int, default=None, help="virtual CPU device count"
    )
    p.add_argument(
        "--profile",
        action="store_true",
        help="capture a jax profiler trace of the first training epoch "
        "into <checkpoint>/<name>/trace (view with tools/profile_step.py "
        "--parse-only)",
    )
    p.add_argument(
        "--no-probe",
        action="store_true",
        help="skip the startup backend-liveness probe (a subprocess jit "
        "under a hard deadline; on a wedged device tunnel it exits with a "
        "clear diagnostic instead of hanging for many minutes)",
    )
    # 240 s: a cold tunnel's first tiny jit measured ~70-100 s (round 5);
    # 120 s false-negatived a live chip
    p.add_argument("--probe-deadline", type=float, default=240.0)
    add_overrides(p)
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    import jax

    if args.cpu or args.cpu_devices:
        jax.config.update("jax_platforms", "cpu")
        if args.cpu_devices:
            jax.config.update("jax_num_cpu_devices", args.cpu_devices)

    # Probe BEFORE the first real backend touch (jax.devices() below would
    # hang for many minutes on a wedged tunnel — SURVEY.md §5.3).  CPU
    # backends are in-process and can't be unreachable, so skip there.
    if not (args.no_probe or args.cpu or args.cpu_devices
            or os.environ.get("POSETPU_SKIP_PROBE") == "1"):
        from posetpu.utils.probe import probe_backend

        ok, detail = probe_backend(deadline=args.probe_deadline)
        if not ok:
            print(f"[posetpu] FATAL: device unreachable: {detail}\n"
                  "[posetpu] (retry later, use --cpu, or --no-probe to "
                  "bypass this check)")
            return 2

    from posetpu.utils.xla_cache import enable_persistent_cache

    enable_persistent_cache()

    cfg = named_config(args.config)
    cfg = apply_overrides(cfg, args)

    from posetpu.train.loop import Experiment

    print(f"[posetpu] config={cfg.name} devices={jax.local_device_count()} "
          f"({jax.devices()[0].platform})")
    exp = Experiment(cfg)
    if args.profile:
        from posetpu.utils.profiling import trace

        tdir = os.path.join(cfg.checkpoint_dir, cfg.name, "trace")
        # Profile on a throwaway copy of the state: the traced epoch runs
        # real optimizer updates (and the train step DONATES its state
        # buffers, so a plain reference would be invalidated); letting the
        # updates leak into fit() would train epochs+1 epochs with the lr
        # schedule desynced by one.  The loader's epoch counter is also
        # rewound so fit() sees the same data order as an unprofiled run.
        import jax.numpy as jnp

        state_before = jax.tree.map(jnp.copy, exp.state)
        loader_epoch = exp.loader.epoch
        with trace(tdir):
            key = jax.random.PRNGKey(cfg.seed + 4321)
            exp.train_epoch(0, key)
        exp.state = state_before
        exp.loader.epoch = loader_epoch
        print(f"[posetpu] profiler trace written to {tdir}")
    state, best = exp.fit()
    print(f"[posetpu] done; best val acc {best:.4f}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
