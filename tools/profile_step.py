"""Op-level TPU profiling: capture a jax.profiler trace of a train step and
print the top device ops by total time (SURVEY.md §5.1).

The tensorboard profile converter in this image is version-broken, so this
parses the raw xplane.pb directly (works with
PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python).

Usage:
  PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python \
      python tools/profile_step.py [--joint] [--stacks 8] [--batch 32] \
      [--steps 3] [--top 20] [--trace-dir DIR]
"""

from __future__ import annotations

import argparse
import glob
import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# The C++ protobuf in this image rejects the tensorflow.tsl xplane proto;
# the pure-python impl parses it fine.  Must be set before the first
# protobuf import (which happens lazily inside summarize_xplane), so the
# unattended bench_matrix profile stage needs no wrapper env.
os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")


def _op_category(name):
    """Coarse HLO-op category from an event name of the form
    ``%x = TYPE{layout} opkind(args), ...``."""
    if "=" in name:
        toks = name.split("=", 1)[1].strip().split()
        if len(toks) >= 2:
            return toks[1].split("(")[0].lstrip("%")
        name = toks[0] if toks else name
    return name.split("(")[0][:32] or "other"


def summarize_xplane(path, top=20, by_category=False):
    """Aggregate event durations PER LINE (xplane lines are parallel
    tracks — per-core op streams, step markers, async copy streams —
    summing across them double-counts nested events)."""
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    xs = xplane_pb2.XSpace()
    with open(path, "rb") as f:
        xs.ParseFromString(f.read())
    out = []
    for plane in xs.planes:
        if not plane.lines:
            continue
        meta = {k: v.name for k, v in plane.event_metadata.items()}
        for line in plane.lines:
            tot = defaultdict(int)
            cnt = defaultdict(int)
            for ev in line.events:
                name = meta.get(ev.metadata_id, str(ev.metadata_id))
                if by_category:
                    # the whole-step jit event double-counts its children
                    if name.startswith("jit_") or name.isdigit():
                        continue
                    name = _op_category(name)
                tot[name] += ev.duration_ps
                cnt[name] += 1
            if not tot:
                continue
            rows = sorted(tot.items(), key=lambda kv: -kv[1])[:top]
            out.append(
                (
                    f"{plane.name} / line {line.name or line.id}",
                    [(n, ps / 1e9, cnt[n]) for n, ps in rows],
                )
            )
    return out


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--joint", action="store_true")
    ap.add_argument("--stacks", type=int, default=8)
    ap.add_argument("--feats", type=int, default=128)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--top", type=int, default=20)
    ap.add_argument("--trace-dir", default="/tmp/posetpu_trace")
    ap.add_argument("--parse-only", default=None, help="existing xplane.pb")
    ap.add_argument(
        "--by-category", action="store_true",
        help="aggregate device time by HLO op category instead of op name",
    )
    ap.add_argument(
        "--out", default=None,
        help="also write the op-table summary to this file (bench_matrix "
        "stages only keep the last 3 stdout lines, so an unattended "
        "profile run needs a persistent artifact)",
    )
    args = ap.parse_args(argv)

    if args.parse_only:
        path = args.parse_only
    else:
        import numpy as np
        import jax
        import jax.numpy as jnp

        from posetpu.configs import named_config
        from posetpu.models import (
            AugAgent,
            hg,
            rotation_bin_table,
            scale_bin_table,
        )
        from posetpu.train import (
            JointState,
            TrainState,
            make_joint_step,
            make_train_step,
        )
        from posetpu.train.state import make_optimizer

        cfg = named_config("hg8_mpii_asr" if args.joint else "hg8_mpii")
        model = hg(
            num_stacks=args.stacks, num_feats=args.feats, num_classes=16
        )
        tx = make_optimizer(cfg.optim, 1000)
        x = jnp.zeros((1, 256, 256, 3))
        pv = model.init(jax.random.PRNGKey(0), x, train=True)
        pstate = TrainState(
            params=pv["params"],
            batch_stats=pv["batch_stats"],
            opt_state=tx.init(pv["params"]),
            step=jnp.zeros((), jnp.int32),
        )
        B = args.batch
        rng = np.random.RandomState(0)
        pad = 320
        batch = jax.device_put(
            {
                "image": (rng.rand(B, pad, pad, 3) * 255).astype(np.uint8),
                "valid_wh": np.tile([[pad, pad]], (B, 1)).astype(np.int32),
                "center": np.tile([[160.3, 160.2]], (B, 1)).astype(np.float32),
                "scale": np.full((B,), 1.28, np.float32),
                "pts": (rng.rand(B, 16, 2) * 200 + 60).astype(np.float32),
                "vis": np.ones((B, 16), np.float32),
                "index": np.arange(B, dtype=np.int32),
            }
        )
        if args.joint:
            # production default: agent sees the crop avg-pooled x2
            # (full-res agent stems provoke the pathological joint
            # compile — configs.AgentConfig.input_downscale)
            agent = AugAgent(
                num_scale_bins=7, num_rot_bins=7,
                input_downscale=cfg.agent.input_downscale,
            )
            atx = make_optimizer(cfg.optim, 1000)
            av = agent.init(jax.random.PRNGKey(1), x, train=True)
            state = JointState(
                pose=pstate,
                agent=TrainState(
                    params=av["params"],
                    batch_stats=av["batch_stats"],
                    opt_state=atx.init(av["params"]),
                    step=jnp.zeros((), jnp.int32),
                ),
                step=jnp.zeros((), jnp.int32),
            )
            step = jax.jit(
                make_joint_step(
                    model, agent, tx, atx, cfg.aug, (0.44, 0.44, 0.43),
                    scale_table=scale_bin_table(7),
                    rot_table=rotation_bin_table(7),
                ),
                donate_argnums=(0,),
            )
        else:
            state = pstate
            step = jax.jit(
                make_train_step(model, tx, cfg.aug, (0.44, 0.44, 0.43)),
                donate_argnums=(0,),
            )
        key = jax.random.PRNGKey(0)
        for _ in range(3):
            key, sub = jax.random.split(key)
            state, m = step(state, batch, sub)
        jax.block_until_ready(m)
        jax.profiler.start_trace(args.trace_dir)
        for _ in range(args.steps):
            key, sub = jax.random.split(key)
            state, m = step(state, batch, sub)
        jax.block_until_ready(m)
        float(m["loss"])
        jax.profiler.stop_trace()
        files = sorted(
            glob.glob(args.trace_dir + "/**/*.xplane.pb", recursive=True)
        )
        path = files[-1]
        print(f"[profile] trace: {path}")

    lines = [f"[profile] source: {path}"]
    for plane, rows in summarize_xplane(path, args.top, args.by_category):
        lines.append(f"\n== plane {plane}")
        for name, ms, c in rows:
            lines.append(f"  {ms:9.2f} ms  x{c:<5} {name[:95]}")
    print("\n".join(lines))
    if args.out:
        with open(args.out, "w") as f:
            f.write("\n".join(lines) + "\n")
        print(f"[profile] summary written: {args.out}")


if __name__ == "__main__":
    main()
