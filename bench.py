"""Benchmark: images/sec/chip for the flagship aug+train step
(8-stack hourglass, on-device augmentation, bf16) — the headline metric of
BASELINE.json:2.

Prints exactly ONE JSON line:
  {"metric": ..., "value": N, "unit": "images/sec/chip", "vs_baseline": N}

vs_baseline is measured against the literature-anchored PyTorch single-GPU
hourglass training throughput (~12 img/s on a Titan X class card for the
8-stack model; the reference never published a number — BASELINE.md).  The
north-star target is >= 5x that (BASELINE.json:5).

TIMING METHODOLOGY (round-2 correction): on this environment's tunneled
TPU, `jax.block_until_ready` returns BEFORE the device finishes, so any
per-step "blocked" wall time undercounts the step (round-1 headline numbers
exceeded the chip's bf16 roofline — physically impossible — and are
retracted in BASELINE.md).  The only trustworthy synchronization is an
actual device->host VALUE fetch (`float(loss)`).  And because each dispatch
through the 1-core host relay costs ~100 ms of host time, honest DEVICE
throughput requires fusing K train steps into ONE program (`lax.scan` over
the step body) and fetching the final loss: one dispatch, K real optimizer
updates, wall time dominated by device compute.  That is what run_bench
measures.  Loader-fed and joint modes fetch the loss every step instead
(host-inclusive, see their docstrings).

Usage: python bench.py [--quick] [--cpu] [--batch N] [--stacks N]
       [--steps N] [--warp-table u8|packed32] [--joint [--fused]]
       [--serve [--pipeline K]] [--loader host|grain] [--no-probe]

A backend-liveness probe runs first (subprocess jit under
--probe-deadline); on a wedged device tunnel the script prints ONE
structured line with "error": "tpu_unavailable" and exits 3 instead of
hanging (BENCH_r03 post-mortem).  tools/bench_matrix.py chains the whole
measurement campaign.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

REF_GPU_IMG_PER_SEC = 12.0  # literature anchor, see BASELINE.md


def _tpu_unavailable_line(reason):
    """The ONE driver-parseable structured error line (shared by the
    startup fail-fast and the mid-run watchdog)."""
    return json.dumps(
        {
            "metric": "images/sec/chip",
            "value": None,
            "unit": "images/sec/chip",
            "vs_baseline": None,
            "error": "tpu_unavailable",
            "detail": reason,
        }
    )


class watchdog:
    """Hard deadline around a device call + fetch (VERDICT r4 item 5).

    The startup probe bounds a tunnel that is wedged BEFORE the run; a
    mid-run wedge (after the probe passed, during a timed fetch) hangs
    inside the runtime's C++ where no exception can interrupt it, so the
    only escape is a daemon timer that prints the structured
    ``tpu_unavailable`` line and hard-exits 3 — the driver then records a
    clean diagnostic instead of rc=124 (BENCH_r03's failure mode).

    Deadlines: steady-state fetches use ``POSETPU_FETCH_DEADLINE``
    (default 600 s — a fused-K dispatch is ~1-2 s on hardware, so 600 s is
    unambiguous death); first calls that may legitimately compile for many
    minutes pass an explicit larger ``deadline``."""

    FETCH_DEADLINE = float(os.environ.get("POSETPU_FETCH_DEADLINE", "600"))

    def __init__(self, deadline=None, label="device fetch"):
        self.deadline = self.FETCH_DEADLINE if deadline is None else deadline
        self.label = label

    def _fire(self):
        print(
            _tpu_unavailable_line(
                f"mid-run wedge: {self.label} exceeded {self.deadline:.0f}s"
            ),
            flush=True,
        )
        os._exit(3)

    def __enter__(self):
        import threading

        self._t = threading.Timer(self.deadline, self._fire)
        self._t.daemon = True
        self._t.start()
        return self

    def __exit__(self, *exc):
        self._t.cancel()
        return False


def _synthetic_batch(batch, res, classes=16, seed=0):
    """Synthetic host batch at the padded shape the loader would produce."""
    import numpy as np

    rng = np.random.RandomState(seed)
    pad = res + res // 4
    return {
        "image": (rng.rand(batch, pad, pad, 3) * 255).astype(np.uint8),
        "valid_wh": np.tile(np.array([[pad, pad]], np.int32), (batch, 1)),
        "center": np.tile(
            np.array([[pad / 2 + 0.3, pad / 2 + 0.2]], np.float32), (batch, 1)
        ),
        "scale": np.full((batch,), pad / 250.0, np.float32),
        "pts": (
            rng.rand(batch, classes, 2) * pad * 0.6 + pad * 0.2
        ).astype(np.float32),
        "vis": np.ones((batch, classes), np.float32),
        "index": np.arange(batch, dtype=np.int32),
    }


def _fused_k_rates(step, state, batch_dev, batch, K, warmup, trials,
                   compile_label=None):
    """The round-2 honest methodology in ONE place (baseline and joint
    benches share it): K steps fused into a single donated lax.scan
    dispatch, synchronized only by the final device->host loss fetch
    (block_until_ready lies on this tunnel).  Returns the median rate of
    ``trials`` timed dispatches; with ``compile_label`` the first-call
    (compile+run) wall time is logged to stderr.  NOTE: with the
    persistent XLA cache enabled (the default since round 4) a warm
    machine's first call measures cache deserialization, not a fresh
    compile — use POSETPU_XLA_CACHE=0 to re-measure true compile time."""
    import statistics
    from functools import partial

    import jax

    @partial(jax.jit, donate_argnums=(0,))
    def run_k(state, b, key):
        def body(carry, _):
            st, k = carry
            k, sub = jax.random.split(k)
            st, m = step(st, b, sub)
            return (st, k), m["loss"]

        (state, _), losses = jax.lax.scan(body, (state, key), None, length=K)
        return state, losses[-1]

    for w in range(max(warmup, 1)):  # compile + warm; value fetch = sync
        t0 = time.perf_counter()
        # first call may legitimately compile for many minutes (joint
        # monolith ~10 min) — larger watchdog deadline there
        with watchdog(deadline=1800 if w == 0 else None,
                      label=f"warm dispatch {w}"):
            state, loss = run_k(state, batch_dev, jax.random.PRNGKey(w))
            float(loss)
        if w == 0 and compile_label:
            sys.stderr.write(
                f"[{compile_label}] first call (compile+{K} steps): "
                f"{time.perf_counter() - t0:.1f}s\n"
            )
    rates = []
    for t in range(trials):
        t0 = time.perf_counter()
        with watchdog(label=f"timed dispatch {t}"):
            state, loss = run_k(state, batch_dev, jax.random.PRNGKey(100 + t))
            float(loss)  # device->host fetch: the only real sync here
        rates.append(batch * K / (time.perf_counter() - t0))
    return statistics.median(rates)


def run_bench(batch=32, stacks=8, feats=128, steps=10, warmup=1, res=256,
              trials=3, scan_stacks=False, warp_table="packed32",
              raster_backend="xla"):
    import jax
    import jax.numpy as jnp

    from posetpu.configs import named_config
    from posetpu.models import hg
    from posetpu.train import TrainState, make_train_step
    from posetpu.train.state import make_optimizer

    cfg = named_config("hg8_mpii")
    cfg.aug.inp_res = (res, res)
    cfg.aug.out_res = (res // 4, res // 4)
    cfg.aug.warp_table = warp_table
    cfg.aug.raster_backend = raster_backend
    model = hg(
        num_stacks=stacks, num_blocks=1, num_classes=16, num_feats=feats,
        scan_stacks=scan_stacks, remat=scan_stacks,
    )
    tx = make_optimizer(cfg.optim, 1000)
    x = jnp.zeros((1, res, res, 3))
    v = model.init(jax.random.PRNGKey(0), x, train=True)
    state = TrainState(
        params=v["params"],
        batch_stats=v["batch_stats"],
        opt_state=tx.init(v["params"]),
        step=jnp.zeros((), jnp.int32),
    )
    step = make_train_step(model, tx, cfg.aug, (0.44, 0.44, 0.43))
    batch_dev = jax.device_put(_synthetic_batch(batch, res))
    return _fused_k_rates(step, state, batch_dev, batch, steps, warmup, trials)


def run_bench_joint(batch=16, stacks=8, feats=128, steps=20, warmup=3,
                    res=None, fused=False, config="hg8_mpii_asr", trials=3,
                    raster_backend="xla", warp_table="packed32"):
    """Full adversarial (ASR) minimax step throughput — the flagship
    feature.

    ``fused=False`` (default): the split-program single-chip path (four
    dispatches per step, proven equivalent to the fused one by tests);
    device-resident batch; loss fetched every step.  This number INCLUDES
    the ~0.4 s of host relay dispatch overhead per step that this 1-core
    build host imposes (a production host with asynchronous dispatch would
    overlap it).

    ``fused=True``: the monolithic make_joint_step program, K steps fused
    into one lax.scan dispatch ended by a value fetch — the DEVICE-ONLY
    joint throughput (same methodology as run_bench).  Also prints the
    monolith's compile time to stderr: the round-1 pathological compile
    (575 s, pre-input_downscale) is the reason the split variant exists;
    this mode is the standing re-adjudication of that decision.

    ``config`` selects the named joint config to benchmark AS CONFIGURED
    (BASELINE.json rows): "hg8_mpii_asr" (3), "hg8_lsp_aho" (4: 14 LSP
    joints + tree-AHO occlusion head), "hg8_mpii_384_dp8" (5: 384² —
    measured here on ONE chip; the DP-8 correctness gate is the driver's
    dryrun).  ``res=None`` keeps the config's own input resolution."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from posetpu.configs import named_config
    from posetpu.models import (
        AugAgent,
        hg,
        occlusion_hierarchy,
        rotation_bin_table,
        scale_bin_table,
    )
    from posetpu.train import JointState, TrainState
    from posetpu.train.adversarial import make_joint_step, make_joint_step_split
    from posetpu.train.state import make_optimizer

    cfg = named_config(config)
    if res:
        cfg.aug.inp_res = (res, res)
        cfg.aug.out_res = (res // 4, res // 4)
    cfg.aug.raster_backend = raster_backend
    cfg.aug.warp_table = warp_table
    res = cfg.aug.inp_res[0]
    classes = cfg.model.classes
    model = hg(
        num_stacks=stacks, num_blocks=1, num_classes=classes, num_feats=feats
    )
    # AHO head exactly as the config trains it (config 4: 22-node tree)
    occ_boxes = (
        occlusion_hierarchy(tuple(cfg.aug.inp_res), tuple(cfg.agent.occ_levels))
        if cfg.agent.occ_nodes
        else None
    )
    agent = AugAgent(
        num_scale_bins=cfg.agent.scale_bins,
        num_rot_bins=cfg.agent.rot_bins,
        num_occ_nodes=len(occ_boxes) if occ_boxes is not None else 0,
        occ_mode=cfg.agent.occ_mode,
        occ_levels=tuple(cfg.agent.occ_levels),
        occ_dataset=cfg.aug.dataset,
        input_downscale=cfg.agent.input_downscale,
    )
    tx = make_optimizer(cfg.optim, 1000)
    atx = make_optimizer(cfg.optim, 1000)
    x = jnp.zeros((1, res, res, 3))
    pv = model.init(jax.random.PRNGKey(0), x, train=True)
    av = agent.init(jax.random.PRNGKey(1), x, train=True)
    state = JointState(
        pose=TrainState(
            params=pv["params"],
            batch_stats=pv["batch_stats"],
            opt_state=tx.init(pv["params"]),
            step=jnp.zeros((), jnp.int32),
        ),
        agent=TrainState(
            params=av["params"],
            batch_stats=av["batch_stats"],
            opt_state=atx.init(av["params"]),
            step=jnp.zeros((), jnp.int32),
        ),
        step=jnp.zeros((), jnp.int32),
    )
    step_kw = dict(
        scale_table=scale_bin_table(cfg.agent.scale_bins),
        rot_table=rotation_bin_table(
            cfg.agent.rot_bins, -cfg.aug.rot_factor, cfg.aug.rot_factor
        ),
        occ_boxes=occ_boxes,
        occ_mode=cfg.agent.occ_mode if occ_boxes is not None else None,
        occ_levels=tuple(cfg.agent.occ_levels) if occ_boxes is not None else None,
        update_every=cfg.agent.update_every,
    )
    if fused:
        step = make_joint_step(
            model, agent, tx, atx, cfg.aug, (0.44, 0.44, 0.43), **step_kw
        )
    else:
        step = make_joint_step_split(
            model, agent, tx, atx, cfg.aug, (0.44, 0.44, 0.43), **step_kw
        )

    batch_dev = jax.device_put(_synthetic_batch(batch, res, classes=classes))

    if fused:
        # caller's warmup/trials are honored (ADVICE r3: they used to be
        # hardcoded 1/3 here while the split branch honored warmup)
        return _fused_k_rates(
            step, state, batch_dev, batch, steps, warmup=warmup,
            trials=trials, compile_label="bench --joint --fused",
        )

    key = jax.random.PRNGKey(0)
    m = None
    with watchdog(deadline=1800, label="joint split warmup"):
        for _ in range(warmup):
            key, sub = jax.random.split(key)
            state, m = step(state, batch_dev, sub)
        if m is not None:
            float(m["loss"])  # real sync (block_until_ready lies here)
    t0 = time.perf_counter()
    for i in range(steps):
        key, sub = jax.random.split(key)
        with watchdog(label=f"joint split step {i}"):
            state, m = step(state, batch_dev, sub)
            float(m["loss"])
    return batch * steps / (time.perf_counter() - t0)


def run_bench_serve(batch=64, stacks=8, feats=128, steps=20, warmup=2,
                    res=256, pad=320, pipeline=0, warp_table="packed32"):
    """Serving throughput: the PosePredictor path (uint8 padded batch ->
    neutral warp -> hourglass forward -> reference-exact decode), timed
    per dispatch WITH the device->host result fetch every call — exactly
    what a serving frontend pays per batch.  (__call__ returns numpy, so
    each call is a real sync; no scan fusion — serving is per-request.)

    ``pipeline=K`` times PosePredictor.predict_iter(depth=K) instead:
    up to K batches stay in flight, so each batch's fetch overlaps the
    next batches' device compute — what a serving frontend with a request
    queue pays per batch at steady state."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from posetpu.infer import PosePredictor
    from posetpu.models import hg

    model = hg(num_stacks=stacks, num_blocks=1, num_classes=16,
               num_feats=feats)
    v = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, res, res, 3)), train=True
    )
    p = PosePredictor(
        model, v["params"], v["batch_stats"],
        inp_res=(res, res), out_res=(res // 4, res // 4),
        warp_table=warp_table,
    )
    rng = np.random.RandomState(0)
    images = rng.randint(0, 255, (batch, pad, pad, 3), dtype=np.uint8)
    valid_wh = np.tile(np.array([[pad, pad]], np.int32), (batch, 1))
    center = np.tile(np.array([[pad / 2, pad / 2]], np.float32), (batch, 1))
    scale = np.full((batch,), pad / 250.0, np.float32)
    with watchdog(deadline=1800, label="serve warmup"):
        for _ in range(warmup):
            p(images, valid_wh, center, scale)
    if pipeline:
        feed = ((images, valid_wh, center, scale) for _ in range(steps))
        t0 = time.perf_counter()
        # one watchdog over the whole pipelined drain: per-item arming
        # would miss a wedge inside the in-flight queue's final joins
        # (600 s vs ~10 s of real drain is unambiguous death)
        with watchdog(label="serve pipelined drain"):
            for _ in p.predict_iter(feed, depth=pipeline):
                pass
        dt = time.perf_counter() - t0
        return batch * steps / dt
    t0 = time.perf_counter()
    for i in range(steps):
        with watchdog(label=f"serve call {i}"):
            p(images, valid_wh, center, scale)
    dt = time.perf_counter() - t0
    return batch * steps / dt


def run_bench_loader(
    batch=16, stacks=8, feats=128, steps=20, warmup=3, res=256,
    backend="host", workers=0, group=1,
):
    """End-to-end loader-fed steady state: decode on host (HostLoader or
    grain), everything else on device.  The number is the audit trail for
    the duty-cycle projection in BASELINE.md — on a 1-core build host the
    per-dispatch path (group=1) is relay+decode-bound by design (SURVEY.md
    §7 hard-part 4).  ``group=K`` measures the PRODUCTION K-steps-per-
    dispatch path (Experiment steps_per_dispatch): the loader stacks K
    batches per superbatch and one lax.scan dispatch runs K optimizer
    steps, amortizing the ~100 ms host relay over K device steps.
    ``steps`` counts optimizer steps in both modes; the final loss fetch is
    the only sync (the state chain makes the wall time honest)."""
    import tempfile

    import jax

    from posetpu.configs import named_config
    from posetpu.data import HostLoader, MpiiDataset, make_synthetic_dataset
    from posetpu.data.grain_pipeline import GrainLoader
    from posetpu.models import hg
    from posetpu.train import TrainState, fuse_steps, make_train_step
    from posetpu.train.state import make_optimizer
    import jax.numpy as jnp

    root = os.path.join(tempfile.gettempdir(), "posetpu_bench_synth")
    ann = os.path.join(root, "annotations.json")
    # dataset must cover one full epoch of WHOLE groups: a ragged final
    # group would recompile the scan at a second length inside the timed
    # region AND break the images-per-dispatch accounting (every dispatch
    # below is credited with `group` steps)
    n_batches = max(4, -(-64 // batch), group)
    n_batches = -(-n_batches // group) * group  # round up to whole groups
    need = n_batches * batch
    if os.path.exists(ann):
        from posetpu.data import schema

        if len(schema.load_annotations(ann)) < need + 8:
            import shutil

            shutil.rmtree(root)
    if not os.path.exists(ann):
        make_synthetic_dataset(
            root, num_train=need, num_val=8, res=(640, 480)
        )
    ds = MpiiDataset(ann, os.path.join(root, "images"), split="train")

    cfg = named_config("hg8_mpii")
    cfg.aug.inp_res = (res, res)
    cfg.aug.out_res = (res // 4, res // 4)
    pad_hw = (512, 640)
    cls = GrainLoader if backend == "grain" else HostLoader
    if backend == "grain":
        kw = {"num_workers": workers}
    else:
        from posetpu.parallel import make_batch_placer

        # async H2D in the prefetch thread (same as Experiment's default)
        kw = {"place": make_batch_placer(None)}
    loader = cls(ds, batch, pad_hw=pad_hw, seed=0, group=group, **kw)

    model = hg(num_stacks=stacks, num_blocks=1, num_classes=16, num_feats=feats)
    tx = make_optimizer(cfg.optim, 1000)
    x = jnp.zeros((1, res, res, 3))
    v = model.init(jax.random.PRNGKey(0), x, train=True)
    state = TrainState(
        params=v["params"],
        batch_stats=v["batch_stats"],
        opt_state=tx.init(v["params"]),
        step=jnp.zeros((), jnp.int32),
    )

    def batches():
        while True:  # endless epochs
            yield from loader

    it = batches()
    key = jax.random.PRNGKey(0)
    if group > 1:
        step = jax.jit(
            fuse_steps(make_train_step(model, tx, cfg.aug, (0.44, 0.44, 0.43))),
            donate_argnums=(0,),
        )
        n_dispatch = -(-steps // group)
        m = None
        with watchdog(deadline=1800, label="loader group warmup"):
            for _ in range(warmup):
                state, key, m = step(state, next(it), key)
            if m is not None:
                float(m["loss"][-1])  # real sync (block_until_ready lies)
        t0 = time.perf_counter()
        with watchdog(label="loader group timed run"):
            for _ in range(n_dispatch):
                state, key, m = step(state, next(it), key)
            float(m["loss"][-1])
        return batch * group * n_dispatch / (time.perf_counter() - t0)
    step = jax.jit(
        make_train_step(model, tx, cfg.aug, (0.44, 0.44, 0.43)),
        donate_argnums=(0,),
    )
    m = None
    with watchdog(deadline=1800, label="loader warmup"):
        for _ in range(warmup):
            key, sub = jax.random.split(key)
            state, m = step(state, next(it), sub)
        if m is not None:
            float(m["loss"])  # real sync (block_until_ready lies here)
    t0 = time.perf_counter()
    with watchdog(label="loader timed run"):
        for _ in range(steps):
            key, sub = jax.random.split(key)
            state, m = step(state, next(it), sub)
        float(m["loss"])
    # sustained wall time INCLUDING host decode/collate — the whole chain
    return batch * steps / (time.perf_counter() - t0)


def _fail_fast(reason):
    """Print the driver-parseable structured error line and exit nonzero.

    An unreachable backend must become a <3-minute diagnostic, never a
    silent hang that eats the driver's whole capture window (BENCH_r03
    rc=124 was exactly that)."""
    print(_tpu_unavailable_line(reason))
    sys.exit(3)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true", help="tiny model, CPU-safe")
    ap.add_argument("--batch", type=int, default=None)
    ap.add_argument("--stacks", type=int, default=None)
    ap.add_argument("--steps", type=int, default=None)
    ap.add_argument(
        "--warmup", type=int, default=None,
        help="whole-program warm calls before timing (every mode)",
    )
    ap.add_argument(
        "--cpu", action="store_true",
        help="force the CPU backend (via jax.config.update — the "
        "JAX_PLATFORMS env var is pinned by this machine's sitecustomize "
        "and silently ignored)",
    )
    ap.add_argument(
        "--no-probe", action="store_true",
        help="skip the startup backend-liveness probe (it runs a trivial "
        "jit in a subprocess under --probe-deadline so a wedged device "
        "tunnel fails fast with a structured error instead of hanging)",
    )
    # 240 s, not 120: a COLD tunnel legitimately takes ~70-100 s for the
    # first tiny jit (measured round 5) — 120 s false-negatived a live
    # chip; 240 s still fails fast relative to the multi-hour outages
    ap.add_argument("--probe-deadline", type=float, default=240.0)
    ap.add_argument("--res", type=int, default=None, help="input resolution (384 for config 5)")
    ap.add_argument(
        "--loader", choices=["host", "grain"], default=None,
        help="measure the loader-fed end-to-end chain instead of the "
        "device-resident step (decode included)",
    )
    ap.add_argument("--loader-workers", type=int, default=0)
    ap.add_argument(
        "--k-per-dispatch", type=int, default=1,
        help="with --loader: fuse K train steps per dispatch (the "
        "production steps_per_dispatch path; lax.scan over K stacked "
        "batches)",
    )
    ap.add_argument(
        "--trials", type=int, default=None,
        help="median-of-N whole-program timing calls (device-resident mode)",
    )
    ap.add_argument(
        "--scan-stacks", action="store_true",
        help="benchmark the nn.scan+remat stack layout "
        "(device-resident mode)",
    )
    ap.add_argument(
        "--warp-table", choices=["u8", "packed32"], default="packed32",
        help="warp patch-table layout A/B (device-resident, --joint and "
        "--serve modes; bit-exact — see aug/warp.py).  Default packed32 "
        "since round 5: measured +3.7% on hardware (bench_matrix "
        "warp-packed32, 2026-08-18); u8 is the legacy like-for-like knob",
    )
    ap.add_argument(
        # bench defaults to XLA, NOT auto: every round-2/3 reference row
        # was (unknowingly — the auto rule missed the axon platform name)
        # measured with the XLA rasterizer, and the driver's BENCH_rN
        # comparison needs like-for-like until the raster-pallas A/B stage
        # adjudicates a flip
        "--raster-backend", choices=["auto", "xla", "pallas"], default="xla",
        help="Gaussian target rasterizer A/B (device-resident modes; "
        "parity-tested — see aug/heatmap.py; default xla = the backend "
        "all prior BENCH rows used)",
    )
    ap.add_argument(
        "--joint", action="store_true",
        help="benchmark the full adversarial (ASR) minimax step",
    )
    ap.add_argument(
        "--fused", action="store_true",
        help="with --joint: the monolithic fused joint program, K steps "
        "per lax.scan dispatch (device-only number + compile-time probe)",
    )
    ap.add_argument(
        "--config", default="hg8_mpii_asr",
        help="with --joint: named joint config to benchmark as configured "
        "(hg8_mpii_asr | hg8_lsp_aho | hg8_mpii_384_dp8)",
    )
    ap.add_argument(
        "--serve", action="store_true",
        help="benchmark the serving path (PosePredictor: warp + forward "
        "+ decode, per-dispatch with result fetch)",
    )
    ap.add_argument(
        "--pipeline", type=int, default=0, metavar="DEPTH",
        help="with --serve: keep DEPTH batches in flight "
        "(PosePredictor.predict_iter) instead of syncing per call",
    )
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
        os.environ["POSETPU_PROBE_PLATFORM"] = "cpu"  # probe subprocess too

    if not args.no_probe and os.environ.get("POSETPU_SKIP_PROBE") != "1":
        from posetpu.utils.probe import probe_backend

        ok, detail = probe_backend(deadline=args.probe_deadline)
        if not ok:
            _fail_fast(detail)

    # persistent XLA cache: a re-run of the same bench skips the multi-
    # minute (joint monolith: ~10 min) compile entirely
    from posetpu.utils.xla_cache import enable_persistent_cache

    enable_persistent_cache()

    per_dispatch = bool(args.loader or args.joint or args.serve)
    if args.quick:
        kw = dict(batch=4, stacks=1, feats=16, steps=5, warmup=2, res=64)
    elif per_dispatch:
        kw = dict(batch=32, stacks=8, feats=128, steps=20, warmup=3, res=256)
    else:
        # steps = K train steps fused into one lax.scan program (see module
        # docstring); warmup = whole-program calls before timing.  K=32
        # since round 5: each timed dispatch pays ONE host relay (~46 ms
        # measured), so larger K amortizes it exactly like the production
        # loop's steps_per_dispatch — measured 337.5 @ K=10 vs 349.2 @
        # K=32 (+3.5%, headline-k32 campaign row); K=64 is within noise
        # of the B/d asymptote (~355), so 32 is the knee.
        kw = dict(batch=32, stacks=8, feats=128, steps=32, warmup=1, res=256)
    if args.batch:
        kw["batch"] = args.batch
    if args.stacks:
        kw["stacks"] = args.stacks
    if args.steps:
        kw["steps"] = args.steps
    if args.res:
        kw["res"] = args.res
    if args.warmup is not None:
        kw["warmup"] = args.warmup

    if args.loader:
        kw["backend"] = args.loader
        kw["workers"] = args.loader_workers
        kw["group"] = args.k_per_dispatch
        ips = run_bench_loader(**kw)
        k = args.k_per_dispatch
        metric = (
            f"images/sec/chip (loader-fed end-to-end, {args.loader}"
            + (f", K={k}/dispatch)" if k > 1 else ")")
        )
    elif args.joint:
        if args.fused:
            kw["fused"] = True
            if args.steps is None:
                kw["steps"] = 10  # K per scan dispatch, like run_bench
            if args.warmup is None:
                kw["warmup"] = 1  # default stays one K-step warm dispatch
            if args.trials:
                kw["trials"] = args.trials
        kw["raster_backend"] = args.raster_backend
        kw["warp_table"] = args.warp_table  # ADVICE r4: was silently ignored
        kw["config"] = args.config
        if args.res is None and not args.quick:
            kw["res"] = None  # keep the named config's own resolution
            # (--quick keeps its res=64 preset — resetting it here made
            # the CPU-safe smoke run the config's full 256²/384² warps)
        ips = run_bench_joint(**kw)
        tag = "" if args.config == "hg8_mpii_asr" else f", {args.config}"
        metric = (
            "images/sec/chip (joint adversarial minimax step"
            + (", fused device-only" if args.fused else "")
            + tag + ")"
        )
    elif args.serve:
        if args.batch is None and not args.quick:
            kw["batch"] = 64  # serving sweet spot; --quick keeps batch 4
        if args.pipeline:
            kw["pipeline"] = args.pipeline
        kw["warp_table"] = args.warp_table
        ips = run_bench_serve(**kw)
        metric = "images/sec/chip (serving: warp+forward+decode" + (
            f", pipelined depth={args.pipeline})" if args.pipeline else ")"
        )
    else:
        if args.trials:
            kw["trials"] = args.trials
        if args.scan_stacks:
            kw["scan_stacks"] = True
        kw["warp_table"] = args.warp_table
        kw["raster_backend"] = args.raster_backend
        try:
            ips = run_bench(**kw)
        except Exception as e:
            # Retry with a smaller batch ONLY on device-OOM class errors.
            # Anything else (notably backend-init UNAVAILABLE on a dead
            # tunnel) re-raises: retrying those hangs again and turned
            # round 3's outage into a silent driver timeout (rc=124).
            from posetpu.utils.probe import is_oom_error

            if not is_oom_error(e):
                raise
            sys.stderr.write(f"[bench] retry with smaller batch after: {e}\n")
            kw["batch"] = max(2, kw["batch"] // 2)
            ips = run_bench(**kw)
        metric = (
            f"images/sec/chip (aug+train) {kw.get('stacks', 8)}-stack hourglass"
        )

    print(
        json.dumps(
            {
                "metric": metric,
                "value": round(ips, 2),
                "unit": "images/sec/chip",
                "vs_baseline": round(ips / REF_GPU_IMG_PER_SEC, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
