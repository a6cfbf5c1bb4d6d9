"""Round-4 TPU measurement campaign in one command.

The axon tunnel has a history of multi-hour outages (BENCH_r03 rc=124;
docs/round3_notes.md), so when a healthy window appears every queued
measurement should run unattended, most-important-first, each stage
bounded by its own timeout and logged as one JSON line — a mid-campaign
wedge then costs only the remaining stages.

Stages (see VERDICT round 3 "Next round" items 1 and 3).  Every stage
that has a round-3 reference row pins --raster-backend xla: round-3 rows
predate the auto->Pallas axon fix, so like-for-like comparisons must hold
the rasterizer constant; raster-pallas is the one stage that varies it.
  1. headline        — validate the unified _fused_k_rates harness
                       reproduces ~313 img/s (refactor-drift check)
  2. raster-pallas   — Pallas vs XLA rasterizer A/B (only varied knob)
  3. warp-packed32   — bit-exact uint32-lane patch-table A/B
  4. batch-48/64     — the 64²-level batch-blocking MFU lever
  5. batch-64-scan   — same with nn.scan+remat (memory headroom)
  6. serve-pipe2     — pipelined serving re-measurement (no rasterizer)
  7. joint-fused     — config-3 monolith (compile ~10 min: run last)
  8. duty-k8         — production K-per-dispatch duty cycle

Usage: python tools/bench_matrix.py [--out FILE] [--stages a,b,...]
Results append to bench_matrix_results.jsonl (one JSON object per stage).
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

STAGES = [
    # (name, argv, timeout_s)
    # headline pins --raster-backend xla: the round-3 rows were measured
    # before the auto rule recognized the axon platform, i.e. WITH the XLA
    # rasterizer — the refactor-drift check must compare like with like
    ("headline", ["bench.py", "--raster-backend", "xla"], 1200),
    ("raster-pallas", ["bench.py", "--raster-backend", "pallas"], 1200),
    # rasterizer auto-rule sanity: a real training run exercises
    # auto->Pallas-on-axon end-to-end on hardware — the kernel's first
    # compiled-path run since round 1.  --raster-backend auto is explicit
    # since round 5: the config DEFAULT is xla until this stage plus the
    # raster-pallas A/B pass on the real chip (VERDICT r4 item 2)
    (
        "train-smoke-auto",
        [
            "posetpu/train/cli.py", "--config", "hg2_mpii_mini",
            "--synthetic", "--epochs", "1", "--steps-per-epoch", "3",
            "--num-devices", "1", "--raster-backend", "auto",
            "--probe-deadline", "240",
            "--checkpoint", "/tmp/posetpu_matrix_smoke",
        ],
        1200,
    ),
    ("warp-packed32", ["bench.py", "--warp-table", "packed32",
                       "--raster-backend", "xla"], 1200),
    # The remaining stages pin --warp-table u8: their reference rows
    # (headline 318.43, round-3 serving 125.3, round-3 joint 225.3) were
    # all measured with the u8 table, and round 5 flipped the DEFAULT to
    # packed32 mid-campaign (the measured +3.7% win) — like-for-like A/Bs
    # must hold the table layout constant.  headline-default at the end
    # measures the new production defaults (packed32 + xla) as the
    # BENCH_r05 sanity row.
    ("batch-48", ["bench.py", "--batch", "48", "--warp-table", "u8",
                  "--raster-backend", "xla"], 1200),
    ("batch-64", ["bench.py", "--batch", "64", "--warp-table", "u8",
                  "--raster-backend", "xla"], 1500),
    ("batch-64-scan", ["bench.py", "--batch", "64", "--scan-stacks",
                       "--warp-table", "u8",
                       "--raster-backend", "xla"], 1500),
    ("serve-pipe2", ["bench.py", "--serve", "--pipeline", "2",
                     "--warp-table", "u8"], 1200),
    # headline-default (the BENCH_r05 production-defaults sanity row) runs
    # BEFORE the long joint stage: the 2026-08-19 tunnel flaps every
    # ~15-30 min, and joint-fused's ~10-min compile is the most
    # wedge-exposed stage — it must not block the short ones in every
    # healthy window.
    ("headline-default", ["bench.py"], 1200),
    (
        "duty-k8",
        ["tools/duty_cycle.py", "--k-per-dispatch", "8", "--steps", "32"],
        2400,
    ),
    # batch 16 = the round-3 flagship joint row's batch (BASELINE.md
    # config-3 row: 225.3 img/s/chip at batch 16)
    ("joint-fused", ["bench.py", "--joint", "--fused", "--batch", "16",
                     "--warp-table", "u8",
                     "--raster-backend", "xla"], 2400),
    # Bonus (round 5): the flagship joint row under the NEW production
    # defaults (packed32 warp table) — shows whether the measured +3.7%
    # single-path win carries into the fused minimax monolith.  Last so a
    # flap during its ~10-min compile costs no other stage.
    ("joint-fused-p32", ["bench.py", "--joint", "--fused", "--batch", "16",
                         "--warp-table", "packed32",
                         "--raster-backend", "xla"], 2400),
    # Round-5 K-amortization A/B (production defaults, only --steps
    # varied): each timed fused-K dispatch still pays one ~70-100 ms host
    # relay; at the default K=10 that is ~8% of the measured rate
    # (337 measured vs ~363 implied pure-device).  Raising K is exactly
    # what the production loop's steps_per_dispatch does, so a K=32/64
    # win is a legitimate default flip for bench.py, not a methodology
    # change (same scan, same final value-fetch sync).
    ("headline-k32", ["bench.py", "--steps", "32"], 1500),
    ("headline-k64", ["bench.py", "--steps", "64"], 1800),
    # Plain-defaults confirmation AFTER the K=10->32 default flip: this is
    # byte-for-byte the invocation the driver records as BENCH_r05, so it
    # must reproduce the headline-k32 row (~349) on the new defaults.
    ("headline-default-k32", ["bench.py"], 1500),
    # Op-level xplane profile under the round-5 production defaults
    # (packed32 warp table): refreshes the round-3 roofline decomposition
    # whose warp-table rows were measured on the u8 path.  The profiler
    # needs the pure-python protobuf impl on this machine, and a value
    # fetch inside an active trace can hang for minutes (BASELINE.md
    # profiling gotcha) — profile_step keeps the traced section fetch-free.
    # Lowest priority: runs last, ~10 min wall.
    ("profile-p32", ["tools/profile_step.py",
                     "--out", "docs/profile_p32.txt"], 2400),
]


def run_stage(name, argv, timeout):
    t0 = time.time()
    rec = {"stage": name, "argv": argv, "started_unix": round(t0, 1)}
    try:
        r = subprocess.run(
            [sys.executable] + argv,
            capture_output=True,
            text=True,
            timeout=timeout,
            cwd=REPO,
        )
        rec["rc"] = r.returncode
        rec["wall_s"] = round(time.time() - t0, 1)
        out_lines = [ln for ln in r.stdout.strip().splitlines() if ln]
        rec["stdout_tail"] = out_lines[-3:]
        rec["stderr_tail"] = (r.stderr or "").strip().splitlines()[-3:]
        for ln in reversed(out_lines):  # bench prints ONE json OBJECT line
            try:
                obj = json.loads(ln)
            except ValueError:
                continue
            if isinstance(obj, dict):  # bare scalars are not results
                rec["result"] = obj
                break
    except subprocess.TimeoutExpired:
        rec["rc"] = None
        rec["wall_s"] = round(time.time() - t0, 1)
        rec["error"] = f"stage timeout after {timeout}s"
    except Exception as e:  # a broken stage must not lose the rest
        rec["rc"] = None
        rec["wall_s"] = round(time.time() - t0, 1)
        rec["error"] = f"{type(e).__name__}: {e}"
    return rec


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--out", default=os.path.join(REPO, "bench_matrix_results.jsonl")
    )
    ap.add_argument(
        "--stages", default=None,
        help="comma-separated subset of stage names (default: all)",
    )
    args = ap.parse_args()

    want = set(args.stages.split(",")) if args.stages else None
    todo = [s for s in STAGES if want is None or s[0] in want]
    if want:
        missing = want - {s[0] for s in todo}
        if missing:
            sys.exit(f"unknown stages: {sorted(missing)}")

    for name, argv, timeout in todo:
        print(f"[matrix] {name}: {' '.join(argv)} (timeout {timeout}s)",
              flush=True)
        rec = run_stage(name, argv, timeout)
        with open(args.out, "a") as f:
            f.write(json.dumps(rec) + "\n")
        res = rec.get("result", {})
        print(f"[matrix] {name}: rc={rec.get('rc')} wall={rec.get('wall_s')}s "
              f"value={res.get('value')}", flush=True)
        # a dead tunnel fails every later stage the same way — stop early.
        # Three distinct dead-tunnel signatures (ADVICE r4: the structured
        # line alone missed two of them):
        #   1. the structured tpu_unavailable JSON (bench fail-fast)
        #   2. a stage TIMEOUT — the wedge beat every in-stage watchdog
        #   3. rc=2 with the probe's plain-text diagnostic (train CLI path)
        dead = isinstance(res, dict) and res.get("error") == "tpu_unavailable"
        if "stage timeout" in str(rec.get("error", "")):
            dead = True
        if rec.get("rc") == 2:
            tail = " ".join(rec.get("stdout_tail", [])
                            + rec.get("stderr_tail", []))
            if "device unreachable" in tail:
                dead = True
        if dead:
            print("[matrix] backend unavailable — aborting remaining stages",
                  flush=True)
            sys.exit(3)


if __name__ == "__main__":
    main()
