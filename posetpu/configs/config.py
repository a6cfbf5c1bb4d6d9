"""Experiment configuration dataclasses + the five named configs of
BASELINE.json:8-12 (SURVEY.md §2 C12, §5.6).

The reference used per-script argparse (CycleGAN-style `options/`); here a
typed config tree is the source of truth and argparse only overrides leaves,
keeping the reference's public flag names.
"""

from __future__ import annotations

import argparse
import copy
import dataclasses
from dataclasses import dataclass, field
from typing import Optional, Sequence, Tuple


@dataclass
class ModelConfig:
    stacks: int = 8  # reference --stacks
    blocks: int = 1  # reference --blocks
    classes: int = 16  # reference --num-classes
    feats: int = 128  # reference --features
    depth: int = 4
    remat: bool = False
    # compile the stack body once via nn.scan (2.7x faster compiles,
    # ~16% slower steps — BASELINE.md); pair with remat=True at batch 32
    # or the scanned backward's live per-stack carries OOM HBM
    scan_stacks: bool = False
    bf16: bool = True


@dataclass
class AugConfig:
    inp_res: Tuple[int, int] = (256, 256)
    out_res: Tuple[int, int] = (64, 64)
    sigma: float = 1.0  # reference --sigma
    scale_factor: float = 0.25  # reference --scale-factor
    rot_factor: float = 30.0  # reference --rot-factor
    rot_prob: float = 0.6
    flip_prob: float = 0.5
    scale_mode: str = "exp"
    color_jitter: bool = True
    dataset: str = "mpii"
    # warp patch-table layout: "u8" raw bytes | "packed32" one uint32 lane
    # per RGB pixel (bit-exact; see aug/warp.py).  Default "packed32"
    # since round 5: measured +3.7% on the real chip (330.14 vs 318.43
    # img/s/chip, bench_matrix warp-packed32 stage, 2026-08-18) and
    # bit-exact vs u8 by test, so the flip is pure speed.
    warp_table: str = "packed32"
    # target rasterizer: "xla" | "pallas" | "auto" (Pallas on tpu/axon,
    # else XLA).  The two are ulp-level parity-tested.  Adjudicated on
    # hardware 2026-08-18 (bench_matrix raster-pallas + train-smoke-auto):
    # the Pallas compiled path runs correctly on the real chip but
    # measures 1.4% SLOWER (313.95 vs 318.43 img/s/chip), so "xla" stays
    # the default on perf evidence; "pallas"/"auto" remain CLI-selectable.
    raster_backend: str = "xla"


@dataclass
class OptimConfig:
    lr: float = 2.5e-4  # reference --lr (RMSprop)
    epochs: int = 100  # reference --epochs
    schedule: Sequence[int] = (60, 90)  # reference --schedule (epoch lr drops)
    gamma: float = 0.1  # reference --gamma
    rms_decay: float = 0.99  # torch RMSprop alpha
    rms_eps: float = 1e-8
    momentum: float = 0.0
    weight_decay: float = 0.0


@dataclass
class AgentConfig:
    enabled: bool = False
    scale_bins: int = 7
    rot_bins: int = 7
    occ_nodes: int = 0  # >0 enables AHO head (1 + sum g^2 over levels;
    # in parts mode 1 + sum(part_level_sizes) = 9)
    occ_levels: Sequence[int] = (1, 2, 4)
    # "tree": sample level then cell, logp summed along the path (the
    # reference's hierarchical organization, SURVEY.md C13) over the
    # coarse->fine spatial grid; "parts": same tree sampling over the
    # body-part hierarchy (occluder boxes follow each sample's keypoints);
    # "flat": one categorical over all nodes.
    occ_mode: str = "tree"
    # Agent sees the crop avg-pooled by this factor.  2 is the default for a
    # measured reason: a full-res agent stem (tiny-channel conv at 256²)
    # makes XLA:TPU compile the joint program ~26x slower (BASELINE.md);
    # at 128² the joint step runs at baseline-step speed, and global
    # scale/rotation bins don't need pixel-level detail.
    input_downscale: int = 2
    lr: float = 2.5e-4
    reward_baseline: str = "batch_mean"  # REINFORCE baseline
    update_every: int = 1  # agent update cadence vs pose updates
    # Weight of the reference-augmentation crops in the POSE update
    # (0 = reference protocol: pose trains on adversarial crops only;
    # w>0 runs one grad pass over concat(adv, ref) with loss
    # (1-w)*mean(l_adv) + w*mean(l_ref), anchoring the training
    # distribution and BN running stats on the reference recipe —
    # see make_joint_step docstring)
    pose_ref_weight: float = 0.0
    # Single-chip joint-step program layout (DP always uses the fused
    # monolith under shard_map).  "split": four small jits — compiles in
    # ~2 min, steps pay ~4 dispatch round-trips (the production default:
    # friendly for tests/smoke runs).  "fused": ONE monolithic program —
    # ~10 min XLA compile (measured round 3, 615 s first call), then
    # 225 img/s device-only vs the split path's 182 host-inclusive, and
    # it can ride inside steps_per_dispatch's lax.scan.  Worth it for
    # real multi-hour trainings; the two are math-equivalent (tested).
    fused_step: str = "split"


@dataclass
class ExperimentConfig:
    name: str = "hg2_mpii_mini"
    model: ModelConfig = field(default_factory=ModelConfig)
    aug: AugConfig = field(default_factory=AugConfig)
    optim: OptimConfig = field(default_factory=OptimConfig)
    agent: AgentConfig = field(default_factory=AgentConfig)
    # data
    annotations: str = ""  # reference --json path
    images_dir: str = ""  # reference --image-path
    # Pre-pad host canvas (static shape the device warp reads from).
    # None = auto-size from the dataset's annotation scales at Experiment
    # init: the window is sized so the LARGEST person's worst-case crop
    # footprint (200*scale box x max aug scale-up x rotation bounding-box
    # expansion) fits, rounded up to a 64-multiple (one compile per value).
    # An explicit tuple is used as-is (with a warning when it is too small
    # — such crops read zero padding where the reference reads pixels).
    pad_hw: Optional[Tuple[int, int]] = None
    batch_size: int = 6  # reference batch 6/GPU (BASELINE.json:8)
    # "host": threaded HostLoader (+C++ decode pool); "grain": grain-backed
    # multi-process pipeline (multi-core TPU hosts) — same batch contract.
    loader_backend: str = "host"
    loader_workers: int = 0  # grain worker processes (0 = in-process)
    # run
    checkpoint_dir: str = "checkpoints"  # reference --checkpoint
    resume: str = ""  # reference --resume
    # phase-2 flow (SURVEY.md §3.2): initialize the pose net from a
    # phase-1 baseline checkpoint before joint adversarial training
    init_pose_from: str = ""
    seed: int = 0
    num_devices: Optional[int] = None  # None = all visible
    # K train steps fused into ONE device dispatch (lax.scan over K
    # loader batches stacked to (K, B, ...)): amortizes the per-dispatch
    # host relay cost so the production loop runs at the device rate even
    # on dispatch-slow hosts (BASELINE.md duty-cycle section).  Trade-off:
    # checkpoint/log granularity stays per-epoch, but a mid-epoch
    # interrupt loses up to K steps instead of 1.
    steps_per_dispatch: int = 1
    synthetic: bool = False  # build a synthetic mini-split on the fly
    steps_per_epoch: Optional[int] = None  # cap (smoke tests)
    eval_every: int = 1
    log_every: int = 10
    # structured metrics (SURVEY.md §1 L7 mapping "clu + structured
    # metrics"): write TensorBoard event files via clu.metric_writers
    # alongside the reference txt log.  Off by default (pulls in TF).
    tensorboard: bool = False


def _cfg(name, **kw) -> ExperimentConfig:
    c = ExperimentConfig(name=name)
    for k, v in kw.items():
        head, _, leaf = k.partition(".")
        if leaf:
            setattr(getattr(c, head), leaf, v)
        else:
            setattr(c, head, v)
    return c


# The five build configs of BASELINE.json:8-12.
NAMED_CONFIGS = {
    # 1: 2-stack hourglass, MPII mini-split, fixed random aug, batch 6
    "hg2_mpii_mini": _cfg(
        "hg2_mpii_mini",
        **{"model.stacks": 2, "batch_size": 6, "synthetic": True,
           "optim.epochs": 10, "optim.schedule": (6, 8)},
    ),
    # 2: 8-stack hourglass, MPII full, baseline random augmentation
    "hg8_mpii": _cfg(
        "hg8_mpii",
        **{"model.stacks": 8, "batch_size": 6},
    ),
    # 3: 8-stack + adversarial scale-agent joint training on MPII
    "hg8_mpii_asr": _cfg(
        "hg8_mpii_asr",
        **{"model.stacks": 8, "batch_size": 6, "agent.enabled": True},
    ),
    # 4: scale+rotation agent, LSP fine-tune with hierarchical aug sampling
    "hg8_lsp_aho": _cfg(
        "hg8_lsp_aho",
        **{"model.stacks": 8, "model.classes": 14, "batch_size": 6,
           "aug.dataset": "lsp", "agent.enabled": True, "agent.occ_nodes": 22},
    ),
    # 5: 384x384 inputs, 8-stack + agent, DP across v5e-8, on-device aug
    "hg8_mpii_384_dp8": _cfg(
        "hg8_mpii_384_dp8",
        **{"model.stacks": 8, "batch_size": 48, "agent.enabled": True,
           "aug.inp_res": (384, 384), "aug.out_res": (96, 96),
           "num_devices": 8},
    ),
}


def named_config(name) -> ExperimentConfig:
    if name not in NAMED_CONFIGS:
        raise KeyError(
            f"unknown config {name!r}; available: {sorted(NAMED_CONFIGS)}"
        )
    # deep copy: dataclasses.replace is SHALLOW — the nested model/aug/
    # optim/agent dataclasses would be shared with the registry, and any
    # caller mutation (bench.py and tests adjust inp_res/stacks freely)
    # would silently poison every later named_config() in the process
    return copy.deepcopy(NAMED_CONFIGS[name])


# ---- argparse overrides (reference flag names) ----

_FLAGS = {
    # flag -> (path, type)
    "--stacks": ("model.stacks", int),
    "--blocks": ("model.blocks", int),
    "--num-classes": ("model.classes", int),
    "--features": ("model.feats", int),
    "--sigma": ("aug.sigma", float),
    "--scale-factor": ("aug.scale_factor", float),
    "--rot-factor": ("aug.rot_factor", float),
    "--lr": ("optim.lr", float),
    "--epochs": ("optim.epochs", int),
    "--gamma": ("optim.gamma", float),
    "--train-batch": ("batch_size", int),
    "--checkpoint": ("checkpoint_dir", str),
    "--resume": ("resume", str),
    "--init-pose-from": ("init_pose_from", str),
    "--json": ("annotations", str),
    "--image-path": ("images_dir", str),
    "--seed": ("seed", int),
    "--steps-per-epoch": ("steps_per_epoch", int),
    "--num-devices": ("num_devices", int),
    "--occ-mode": ("agent.occ_mode", str),  # tree | parts | flat (C13)
    "--occ-nodes": ("agent.occ_nodes", int),
    "--agent-update-every": ("agent.update_every", int),
    "--pose-ref-weight": ("agent.pose_ref_weight", float),
    "--agent-step": ("agent.fused_step", str),  # split | fused
    "--loader-backend": ("loader_backend", str),
    "--loader-workers": ("loader_workers", int),
    "--steps-per-dispatch": ("steps_per_dispatch", int),
    # xla | pallas | auto — revertible from the CLI (ADVICE r4: a Mosaic
    # miscompile on the experimental axon platform must not require a
    # code edit to escape)
    "--raster-backend": ("aug.raster_backend", str),
    "--warp-table": ("aug.warp_table", str),  # u8 | packed32 (bit-exact A/B)
}


def add_overrides(parser: argparse.ArgumentParser):
    for flag, (_, typ) in _FLAGS.items():
        parser.add_argument(flag, type=typ, default=None)
    parser.add_argument("--schedule", type=int, nargs="*", default=None)
    parser.add_argument("--synthetic", action="store_true", default=None)
    parser.add_argument("--tensorboard", action="store_true", default=None)
    parser.add_argument(
        "--scan-stacks", action="store_true", default=None,
        help="compile the hourglass stack body once via nn.scan "
        "(2.7x faster compiles, ~16%% slower steps; implies remat)",
    )
    parser.add_argument("--no-color-jitter", action="store_true", default=None)
    return parser


def apply_overrides(cfg: ExperimentConfig, args) -> ExperimentConfig:
    for flag, (path, _) in _FLAGS.items():
        v = getattr(args, flag.lstrip("-").replace("-", "_"), None)
        if v is not None:
            head, _, leaf = path.partition(".")
            if leaf:
                setattr(getattr(cfg, head), leaf, v)
            else:
                setattr(cfg, head, v)
    if getattr(args, "schedule", None) is not None:
        cfg.optim.schedule = tuple(args.schedule)
    if getattr(args, "synthetic", None):
        cfg.synthetic = True
    if getattr(args, "tensorboard", None):
        cfg.tensorboard = True
    if getattr(args, "scan_stacks", None):
        cfg.model.scan_stacks = True
    if getattr(args, "no_color_jitter", None):
        cfg.aug.color_jitter = False
    return cfg
