"""Experiment driver (SURVEY.md §2 C8, §3.1): builds data/model/optimizer
from an ExperimentConfig, runs per-epoch train/validate with running meters,
logs the reference's txt columns, checkpoints (best-on-val-improvement), and
exports validation predictions — the L5/L7 layers of the reference rebuilt
around the fused device steps.
"""

from __future__ import annotations

import dataclasses
import os
import tempfile
import time

import jax
import jax.numpy as jnp
import numpy as np

from posetpu.ckpt import CheckpointManager
from posetpu.configs import ExperimentConfig
from posetpu.data import (
    HostLoader,
    LspDataset,
    MpiiDataset,
    make_synthetic_dataset,
    pad_batch,
)
from posetpu.eval import save_preds
from posetpu.models import (
    AugAgent,
    hg,
    occlusion_hierarchy,
    part_level_sizes,
    rotation_bin_table,
    scale_bin_table,
)
from posetpu.parallel import (
    make_batch_placer,
    make_mesh,
    shard_eval_step,
    shard_train_step,
)
from posetpu.train.adversarial import (
    JointState,
    make_joint_step,
    make_joint_step_split,
)
from posetpu.parallel.dp import shard_fused_train_step
from posetpu.train.state import TrainState, make_optimizer
from posetpu.train.step import fuse_steps, make_eval_step, make_train_step
from posetpu.utils.logger import AverageMeter, Logger


def build_dataset(cfg: ExperimentConfig, split="train"):
    if cfg.synthetic and not cfg.annotations:
        # key the cached split by its generation seed — a seed sweep must
        # not silently reuse another seed's images
        root = os.path.join(
            tempfile.gettempdir(),
            f"posetpu_synth_{cfg.aug.dataset}_s{cfg.seed}",
        )
        json_path = os.path.join(root, "annotations.json")
        if not os.path.exists(json_path):
            make_synthetic_dataset(
                root,
                num_train=64,
                num_val=16,
                dataset=cfg.aug.dataset,
                seed=cfg.seed,
            )
        cfg.annotations = json_path
        cfg.images_dir = os.path.join(root, "images")
    cls = LspDataset if cfg.aug.dataset == "lsp" else MpiiDataset
    return cls(cfg.annotations, cfg.images_dir, split=split)


class Experiment:
    """Holds everything needed to run/resume one config."""

    def __init__(self, cfg: ExperimentConfig, eval_only=False):
        """``eval_only``: construct for offline evaluation/visualization —
        never mutate the run directory's artifacts (log.txt opens in
        resume mode, config.json is not rewritten)."""
        self.cfg = cfg
        self.eval_only = eval_only
        self.train_ds = build_dataset(cfg, "train")
        self.val_ds = build_dataset(cfg, "valid")
        self.mean, self.std = self.train_ds.mean_std()
        self.std = None  # reference normalizes by mean subtraction only

        self._check_pad_hw()
        avail = jax.local_device_count()
        n_dev = cfg.num_devices or avail
        if n_dev > avail:
            # failing fast beats silently running a DP config single-chip
            # (wrong experiment, probable OOM); override with
            # --num-devices to run a smaller slice deliberately
            raise RuntimeError(
                f"config requests num_devices={n_dev} but only {avail} "
                f"device(s) are visible — pass --num-devices {avail} to "
                "run on this host deliberately"
            )
        self.dp = n_dev > 1
        self.axis = "data" if self.dp else None
        self.mesh = make_mesh(n_dev) if self.dp else None
        if cfg.batch_size % n_dev:
            raise ValueError(
                f"batch {cfg.batch_size} not divisible by {n_dev} devices"
            )

        mdl_kw = dict(
            num_stacks=cfg.model.stacks,
            num_blocks=cfg.model.blocks,
            num_classes=cfg.model.classes,
            num_feats=cfg.model.feats,
            depth=cfg.model.depth,
            remat=cfg.model.remat or cfg.model.scan_stacks,
            scan_stacks=cfg.model.scan_stacks,
            dtype=jnp.bfloat16 if cfg.model.bf16 else jnp.float32,
            axis_name=self.axis,
        )
        self.model = hg(**mdl_kw)

        if cfg.loader_backend == "grain":
            from posetpu.data.grain_pipeline import GrainLoader

            loader_cls = GrainLoader
            loader_kw = dict(num_workers=cfg.loader_workers)
        elif cfg.loader_backend == "host":
            loader_cls = HostLoader
            loader_kw = {}
        else:
            raise ValueError(
                f"unknown loader_backend {cfg.loader_backend!r} "
                "(expected 'host' or 'grain')"
            )
        self.K = max(1, cfg.steps_per_dispatch)
        if cfg.agent.fused_step not in ("split", "fused"):
            raise ValueError(
                f"agent.fused_step must be 'split' or 'fused', got "
                f"{cfg.agent.fused_step!r}"
            )
        self.joint_fused = self.dp or cfg.agent.fused_step == "fused"
        if self.K > 1 and cfg.agent.enabled and not self.joint_fused:
            # the split (multi-dispatch) joint variant cannot ride inside
            # one lax.scan program
            raise ValueError(
                "steps_per_dispatch > 1 requires a scannable train step; "
                "the single-chip joint (agent) path defaults to the "
                "split-program variant (make_joint_step_split) — set "
                "agent.fused_step='fused' (--agent-step fused; ~10 min "
                "compile), run under DP, or keep steps_per_dispatch=1"
            )
        self.loader = loader_cls(
            self.train_ds,
            cfg.batch_size,
            pad_hw=tuple(cfg.pad_hw),
            seed=cfg.seed,
            # async H2D in the producer: train batches land on device
            # (pre-sharded under DP) while the previous step runs.
            # group=K stacks K batches per dispatch for the fused step.
            place=make_batch_placer(self.mesh, stacked=self.K > 1),
            group=self.K,
            **loader_kw,
        )
        self.val_loader = loader_cls(
            self.val_ds,
            cfg.batch_size,
            pad_hw=tuple(cfg.pad_hw),
            shuffle=False,
            drop_last=False,
            # val batches stay host-side: pad_batch masks the ragged final
            # batch in numpy before the (sharded) eval dispatch
            **loader_kw,
        )
        self.steps_per_epoch = cfg.steps_per_epoch or len(self.loader)
        self.tx = make_optimizer(cfg.optim, self.steps_per_epoch)

        key = jax.random.PRNGKey(cfg.seed)
        x = jnp.zeros((1, *cfg.aug.inp_res, 3))
        variables = self.model.init(key, x, train=True)
        pose_state = TrainState(
            params=variables["params"],
            batch_stats=variables["batch_stats"],
            opt_state=self.tx.init(variables["params"]),
            step=jnp.zeros((), jnp.int32),
        )

        if cfg.agent.enabled:
            self.scale_table = scale_bin_table(cfg.agent.scale_bins)
            self.rot_table = rotation_bin_table(
                cfg.agent.rot_bins, -cfg.aug.rot_factor, cfg.aug.rot_factor
            )
            if cfg.agent.occ_nodes and cfg.agent.occ_mode == "parts":
                # body-part AHO: boxes derive per sample from keypoints
                # inside the step — no static grid table
                self.occ_boxes = None
                occ_nodes = 1 + sum(part_level_sizes(cfg.aug.dataset))
            else:
                self.occ_boxes = (
                    occlusion_hierarchy(
                        tuple(cfg.aug.inp_res), tuple(cfg.agent.occ_levels)
                    )
                    if cfg.agent.occ_nodes
                    else None
                )
                occ_nodes = (
                    len(self.occ_boxes) if self.occ_boxes is not None else 0
                )
            if cfg.agent.occ_nodes and cfg.agent.occ_nodes != occ_nodes:
                # occ_nodes gates AHO on/off but the COUNT is derived from
                # the hierarchy — reject silently-ignored mismatches
                src = (
                    f"PART_GROUPS[{cfg.aug.dataset!r}]"
                    if cfg.agent.occ_mode == "parts"
                    else f"occ_levels={tuple(cfg.agent.occ_levels)}"
                )
                raise ValueError(
                    f"agent.occ_nodes={cfg.agent.occ_nodes} does not match "
                    f"the {cfg.agent.occ_mode!r} hierarchy: {src} defines "
                    f"{occ_nodes} nodes"
                )
            self.agent_model = AugAgent(
                num_scale_bins=cfg.agent.scale_bins,
                num_rot_bins=cfg.agent.rot_bins,
                num_occ_nodes=occ_nodes,
                occ_mode=cfg.agent.occ_mode,
                occ_levels=tuple(cfg.agent.occ_levels),
                occ_dataset=cfg.aug.dataset,
                input_downscale=cfg.agent.input_downscale,
                axis_name=self.axis,
            )
            avars = self.agent_model.init(
                jax.random.PRNGKey(cfg.seed + 1), x, train=True
            )
            # the agent follows the experiment's optimizer settings
            # (schedule/gamma/rms) with only the lr swapped — building a
            # default OptimConfig here silently gave the agent the default
            # (60, 90) schedule regardless of --schedule
            self.agent_tx = make_optimizer(
                dataclasses.replace(cfg.optim, lr=cfg.agent.lr),
                self.steps_per_epoch,
            )
            agent_state = TrainState(
                params=avars["params"],
                batch_stats=avars["batch_stats"],
                opt_state=self.agent_tx.init(avars["params"]),
                step=jnp.zeros((), jnp.int32),
            )
            self.state = JointState(
                pose=pose_state, agent=agent_state, step=jnp.zeros((), jnp.int32)
            )
            joint_kw = dict(
                scale_table=self.scale_table,
                rot_table=self.rot_table,
                occ_boxes=self.occ_boxes,
                occ_mode=cfg.agent.occ_mode,
                occ_levels=tuple(cfg.agent.occ_levels),
                baseline=cfg.agent.reward_baseline,
                update_every=cfg.agent.update_every,
                pose_ref_weight=cfg.agent.pose_ref_weight,
            )
            if self.joint_fused:
                # DP always; single-chip when agent.fused_step="fused"
                # (slow one-time compile, faster steps + scannable — see
                # AgentConfig.fused_step)
                raw_step = make_joint_step(
                    self.model,
                    self.agent_model,
                    self.tx,
                    self.agent_tx,
                    cfg.aug,
                    self.mean,
                    self.std,
                    axis_name=self.axis,
                    **joint_kw,
                )
            else:
                # single-chip default: the split variant — the monolithic
                # 8-stack joint program costs ~10 min of XLA compile
                # (BASELINE.md round-3 re-adjudication) vs ~2 min here
                raw_step = make_joint_step_split(
                    self.model,
                    self.agent_model,
                    self.tx,
                    self.agent_tx,
                    cfg.aug,
                    self.mean,
                    self.std,
                    **joint_kw,
                )
        else:
            self.state = pose_state
            raw_step = make_train_step(
                self.model, self.tx, cfg.aug, self.mean, self.std, axis_name=self.axis
            )

        raw_eval = make_eval_step(
            self._pose_model_for_eval(),
            cfg.aug,
            self.mean,
            self.std,
            axis_name=self.axis,
        )
        if self.dp:
            if self.K > 1:
                self.train_step = shard_fused_train_step(
                    fuse_steps(raw_step), self.mesh
                )
            else:
                self.train_step = shard_train_step(raw_step, self.mesh)
            self.eval_step = shard_eval_step(self._eval_on_pose(raw_eval), self.mesh)
        elif cfg.agent.enabled and not self.joint_fused:
            # split joint step is internally jitted stage-by-stage; an outer
            # jit would re-fuse it into the slow-compiling monolith
            self.train_step = raw_step
            self.eval_step = jax.jit(self._eval_on_pose(raw_eval))
        else:
            if self.K > 1:
                self.train_step = jax.jit(
                    fuse_steps(raw_step), donate_argnums=(0,)
                )
            else:
                self.train_step = jax.jit(raw_step, donate_argnums=(0,))
            self.eval_step = jax.jit(self._eval_on_pose(raw_eval))

        self.ckpt = CheckpointManager(
            os.path.join(cfg.checkpoint_dir, cfg.name)
        )
        self.logger = Logger(
            os.path.join(cfg.checkpoint_dir, cfg.name, "log.txt"),
            resume=bool(cfg.resume) or eval_only,
        )
        self.logger.set_names(Logger.DEFAULT_NAMES)
        if not eval_only:
            # reproducibility: the exact resolved config next to the log
            self._dump_config()
        self.tb = None
        if cfg.tensorboard:  # structured metrics (SURVEY.md §1 L7 mapping)
            from clu import metric_writers

            self.tb = metric_writers.create_default_writer(
                os.path.join(cfg.checkpoint_dir, cfg.name, "tb")
            )
        self.start_epoch = 0
        self.best_acc = 0.0
        if cfg.init_pose_from:
            self._init_pose_from(cfg.init_pose_from)
        if cfg.resume:
            self._resume(cfg.resume)

    def _worst_case_box(self):
        """Side of the largest person's worst-case crop-source footprint:
        200*scale box x max aug scale-up (sample_aug_params clips exp mode
        at 2^(2*scale_factor)) x the rotation bounding-box expansion
        (|cos|+|sin| over the clipped rotation range, <= sqrt(2)).  One
        pass over annotation scales (no decode), once at init.  Returns
        0.0 when the scan is impossible (no metadata)."""
        import math

        cfg = self.cfg
        try:
            max_scale = max(
                (self.train_ds.meta(i)[1] for i in range(len(self.train_ds))),
                default=0.0,
            )
        except Exception:
            return 0.0
        aug_up = (
            2.0 ** (2 * cfg.aug.scale_factor)
            if cfg.aug.scale_mode == "exp"
            else 1.0 + cfg.aug.scale_factor
        )
        rot_max = 2.0 * cfg.aug.rot_factor if cfg.aug.rot_prob > 0 else 0.0
        theta = math.radians(min(abs(rot_max), 45.0))
        rot_expand = math.cos(theta) + math.sin(theta)
        return 200.0 * max_scale * aug_up * rot_expand

    def _check_pad_hw(self):
        """Resolve/validate the pre-pad host window.  cfg.pad_hw=None
        auto-sizes it so the largest person's worst-case crop footprint
        (:meth:`_worst_case_box`) fits, rounded up to a 64-multiple (the
        resolved value lands in config.json via _dump_config).  An explicit
        pad_hw is kept but warned about when too small: such crops read
        zero padding where the reference's host crop reads real pixels
        (see data.loader.load_sample)."""
        import warnings

        cfg = self.cfg
        box = self._worst_case_box()
        if cfg.pad_hw is None:
            # Per-axis cap at the dataset's largest real image: the device
            # warp masks reads beyond valid_wh to zero, so an image that
            # fits the canvas whole is NEVER cropped (lossless) and extra
            # canvas beyond it is pure H2D waste (the tunnel-bandwidth
            # bound in BASELINE.md makes bytes the scarce resource here).
            try:
                max_h, max_w = self.train_ds.max_image_hw()
            except Exception:
                max_h = max_w = 1 << 30
            side = int(box) if box else 512
            rnd = lambda v: max(256, -(-int(v) // 64) * 64)
            cfg.pad_hw = (rnd(min(side, max_h)), rnd(min(side, max_w)))
            return
        if box > min(cfg.pad_hw):
            warnings.warn(
                f"largest person's worst-case crop footprint (~{box:.0f}px, "
                f"incl. aug scale-up and rotation expansion) exceeds "
                f"pad_hw={tuple(cfg.pad_hw)}; such crops read zero padding "
                f"where the reference reads image pixels — raise pad_hw "
                f"(static shape: one recompile) or leave pad_hw=None to "
                f"auto-size it from the dataset",
                stacklevel=2,
            )

    def _dump_config(self):
        import dataclasses
        import json

        path = os.path.join(
            self.cfg.checkpoint_dir, self.cfg.name, "config.json"
        )
        with open(path, "w") as f:
            json.dump(dataclasses.asdict(self.cfg), f, indent=2, default=str)

    def _pose_model_for_eval(self):
        return self.model

    def _eval_on_pose(self, raw_eval):
        """Adapt eval (which wants a pose TrainState) to joint state."""
        if not self.cfg.agent.enabled:
            return raw_eval

        def ev(state, batch):
            return raw_eval(state.pose, batch)

        return ev

    def _replicate(self, tree):
        """Restored arrays come back pinned to one device; under DP they
        must be replicated over the mesh for shard_map."""
        if self.dp:
            from jax.sharding import NamedSharding, PartitionSpec

            return jax.device_put(
                tree, NamedSharding(self.mesh, PartitionSpec())
            )
        return tree

    def _init_pose_from(self, path):
        """Phase-2 flow (SURVEY.md §3.2): load a phase-1 baseline pose
        checkpoint into the pose half of the (joint or plain) state; the
        optimizer restarts fresh (the reference loads state_dict only)."""
        from posetpu.train.adversarial import JointState

        if isinstance(self.state, JointState):
            template = self.state.pose
        else:
            template = self.state
        src = CheckpointManager(path)
        best = src.best_path
        from_path = best if os.path.isdir(best) else src.latest_path()
        loaded, _, _ = src.restore(template, from_path)
        pose = template.replace(
            params=loaded.params, batch_stats=loaded.batch_stats
        )
        if isinstance(self.state, JointState):
            self.state = self._replicate(self.state.replace(pose=pose))
        else:
            self.state = self._replicate(pose)

    def _resume(self, path):
        path = None if path == "auto" else path
        self.state, last_epoch, self.best_acc = self.ckpt.restore(
            self.state, path
        )
        self.state = self._replicate(self.state)
        # checkpoints record the last COMPLETED epoch; resume at the next one
        # (reference resume semantics, SURVEY.md §3.4)
        self.start_epoch = last_epoch + 1

    # ---- epoch loops ----

    def train_epoch(self, epoch, key):
        # Metrics stay on device until the epoch ends: a float() per step
        # would force a host sync and break the dispatch pipeline (the
        # >=95% duty-cycle target depends on steps being enqueued ahead).
        device_metrics = []
        t0 = time.time()
        seen = 0
        steps_done = 0
        for batch in self.loader:
            if self.K > 1:
                # superbatch (k, B, ...): one dispatch = k fused steps;
                # trim the last group when it would cross the epoch cap
                # (a one-time extra compile for the trimmed length)
                k = batch["image"].shape[0]
                if steps_done + k > self.steps_per_epoch:
                    k = self.steps_per_epoch - steps_done
                    batch = jax.tree.map(lambda x: x[:k], batch)
                self.state, key, metrics = self.train_step(
                    self.state, batch, key
                )
                seen += k * batch["image"].shape[1]
            else:
                key, sub = jax.random.split(key)
                self.state, metrics = self.train_step(self.state, batch, sub)
                seen += batch["image"].shape[0]
                k = 1
            device_metrics.append(metrics)
            steps_done += k
            if steps_done >= self.steps_per_epoch:
                break
        if device_metrics:
            # real sync before taking dt: on the tunneled TPU
            # block_until_ready returns EARLY (the round-1 ~13x timing
            # inflation, BASELINE.md) — only a device->host VALUE fetch
            # is an honest end-of-epoch barrier.  The last step's metrics
            # depend on the whole state chain, so one scalar suffices.
            np.asarray(next(iter(device_metrics[-1].values())))
        dt = time.time() - t0
        meters = {}
        for metrics in device_metrics:
            for k_, v in metrics.items():
                m = meters.setdefault(k_, AverageMeter())
                for x in np.atleast_1d(np.asarray(v)):  # (k,) when fused
                    m.update(float(x))
        out = {k_: m.avg for k_, m in meters.items()}
        out["images_per_sec"] = seen / dt if dt > 0 else 0.0
        return out, key

    def validate(self, epoch):
        meters = {}
        all_preds = []
        hit_sum = cnt_sum = None
        for batch in self.val_loader:
            # Every batch is padded to ONE static (mesh-divisible) shape:
            # the ragged final batch runs under DP (SURVEY.md §3.3) and the
            # eval program compiles exactly once.  Metrics are exact — the
            # eval step masks padded rows out of its global reductions.
            n = batch["image"].shape[0]
            batch = pad_batch(batch, self.cfg.batch_size)
            metrics, preds = self.eval_step(self.state, batch)
            # PCK is a ratio of GLOBAL per-joint counts over the split —
            # averaging per-batch ratios diverges when per-joint valid
            # counts vary across batches (same rule as the DP reduction)
            hit = np.asarray(metrics["pck_hit"], np.float64)
            cnt = np.asarray(metrics["pck_cnt"], np.float64)
            hit_sum = hit if hit_sum is None else hit_sum + hit
            cnt_sum = cnt if cnt_sum is None else cnt_sum + cnt
            for k, v in metrics.items():
                if k in ("pck_hit", "pck_cnt"):
                    continue
                meters.setdefault(k, AverageMeter()).update(float(v), n=n)
            all_preds.append(np.asarray(preds)[:n])
        out = {k: m.avg for k, m in meters.items()}
        if cnt_sum is not None:
            from posetpu.eval.decode import pck_from_counts

            out["acc"] = float(pck_from_counts(hit_sum, cnt_sum)[0])
        preds = np.concatenate(all_preds) if all_preds else np.zeros((0, 0, 2))
        return out, preds

    def current_lr(self, epoch):
        lr = self.cfg.optim.lr
        for e in self.cfg.optim.schedule:
            if epoch >= e:
                lr *= self.cfg.optim.gamma
        return lr

    def fit(self, progress=print):
        cfg = self.cfg
        key = jax.random.PRNGKey(cfg.seed + 1234)
        for epoch in range(self.start_epoch, cfg.optim.epochs):
            tr, key = self.train_epoch(epoch, key)
            if (epoch + 1) % cfg.eval_every == 0 or epoch == cfg.optim.epochs - 1:
                va, preds = self.validate(epoch)
            else:
                va, preds = {"loss": float("nan"), "acc": 0.0}, None
            is_best = va["acc"] > self.best_acc
            self.best_acc = max(self.best_acc, va["acc"])
            self.logger.append(
                [
                    epoch,
                    self.current_lr(epoch),
                    tr["loss"],
                    va["loss"],
                    tr["acc"],
                    va["acc"],
                ]
            )
            if self.tb is not None:
                scalars = {
                    "train/loss": tr["loss"],
                    "train/acc": tr["acc"],
                    "train/images_per_sec": tr["images_per_sec"],
                    "lr": self.current_lr(epoch),
                }
                for k in ("agent_loss", "advantage", "entropy"):
                    if k in tr:
                        scalars[f"train/{k}"] = tr[k]
                if preds is not None:  # a real validation ran this epoch
                    scalars["val/loss"] = va["loss"]
                    scalars["val/acc"] = va["acc"]
                self.tb.write_scalars(epoch, scalars)
            self.ckpt.save(self.state, epoch, self.best_acc, is_best=is_best)
            if is_best and preds is not None:
                save_preds(
                    preds,
                    os.path.join(cfg.checkpoint_dir, cfg.name, "preds.mat"),
                )
            progress(
                f"epoch {epoch}: train loss {tr['loss']:.5f} acc {tr['acc']:.3f} "
                f"| val loss {va['loss']:.5f} acc {va['acc']:.3f} "
                f"| {tr['images_per_sec']:.1f} img/s"
                + (f" | agent {tr.get('agent_loss', 0):+.4f}" if "agent_loss" in tr else "")
            )
        # the reference leaves curve plots next to log.txt (SURVEY.md C11)
        try:
            self.logger.plot()
        except Exception as e:  # plotting must never kill a finished run
            progress(f"[posetpu] log plot failed: {e}")
        if self.tb is not None:
            self.tb.flush()
        # saves are async — commit the final checkpoint before returning
        # (otherwise interpreter shutdown can strand the last epoch's write)
        self.ckpt.wait()
        return self.state, self.best_acc
