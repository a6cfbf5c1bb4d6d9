"""Inference / serving API — the deployment surface of the framework.

The reference has no serving path (its `validate()` doubles as the only
inference flow, SURVEY.md §3.3); production use of the rebuilt framework
needs a first-class one: load a checkpoint (pose-only or joint), build ONE
jitted fixed-shape program (neutral crop warp -> hourglass forward ->
argmax decode with quarter-pixel offset -> inverse affine), and serve
batches with no host-side compute beyond JPEG decode.

The decode math is the reference's exactly (`eval/decode.py` oracle
parity), so predictions match `tools/evaluate.py` / the reference's
`final_preds` on the same heatmaps.

Usage:
    from posetpu.infer import PosePredictor
    p = PosePredictor.from_config(named_config("hg8_mpii"),
                                  checkpoint="checkpoints/hg8_mpii")
    out = p(images_u8, valid_wh, centers, scales)
    out["pred"]   # (B, K, 2) keypoints in source-image coords (1-indexed)
    out["conf"]   # (B, K) peak heatmap activation per joint
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from posetpu.aug.affine import make_transform
from posetpu.aug.color import color_normalize
from posetpu.aug.warp import affine_warp
from posetpu.eval.decode import final_preds, get_preds, quarter_offset
from posetpu.models import hg

# The reference normalizes by the dataset mean; MPII's is the de-facto
# default when serving without the training dataset on disk.
MPII_MEAN = (0.4404, 0.4440, 0.4327)


def load_checkpoint_params(path):
    """Raw-restore an orbax checkpoint written by
    :class:`posetpu.ckpt.CheckpointManager` and return the POSE net's
    ``(params, batch_stats, epoch, best_acc)`` — works for both pose-only
    (TrainState) and joint (JointState) layouts without needing a
    template state."""
    import orbax.checkpoint as ocp

    tree = ocp.StandardCheckpointer().restore(os.path.abspath(path))
    st = tree["state"]
    if "pose" in st:  # JointState: serve the estimator
        st = st["pose"]
    return (
        st["params"],
        st["batch_stats"],
        int(tree["epoch"]),
        float(tree["best_acc"]),
    )


class PosePredictor:
    """Jitted fixed-shape pose inference.

    One compiled program per (batch, pad_hw) shape (XLA static shapes;
    jit caches per shape).  Inputs follow the loader batch contract:
    uint8 images zero-padded to a common static shape + per-sample true
    (w, h), center, scale — so a serving frontend only decodes JPEGs.
    """

    def __init__(
        self,
        model,
        params,
        batch_stats,
        *,
        mean=MPII_MEAN,
        std=None,
        inp_res=(256, 256),
        out_res=(64, 64),
        warp_table="u8",
    ):
        """``mean``/``std`` MUST match what training normalized with —
        Experiment uses the training dataset's computed mean and std=None
        (the reference subtracts the mean only); MPII_MEAN is the right
        default for MPII-trained checkpoints, pass the dataset's own mean
        otherwise (``MpiiDataset.mean_std()[0]``)."""
        self.model = model
        self.params = params
        self.batch_stats = batch_stats
        self.mean = tuple(mean)
        self.std = std
        self.inp_res = tuple(inp_res)
        self.out_res = tuple(out_res)
        # warp patch-table layout knob (bit-exact "packed32" alternative,
        # see aug/warp.py) — serving shares the train path's A/B lever
        self.warp_table = warp_table
        # Weights enter as jit ARGUMENTS, not closure constants: closing
        # over them would bake the full pytree into every compiled
        # executable (one copy per input shape) and freeze updates to
        # self.params out of later calls.
        self._predict = jax.jit(self._forward)

    @classmethod
    def from_config(cls, cfg, checkpoint, *, best=True, mean=MPII_MEAN):
        """Build from an ExperimentConfig + checkpoint directory (uses
        ``<checkpoint>/best`` when ``best`` and it exists, else the latest
        FINISHED epoch under ``<checkpoint>/ckpt``) or a direct checkpoint
        path."""
        model = hg(
            num_stacks=cfg.model.stacks,
            num_blocks=cfg.model.blocks,
            num_classes=cfg.model.classes,
            num_feats=cfg.model.feats,
            depth=cfg.model.depth,
            dtype=jnp.bfloat16 if cfg.model.bf16 else jnp.float32,
            # scan-trained checkpoints stack params under one module —
            # the serving model must match the training layout
            scan_stacks=cfg.model.scan_stacks,
            remat=cfg.model.remat or cfg.model.scan_stacks,
        )
        path = checkpoint
        has_best = os.path.isdir(os.path.join(checkpoint, "best"))
        has_ckpt = os.path.isdir(os.path.join(checkpoint, "ckpt"))
        if has_best and (best or not has_ckpt):
            # best=False falls back to best/ when it is the ONLY loadable
            # layout present (e.g. a distributed dir with the epoch ckpts
            # pruned) rather than failing on the parent directory
            path = os.path.join(checkpoint, "best")
        elif has_ckpt:
            # the training-side manager owns the finished-checkpoint
            # policy (tmp-dir filter + latest pick) — reuse it rather than
            # re-implementing the selection here
            from posetpu.ckpt import CheckpointManager

            path = CheckpointManager(checkpoint).latest_path()
            if path is None:
                raise FileNotFoundError(f"no checkpoint under {checkpoint}")
        params, batch_stats, _, _ = load_checkpoint_params(path)
        return cls(
            model,
            params,
            batch_stats,
            mean=mean,
            inp_res=tuple(cfg.aug.inp_res),
            out_res=tuple(cfg.aug.out_res),
            warp_table=getattr(cfg.aug, "warp_table", "u8"),
        )

    def _forward(self, variables, images, valid_wh, center, scale):
        B = images.shape[0]
        t = make_transform(
            center, scale, self.inp_res, jnp.zeros((B,), jnp.float32)
        )
        crop = affine_warp(
            images, t, self.inp_res, valid_wh=valid_wh,
            table_format=self.warp_table,
        )
        crop = color_normalize(crop, self.mean, self.std)
        outs = self.model.apply(variables, crop, train=False)
        scores = outs[-1].astype(jnp.float32).transpose(0, 3, 1, 2)
        pred = final_preds(scores, center, scale, self.out_res)
        conf = jnp.max(scores.reshape(B, scores.shape[1], -1), axis=-1)
        # heatmap-space coords too (visualization / custom post-processing)
        hm = quarter_offset(get_preds(scores), scores)
        return {"pred": pred, "conf": conf, "heatmap_coords": hm}

    def __call__(self, images, valid_wh, center, scale):
        """images (B, Hp, Wp, 3) uint8 zero-padded; valid_wh (B, 2) int;
        center (B, 2); scale (B,).  Returns numpy arrays."""
        out = self._predict(
            {"params": self.params, "batch_stats": self.batch_stats},
            jnp.asarray(images),
            jnp.asarray(valid_wh, jnp.int32),
            jnp.asarray(center, jnp.float32),
            jnp.asarray(scale, jnp.float32),
        )
        return {k: np.asarray(v) for k, v in out.items()}

    def predict_iter(self, batches, depth=2):
        """Pipelined batch prediction: keep up to ``depth`` batches in
        flight before fetching the oldest result, so the host-side
        dispatch/fetch cost of batch N overlaps the device compute of
        batches N+1..N+depth (JAX dispatch is asynchronous; the
        device→host fetch in ``np.asarray`` is the only sync).  Same
        numerics as calling the predictor per batch — order preserved.

        ``batches`` yields ``(images, valid_wh, center, scale)`` tuples
        with the ``__call__`` contract (fixed shapes across batches keep
        one compiled program).  Yields the same result dicts as
        ``__call__``.  ``depth=0`` degenerates to sequential calls."""
        from collections import deque

        variables = {"params": self.params, "batch_stats": self.batch_stats}
        inflight = deque()

        def fetch(out):
            return {k: np.asarray(v) for k, v in out.items()}

        for images, valid_wh, center, scale in batches:
            inflight.append(
                self._predict(
                    variables,
                    jnp.asarray(images),
                    jnp.asarray(valid_wh, jnp.int32),
                    jnp.asarray(center, jnp.float32),
                    jnp.asarray(scale, jnp.float32),
                )
            )
            if len(inflight) > depth:
                yield fetch(inflight.popleft())
        while inflight:
            yield fetch(inflight.popleft())

    def predict_single(self, image, center, scale):
        """One undecoded-size image (H, W, 3) uint8 -> (K, 2) keypoints +
        (K,) confidences.  Pads to the image's own shape rounded up to a
        multiple of 64 (per-shape jit cache)."""
        image = np.asarray(image)
        H, W = image.shape[:2]
        Hp = -(-H // 64) * 64
        Wp = -(-W // 64) * 64
        padded = np.zeros((1, Hp, Wp, 3), image.dtype)
        padded[0, :H, :W] = image
        out = self(
            padded,
            np.array([[W, H]], np.int32),
            np.asarray([center], np.float32),
            np.asarray([scale], np.float32),
        )
        return out["pred"][0], out["conf"][0]
