"""Fused train/eval steps (SURVEY.md §3.1 rebuilt as ONE jitted program).

The reference's per-batch path was: CPU workers augment + rasterize -> H2D
copy -> GPU fwd/bwd -> D2H for metrics.  Here a single XLA program does
device-side augmentation, all-stacks forward, summed-MSE loss
(`nn.MSELoss` over every stack's heatmaps), backward, RMSprop update, and
train-time PCK — no host round-trips; under data parallelism the same
function runs inside shard_map with `psum` gradient/metric reductions over
the ICI mesh axis (SURVEY.md §5.8).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

from posetpu.aug.pipeline import (
    augment_batch,
    neutral_params,
    per_sample_keys,
    sample_aug_params_ps,
)
from posetpu.eval.decode import accuracy, final_preds, pck_counts, pck_from_counts
from posetpu.train.state import TrainState


def _augment(batch, params, aug_cfg, mean, std, jitter_keys):
    return augment_batch(
        batch["image"],
        batch["valid_wh"],
        batch["center"],
        batch["scale"],
        batch["pts"],
        batch["vis"],
        params,
        inp_res=tuple(aug_cfg.inp_res),
        out_res=tuple(aug_cfg.out_res),
        sigma=aug_cfg.sigma,
        mean=mean,
        std=std,
        dataset=aug_cfg.dataset,
        jitter_keys=jitter_keys,
        # getattr: config dumps from before the knobs existed restore fine
        warp_table=getattr(aug_cfg, "warp_table", "u8"),
        raster_backend=getattr(aug_cfg, "raster_backend", "auto"),
    )


def stacked_mse(outputs, target_nhwc, weight=None):
    """Reference loss: MSE averaged over elements, summed over stacks
    (SURVEY.md §2 C8).  ``weight`` (B, K) optionally masks invisible
    joints (off by default — the reference regresses zeros there)."""
    loss = 0.0
    for o in outputs:
        err = (o.astype(jnp.float32) - target_nhwc) ** 2
        if weight is not None:
            err = err * weight[:, None, None, :]
        loss = loss + jnp.mean(err)
    return loss


def per_sample_stacked_mse(outputs, target_nhwc):
    """Reference loss per sample: MSE over elements summed over stacks,
    keeping the batch dim — for the adversarial reward signal and for
    masked (ragged-batch) validation."""
    loss = 0.0
    for o in outputs:
        err = (o.astype(jnp.float32) - target_nhwc) ** 2
        loss = loss + jnp.mean(err, axis=(1, 2, 3))
    return loss  # (B,)


def make_train_step(
    model, tx, aug_cfg, mean, std=None, axis_name=None, mask_loss=False
):
    """Build the jitted baseline train step (no agent; configs 1-2 of
    BASELINE.json:8-9).  With ``axis_name`` the returned function is meant
    to run inside shard_map over that mesh axis."""

    def train_step(state: TrainState, batch, key):
        # All randomness is keyed on (step, global sample index) — see
        # per_sample_keys: identical draws on 1 device and on any mesh.
        key = jax.random.fold_in(key, state.step)
        k_par, k_jit = jax.random.split(key)
        params_aug = sample_aug_params_ps(
            per_sample_keys(k_par, batch["index"]),
            scale_factor=aug_cfg.scale_factor,
            rot_factor=aug_cfg.rot_factor,
            rot_prob=aug_cfg.rot_prob,
            flip_prob=aug_cfg.flip_prob,
            scale_mode=aug_cfg.scale_mode,
        )
        aug = _augment(
            batch,
            params_aug,
            aug_cfg,
            mean,
            std,
            per_sample_keys(k_jit, batch["index"])
            if aug_cfg.color_jitter
            else None,
        )
        target = aug["target"].transpose(0, 2, 3, 1)  # NHWC

        def loss_fn(p):
            outs, mut = model.apply(
                {"params": p, "batch_stats": state.batch_stats},
                aug["input"],
                train=True,
                mutable=["batch_stats"],
            )
            loss = stacked_mse(
                outs, target, aug["target_weight"] if mask_loss else None
            )
            return loss, (mut["batch_stats"], outs[-1])

        (loss, (new_bs, last)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        if axis_name is not None:
            grads = jax.lax.pmean(grads, axis_name)
            loss = jax.lax.pmean(loss, axis_name)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        # global PCK = ratio of GLOBAL hit/total counts — pmean of
        # per-shard ratios diverges from the single-device value whenever
        # shards have different per-joint valid counts (the rule
        # pck_counts documents; make_eval_step already does this)
        hit, cnt = pck_counts(
            last.astype(jnp.float32).transpose(0, 3, 1, 2), aug["target"]
        )
        if axis_name is not None:
            hit = jax.lax.psum(hit, axis_name)
            cnt = jax.lax.psum(cnt, axis_name)
        acc = pck_from_counts(hit, cnt)[0]
        new_state = TrainState(
            params=new_params,
            batch_stats=new_bs,
            opt_state=new_opt,
            step=state.step + 1,
        )
        return new_state, {"loss": loss, "acc": acc}

    return train_step


def fuse_steps(step):
    """Wrap a ``(state, batch, key) -> (state, metrics)`` step into a
    K-steps-per-dispatch program: ``(state, superbatch, key) -> (state,
    key, metrics)`` where every ``superbatch`` leaf carries a leading
    group dim K (K stacked loader batches, see ``HostLoader(group=K)``)
    and each metrics value comes back as a (K,) array.

    One dispatch then performs K real optimizer updates via ``lax.scan``
    — the mechanism that amortizes the per-dispatch host relay cost over
    K device steps (BASELINE.md duty-cycle section; SURVEY.md §7
    hard-part 4).  The PRNG chain inside the scan is the same
    ``key, sub = jax.random.split(key)`` the sequential epoch loop uses,
    so K fused steps are bit-identical to K sequential steps on the same
    batches (tested: tests/test_train_step.py::TestFusedDispatch).
    """

    def fused(state, superbatch, key):
        def body(carry, b):
            st, k = carry
            k, sub = jax.random.split(k)
            st, m = step(st, b, sub)
            return (st, k), m

        (state, key), metrics = jax.lax.scan(body, (state, key), superbatch)
        return state, key, metrics

    return fused


def make_eval_step(model, aug_cfg, mean, std=None, axis_name=None):
    """Validation step (SURVEY.md §3.3): neutral crop, forward, train-time
    PCK + full decode back to source coords for offline PCKh / preds.mat.

    Mask-aware: a batch may carry ``mask`` (B,) marking padded rows (ragged
    final val batch padded to a static, mesh-divisible shape — see
    ``posetpu.data.loader.pad_batch``).  Metrics reduce with psum'd GLOBAL
    sums/counts so padded rows contribute exactly nothing and the DP result
    equals the single-device result on the unpadded samples."""

    def eval_step(state: TrainState, batch):
        B = batch["image"].shape[0]
        aug = _augment(batch, neutral_params(B), aug_cfg, mean, std, None)
        outs = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            aug["input"],
            train=False,
        )
        scores = outs[-1].astype(jnp.float32).transpose(0, 3, 1, 2)
        mask = batch.get("mask")
        if mask is None:
            mask = jnp.ones((B,), jnp.float32)
        hit, cnt = pck_counts(scores, aug["target"], sample_mask=mask)
        l_sample = per_sample_stacked_mse(
            outs, aug["target"].transpose(0, 2, 3, 1)
        )
        loss_sum = jnp.sum(l_sample * mask)
        n = jnp.sum(mask)
        if axis_name is not None:
            hit = jax.lax.psum(hit, axis_name)
            cnt = jax.lax.psum(cnt, axis_name)
            loss_sum = jax.lax.psum(loss_sum, axis_name)
            n = jax.lax.psum(n, axis_name)
        loss = loss_sum / jnp.maximum(n, 1.0)
        acc = pck_from_counts(hit, cnt)[0]
        metrics = {
            "loss": loss,
            "acc": acc,
            # per-joint global counts: the epoch driver sums these across
            # batches and ratios ONCE (mean of per-batch ratios is not the
            # split PCK when per-joint valid counts vary across batches)
            "pck_hit": hit,
            "pck_cnt": cnt,
        }
        preds = final_preds(
            scores, aug["center"], aug["scale"], tuple(aug_cfg.out_res)
        )
        # map back to the ORIGINAL image frame: the loader's pad_hw crop
        # window shifted center/pts by an integer offset (loader.py
        # load_sample); offline PCKh / preds.mat compare against the
        # unshifted annotations
        off = batch.get("offset")
        if off is not None:
            preds = preds + off[:, None, :].astype(preds.dtype)
        return metrics, preds

    return eval_step
