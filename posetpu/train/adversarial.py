"""Joint adversarial augmentation training (SURVEY.md §2 C6/C7/C13, §3.2).

Reference flow per batch (host-bound): neutral crop from loader -> agent on
GPU -> sample bins -> *CPU* re-warp + re-rasterize -> pose fwd/bwd ->
REINFORCE reward from per-sample loss comparison -> alternate optimizer
steps.  The device<->host round trips per batch were THE bottleneck
(BASELINE.json:5).

Here the ENTIRE minimax step is one jitted, shard_map-able program:

  neutral crop (device warp)                    posetpu.aug
  -> agent forward (bf16 convs)                 posetpu.models.agent
  -> categorical bin sampling (jax PRNG)
  -> adversarial warp + rasterize (device)      posetpu.aug
  -> AHO occlusion masking (optional)
  -> pose fwd/bwd on the adversarial batch
  -> reference-aug forward (no grad) as the REINFORCE baseline
  -> reward = per-sample loss(sampled aug) - loss(reference aug)
  -> agent REINFORCE update + pose RMSprop update

Reward rule (C7): bins whose augmentation makes the pose network's loss
HIGHER than the reference augmentation get their probability increased
(policy-gradient ascent on estimator loss), pose net descends on its own
loss — the paper's minimax joint optimization.
"""

from __future__ import annotations

import flax.struct
import jax
import jax.numpy as jnp
import optax

from posetpu.aug.pipeline import (
    AugParams,
    augment_batch,
    neutral_params,
    sample_aug_params,
)
from posetpu.eval.decode import accuracy
from posetpu.models.agent import sample_bins
from posetpu.train.state import TrainState
from posetpu.train.step import _augment


@flax.struct.dataclass
class JointState:
    pose: TrainState
    agent: TrainState
    step: jnp.ndarray


def _tile2(x):
    return jnp.concatenate([x, x], axis=0)


def _augment_pair(batch, params_a, params_b, aug_cfg, mean, std, jitter_key):
    """Warp the adversarial and reference crops of one batch in a single
    fused pass (ONE gather over the source images via src_index — the
    separate-pass form tripled the warp's operand traffic).  Returns the
    combined aug dict with 2B leading entries: [:B]=a, [B:]=b."""
    B = batch["image"].shape[0]
    params = AugParams(
        scale_factor=jnp.concatenate([params_a.scale_factor, params_b.scale_factor]),
        rot=jnp.concatenate([params_a.rot, params_b.rot]),
        flip=jnp.concatenate([params_a.flip, params_b.flip]),
    )
    return augment_batch(
        batch["image"],
        _tile2(batch["valid_wh"]),
        _tile2(batch["center"]),
        _tile2(batch["scale"]),
        _tile2(batch["pts"]),
        _tile2(batch["vis"]),
        params,
        inp_res=tuple(aug_cfg.inp_res),
        out_res=tuple(aug_cfg.out_res),
        sigma=aug_cfg.sigma,
        mean=mean,
        std=std,
        dataset=aug_cfg.dataset,
        jitter_key=jitter_key,
        src_index=jnp.concatenate(
            [jnp.arange(B, dtype=jnp.int32)] * 2
        ),
    )


def per_sample_stacked_mse(outputs, target_nhwc):
    """Reference loss per sample: MSE over elements summed over stacks,
    keeping the batch dim — the reward signal needs per-sample losses."""
    loss = 0.0
    for o in outputs:
        err = (o.astype(jnp.float32) - target_nhwc) ** 2
        loss = loss + jnp.mean(err, axis=(1, 2, 3))
    return loss  # (B,)


def apply_occlusion(images, node_idx, boxes):
    """Zero out the sampled occluder box per sample (AHO, C13).

    images: (B, H, W, C) normalized crops; node_idx: (B,) into ``boxes``
    (node 0 = no occlusion, box (0,0,0,0)); boxes: (N, 4) static
    (y0, x0, h, w).  Zero is the dataset mean after normalization.
    """
    B, H, W, _ = images.shape
    box = jnp.asarray(boxes)[node_idx]  # (B, 4)
    y0 = box[:, 0][:, None, None]
    x0 = box[:, 1][:, None, None]
    h = box[:, 2][:, None, None]
    w = box[:, 3][:, None, None]
    ys = jax.lax.broadcasted_iota(jnp.int32, (1, H, 1), 1)
    xs = jax.lax.broadcasted_iota(jnp.int32, (1, 1, W), 2)
    inside = (ys >= y0) & (ys < y0 + h) & (xs >= x0) & (xs < x0 + w)
    return jnp.where(inside[..., None], 0.0, images)


def make_joint_step_split(
    pose_model,
    agent_model,
    pose_tx,
    agent_tx,
    aug_cfg,
    mean,
    std=None,
    *,
    scale_table,
    rot_table,
    occ_boxes=None,
    baseline="batch_mean",
):
    """Split-program variant of :func:`make_joint_step` for single-chip use.

    Motivation (measured, BASELINE.md): XLA:TPU compiles the monolithic
    8-stack joint program poorly (575 s compile, ~30x the expected step
    time), while each constituent program is fast.  This variant runs the
    same math as four small jits — intermediates never leave the device, so
    the only extra cost is ~4 dispatch round-trips:

      A: neutral crop -> agent logits -> bin sampling -> adversarial +
         reference augmented batches
      B: pose fwd/bwd + RMSprop update on the adversarial batch
      C: reference forward (no grad) -> per-sample baseline losses
      D: agent REINFORCE update from the advantage

    Not shard_map-compatible (the epoch driver handles DP via the fused
    variant); returns a callable (state, batch, key) -> (state, metrics).
    """
    scale_table_j = jnp.asarray(scale_table, jnp.float32)
    rot_table_j = jnp.asarray(rot_table, jnp.float32)

    @jax.jit
    def stage_a(agent_state: TrainState, batch, key):
        k_s, k_r, k_o, k_flip, k_jit, k_ref = jax.random.split(key, 6)
        B = batch["image"].shape[0]
        aug_n = _augment(batch, neutral_params(B), aug_cfg, mean, std, None)
        logits = agent_model.apply(
            {
                "params": agent_state.params,
                "batch_stats": agent_state.batch_stats,
            },
            aug_n["input"],
            train=False,
        )
        si, logp_s = sample_bins(k_s, logits["scale"])
        ri, logp_r = sample_bins(k_r, logits["rot"])
        idx = {"si": si, "ri": ri}
        if occ_boxes is not None:
            oi, _ = sample_bins(k_o, logits["occ"])
            idx["oi"] = oi
        flip = jax.random.uniform(k_flip, (B,)) < aug_cfg.flip_prob
        adv_params = AugParams(
            scale_factor=scale_table_j[si], rot=rot_table_j[ri], flip=flip
        )
        ref_params = sample_aug_params(
            k_ref,
            B,
            scale_factor=aug_cfg.scale_factor,
            rot_factor=aug_cfg.rot_factor,
            rot_prob=aug_cfg.rot_prob,
            flip_prob=aug_cfg.flip_prob,
            scale_mode=aug_cfg.scale_mode,
        )
        aug2 = _augment_pair(
            batch,
            adv_params,
            ref_params,
            aug_cfg,
            mean,
            std,
            k_jit if aug_cfg.color_jitter else None,
        )
        inp_a = aug2["input"][:B]
        if occ_boxes is not None:
            inp_a = apply_occlusion(inp_a, idx["oi"], occ_boxes)
        return {
            "neutral_inp": aug_n["input"],
            "inp_a": inp_a,
            "tgt_a": aug2["target"][:B],
            "inp_r": aug2["input"][B:],
            "tgt_r": aug2["target"][B:],
            "idx": idx,
        }

    @jax.jit
    def stage_b(pose_state: TrainState, inp_a, tgt_a):
        target = tgt_a.transpose(0, 2, 3, 1)

        def loss_fn(p):
            outs, mut = pose_model.apply(
                {"params": p, "batch_stats": pose_state.batch_stats},
                inp_a,
                train=True,
                mutable=["batch_stats"],
            )
            l_sample = per_sample_stacked_mse(outs, target)
            return jnp.mean(l_sample), (l_sample, mut["batch_stats"], outs[-1])

        (loss, (l_adv, new_bs, last)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(pose_state.params)
        updates, new_opt = pose_tx.update(
            grads, pose_state.opt_state, pose_state.params
        )
        new_params = optax.apply_updates(pose_state.params, updates)
        acc = accuracy(last.astype(jnp.float32).transpose(0, 3, 1, 2), tgt_a)[0]
        new_state = TrainState(
            params=new_params,
            batch_stats=new_bs,
            opt_state=new_opt,
            step=pose_state.step + 1,
        )
        return new_state, loss, l_adv, acc

    @jax.jit
    def stage_c(pose_state: TrainState, inp_r, tgt_r):
        outs = pose_model.apply(
            {
                "params": pose_state.params,
                "batch_stats": pose_state.batch_stats,
            },
            inp_r,
            train=False,
        )
        return per_sample_stacked_mse(outs, tgt_r.transpose(0, 2, 3, 1))

    @jax.jit
    def stage_d(agent_state: TrainState, neutral_inp, idx, advantage):
        adv = jax.lax.stop_gradient(advantage)
        if baseline == "batch_mean":
            adv = (adv - jnp.mean(adv)) / (jnp.std(adv) + 1e-6)
        elif baseline == "sign":
            adv = jnp.sign(adv)

        def objective(p):
            logits, mut = agent_model.apply(
                {"params": p, "batch_stats": agent_state.batch_stats},
                neutral_inp,
                train=True,
                mutable=["batch_stats"],
            )
            logp = jnp.take_along_axis(
                jax.nn.log_softmax(logits["scale"]), idx["si"][:, None], axis=1
            )[:, 0]
            logp = logp + jnp.take_along_axis(
                jax.nn.log_softmax(logits["rot"]), idx["ri"][:, None], axis=1
            )[:, 0]
            if "oi" in idx:
                logp = logp + jnp.take_along_axis(
                    jax.nn.log_softmax(logits["occ"]), idx["oi"][:, None], axis=1
                )[:, 0]
            ent = -jnp.mean(
                jax.nn.softmax(logits["scale"])
                * jax.nn.log_softmax(logits["scale"])
            )
            return -jnp.mean(adv * logp), (mut["batch_stats"], ent)

        (agent_loss, (new_bs, ent)), grads = jax.value_and_grad(
            objective, has_aux=True
        )(agent_state.params)
        updates, new_opt = agent_tx.update(
            grads, agent_state.opt_state, agent_state.params
        )
        new_params = optax.apply_updates(agent_state.params, updates)
        new_state = TrainState(
            params=new_params,
            batch_stats=new_bs,
            opt_state=new_opt,
            step=agent_state.step + 1,
        )
        return new_state, agent_loss, ent

    def joint_step(state: JointState, batch, key):
        key = jax.random.fold_in(key, state.step)
        staged = stage_a(state.agent, batch, key)
        new_pose, loss, l_adv, acc = stage_b(
            state.pose, staged["inp_a"], staged["tgt_a"]
        )
        l_ref = stage_c(state.pose, staged["inp_r"], staged["tgt_r"])
        new_agent, agent_loss, ent = stage_d(
            state.agent, staged["neutral_inp"], staged["idx"], l_adv - l_ref
        )
        new_state = JointState(
            pose=new_pose, agent=new_agent, step=state.step + 1
        )
        metrics = {
            "loss": loss,
            "acc": acc,
            "agent_loss": agent_loss,
            "advantage": jnp.mean(l_adv - l_ref),
            "entropy": ent,
        }
        return new_state, metrics

    return joint_step


def make_joint_step(
    pose_model,
    agent_model,
    pose_tx,
    agent_tx,
    aug_cfg,
    mean,
    std=None,
    *,
    scale_table,
    rot_table,
    occ_boxes=None,
    axis_name=None,
    baseline="batch_mean",
    ref_baseline=True,
):
    """Build the jitted joint minimax step (configs 3-5 of
    BASELINE.json:10-12).

    ``ref_baseline=False`` drops the reference-augmentation forward pass
    and rewards relative to the batch's own mean loss (standard REINFORCE
    self-baseline) — cheaper (one model application instead of two) at the
    cost of deviating from the paper's harder-than-reference comparison.
    """
    scale_table = jnp.asarray(scale_table, jnp.float32)
    rot_table = jnp.asarray(rot_table, jnp.float32)

    def joint_step(state: JointState, batch, key):
        if axis_name is not None:
            key = jax.random.fold_in(key, jax.lax.axis_index(axis_name))
        key = jax.random.fold_in(key, state.step)
        k_s, k_r, k_o, k_flip, k_jit, k_ref = jax.random.split(key, 6)
        B = batch["image"].shape[0]

        # --- 1. neutral crop for the agent (SURVEY.md §3.2) ---
        aug_n = _augment(batch, neutral_params(B), aug_cfg, mean, std, None)

        # --- 2-3. agent forward + bin sampling ---
        def agent_loss_fn(agent_params):
            logits, mut = agent_model.apply(
                {"params": agent_params, "batch_stats": state.agent.batch_stats},
                aug_n["input"],
                train=True,
                mutable=["batch_stats"],
            )
            si, logp_s = sample_bins(k_s, logits["scale"])
            ri, logp_r = sample_bins(k_r, logits["rot"])
            logp = logp_s + logp_r
            extras = {"si": si, "ri": ri}
            if occ_boxes is not None:
                oi, logp_o = sample_bins(k_o, logits["occ"])
                logp = logp + logp_o
                extras["oi"] = oi
            return logp, (extras, mut["batch_stats"], logits)

        # Sample once (no grad yet) to build the augmented batch.
        logp0, (extras, _, _) = agent_loss_fn(state.agent.params)
        flip = jax.random.uniform(k_flip, (B,)) < aug_cfg.flip_prob
        adv_params = AugParams(
            scale_factor=scale_table[extras["si"]],
            rot=rot_table[extras["ri"]],
            flip=flip,
        )

        # --- 4-5. adversarial + reference warps fused into ONE pass ---
        if ref_baseline:
            ref_params = sample_aug_params(
                k_ref,
                B,
                scale_factor=aug_cfg.scale_factor,
                rot_factor=aug_cfg.rot_factor,
                rot_prob=aug_cfg.rot_prob,
                flip_prob=aug_cfg.flip_prob,
                scale_mode=aug_cfg.scale_mode,
            )
            aug2 = _augment_pair(
                batch,
                adv_params,
                ref_params,
                aug_cfg,
                mean,
                std,
                k_jit if aug_cfg.color_jitter else None,
            )
            inp_a = aug2["input"][:B]
            target_a = aug2["target"][:B].transpose(0, 2, 3, 1)
            inp_r = aug2["input"][B:]
            tgt_r = aug2["target"][B:].transpose(0, 2, 3, 1)
        else:
            aug_a = _augment(
                batch,
                adv_params,
                aug_cfg,
                mean,
                std,
                k_jit if aug_cfg.color_jitter else None,
            )
            inp_a = aug_a["input"]
            target_a = aug_a["target"].transpose(0, 2, 3, 1)
        if occ_boxes is not None:
            inp_a = apply_occlusion(inp_a, extras["oi"], occ_boxes)

        # --- 6. pose forward/backward on the adversarial batch ---
        def pose_loss_fn(pose_params):
            outs, mut = pose_model.apply(
                {"params": pose_params, "batch_stats": state.pose.batch_stats},
                inp_a,
                train=True,
                mutable=["batch_stats"],
            )
            l_sample = per_sample_stacked_mse(outs, target_a)  # (B,)
            return jnp.mean(l_sample), (l_sample, mut["batch_stats"], outs[-1])

        (pose_loss, (l_adv, new_pose_bs, last)), pose_grads = (
            jax.value_and_grad(pose_loss_fn, has_aux=True)(state.pose.params)
        )

        # --- 7. baseline for the reward ---
        if ref_baseline:
            # reference augmentation forward (no grad) — the paper's
            # harder-than-reference comparison (crops computed in the fused
            # pass above)
            outs_r = pose_model.apply(
                {
                    "params": state.pose.params,
                    "batch_stats": state.pose.batch_stats,
                },
                inp_r,
                train=False,
            )
            l_ref = per_sample_stacked_mse(outs_r, tgt_r)
        else:
            l_ref = jnp.mean(l_adv) * jnp.ones_like(l_adv)  # self-baseline

        # --- reward: harder-than-reference bins get positive advantage ---
        adv = jax.lax.stop_gradient(l_adv - l_ref)  # (B,)
        if baseline == "batch_mean":
            m = jnp.mean(adv)
            s = jnp.std(adv) + 1e-6
            if axis_name is not None:
                m = jax.lax.pmean(m, axis_name)
                s = jax.lax.pmean(s, axis_name)
            adv = (adv - m) / s
        elif baseline == "sign":
            adv = jnp.sign(adv)

        # --- agent REINFORCE update: ascend E[advantage * log pi] ---
        def agent_objective(agent_params):
            logp, (_, new_bs, logits) = agent_loss_fn(agent_params)
            loss = -jnp.mean(adv * logp)
            ent = -jnp.mean(
                jax.nn.softmax(logits["scale"]) * jax.nn.log_softmax(logits["scale"])
            )
            return loss, (new_bs, ent)

        (agent_loss, (new_agent_bs, entropy)), agent_grads = (
            jax.value_and_grad(agent_objective, has_aux=True)(state.agent.params)
        )

        if axis_name is not None:
            pose_grads = jax.lax.pmean(pose_grads, axis_name)
            agent_grads = jax.lax.pmean(agent_grads, axis_name)
            pose_loss = jax.lax.pmean(pose_loss, axis_name)
            agent_loss = jax.lax.pmean(agent_loss, axis_name)

        p_updates, new_pose_opt = pose_tx.update(
            pose_grads, state.pose.opt_state, state.pose.params
        )
        new_pose_params = optax.apply_updates(state.pose.params, p_updates)
        a_updates, new_agent_opt = agent_tx.update(
            agent_grads, state.agent.opt_state, state.agent.params
        )
        new_agent_params = optax.apply_updates(state.agent.params, a_updates)

        acc = accuracy(
            last.astype(jnp.float32).transpose(0, 3, 1, 2),
            target_a.transpose(0, 3, 1, 2),
        )[0]
        if axis_name is not None:
            acc = jax.lax.pmean(acc, axis_name)

        new_state = JointState(
            pose=TrainState(
                params=new_pose_params,
                batch_stats=new_pose_bs,
                opt_state=new_pose_opt,
                step=state.pose.step + 1,
            ),
            agent=TrainState(
                params=new_agent_params,
                batch_stats=new_agent_bs,
                opt_state=new_agent_opt,
                step=state.agent.step + 1,
            ),
            step=state.step + 1,
        )
        metrics = {
            "loss": pose_loss,
            "acc": acc,
            "agent_loss": agent_loss,
            "advantage": jnp.mean(l_adv - l_ref),
            "entropy": entropy,
        }
        return new_state, metrics

    return joint_step
