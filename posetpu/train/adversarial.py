"""Joint adversarial augmentation training (SURVEY.md §2 C6/C7/C13, §3.2).

Reference flow per batch (host-bound): neutral crop from loader -> agent on
GPU -> sample bins -> *CPU* re-warp + re-rasterize -> pose fwd/bwd ->
REINFORCE reward from per-sample loss comparison -> alternate optimizer
steps.  The device<->host round trips per batch were THE bottleneck
(BASELINE.json:5).

Here the ENTIRE minimax step is one jitted, shard_map-able program:

  neutral crop (device warp)                    posetpu.aug
  -> agent forward (bf16 convs)                 posetpu.models.agent
  -> categorical bin sampling (per-sample jax PRNG)
  -> adversarial warp + rasterize (device)      posetpu.aug
  -> AHO occlusion masking (optional, tree- or flat-sampled)
  -> pose fwd/bwd on the adversarial batch
  -> reference-aug forward (no grad) as the REINFORCE baseline
  -> reward = per-sample loss(sampled aug) - loss(reference aug)
  -> agent REINFORCE update (gated to every `update_every`-th step,
     the reference's alternating minimax cadence) + pose RMSprop update

Reward rule (C7): bins whose augmentation makes the pose network's loss
HIGHER than the reference augmentation get their probability increased
(policy-gradient ascent on estimator loss), pose net descends on its own
loss — the paper's minimax joint optimization.

Two builders produce the SAME math (tested equivalent to fp tolerance):

  make_joint_step        — one fused program; shard_map-able for DP.  All
                           randomness is per-sample (keyed on the global
                           dataset index) and the advantage normalization
                           uses psum'd GLOBAL moments, so the 8-chip run is
                           statistically identical to single-device.
  make_joint_step_split  — the same math as four small jits, for single-chip
                           use where XLA:TPU compiles the monolithic 8-stack
                           joint program pathologically (BASELINE.md).

Both are built from the shared helpers below (_sample_policy, _policy_logp,
_normalize_advantage, _agent_update) — equivalence by construction, then
verified by tests/test_adversarial.py.
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
    per_sample_keys,
    sample_aug_params_ps,
)
from posetpu.eval.decode import accuracy, pck_counts, pck_from_counts
from posetpu.models.agent import (
    occlusion_tree_logp,
    part_occlusion_boxes,
    sample_bins_ps,
    sample_occlusion_tree,
)
from posetpu.train.state import TrainState
from posetpu.train.step import _augment, per_sample_stacked_mse  # noqa: F401
# (per_sample_stacked_mse re-exported here for back-compat; it moved to
# train.step so the mask-aware eval step can share it without a cycle)


@flax.struct.dataclass
class JointState:
    pose: TrainState
    agent: TrainState
    step: jnp.ndarray


def _tile2(x):
    return jnp.concatenate([x, x], axis=0)


def _augment_pair(batch, params_a, params_b, aug_cfg, mean, std, jitter_keys):
    """Warp the adversarial and reference crops of one batch in a single
    fused pass (ONE gather over the source images via src_index — the
    separate-pass form tripled the warp's operand traffic).  Returns the
    combined aug dict with 2B leading entries: [:B]=a, [B:]=b.  The same
    per-sample jitter applies to both crops of a sample, keeping the
    reward's loss comparison aug-for-aug fair."""
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
        jitter_keys=_tile2(jitter_keys) if jitter_keys is not None else None,
        src_index=jnp.concatenate(
            [jnp.arange(B, dtype=jnp.int32)] * 2
        ),
        warp_table=getattr(aug_cfg, "warp_table", "u8"),
        raster_backend=getattr(aug_cfg, "raster_backend", "auto"),
    )


def apply_occlusion(images, node_idx, boxes):
    """Zero out the sampled occluder box per sample (AHO, C13).

    images: (B, H, W, C) normalized crops; node_idx: (B,) into ``boxes``
    (node 0 = no occlusion, box (0,0,0,0)); boxes: (N, 4) static
    (y0, x0, h, w) grid boxes, or (B, N, 4) per-sample boxes (body-part
    mode, :func:`posetpu.models.agent.part_occlusion_boxes`).  Zero is the
    dataset mean after normalization.
    """
    B, H, W, _ = images.shape
    boxes = jnp.asarray(boxes)
    if boxes.ndim == 3:  # per-sample box tables
        box = jnp.take_along_axis(
            boxes, node_idx[:, None, None].astype(jnp.int32), axis=1
        )[:, 0]  # (B, 4)
    else:
        box = boxes[node_idx]  # (B, 4)
    y0 = box[:, 0][:, None, None]
    x0 = box[:, 1][:, None, None]
    h = box[:, 2][:, None, None]
    w = box[:, 3][:, None, None]
    ys = jax.lax.broadcasted_iota(jnp.int32, (1, H, 1), 1)
    xs = jax.lax.broadcasted_iota(jnp.int32, (1, 1, W), 2)
    inside = (ys >= y0) & (ys < y0 + h) & (xs >= x0) & (xs < x0 + w)
    return jnp.where(inside[..., None], 0.0, images)


def _occ_box_table(occ, occ_boxes, tpts, target_weight, aug_cfg):
    """Resolve the box table for :func:`apply_occlusion`: the static grid
    (tree/flat modes) or per-sample body-part boxes derived from the
    adversarial crop's own keypoints (parts mode).  ``tpts`` are the aug's
    UN-truncated float heatmap-resolution keypoints (``tpts_float``); the
    crop-resolution coords are an exact linear rescale (make_transform is
    linear in the output res) — the truncated int ``tpts`` would bias the
    boxes up to inp/out (=4px) toward the origin.
    """
    if occ["mode"] != "parts":
        return occ_boxes
    ry = aug_cfg.inp_res[0] / aug_cfg.out_res[0]
    rx = aug_cfg.inp_res[1] / aug_cfg.out_res[1]
    pts_inp = (tpts - 1.0) * jnp.asarray([rx, ry], jnp.float32)
    return part_occlusion_boxes(pts_inp, target_weight, occ["dataset"])


# ---- shared joint-step math (used by BOTH the fused and split variants;
# ---- identical key derivations are what make them equivalent) ----


def _sample_policy(key, batch, logits, aug_cfg, scale_table, rot_table, occ):
    """Draw every stochastic choice of one joint step.

    All draws use per-sample keys folded from the GLOBAL dataset index
    (``batch['index']``), so the result is invariant to batch sharding.

    ``occ``: None, or dict(mode="flat"|"tree", levels=...) matching the
    agent's AHO head layout.

    Returns (extras, adv_params, ref_params, jitter_keys): ``extras`` holds
    the sampled policy path (si, ri [, oi / occ_lvl / occ_cell]) that
    :func:`_policy_logp` re-evaluates differentiably.
    """
    k_s, k_r, k_o, k_flip, k_jit, k_ref = jax.random.split(key, 6)
    idx = batch["index"]
    si, _ = sample_bins_ps(per_sample_keys(k_s, idx), logits["scale"])
    ri, _ = sample_bins_ps(per_sample_keys(k_r, idx), logits["rot"])
    extras = {"si": si, "ri": ri}
    if occ is not None:
        if occ["mode"] in ("tree", "parts"):
            node, lvl, cell, _ = sample_occlusion_tree(
                per_sample_keys(k_o, idx),
                logits["occ_level"],
                logits["occ_cells"],
                occ["levels"],
            )
            extras.update({"oi": node, "occ_lvl": lvl, "occ_cell": cell})
        else:
            oi, _ = sample_bins_ps(per_sample_keys(k_o, idx), logits["occ"])
            extras["oi"] = oi
    flip_u = jax.vmap(lambda k: jax.random.uniform(k, ()))(
        per_sample_keys(k_flip, idx)
    )
    adv_params = AugParams(
        scale_factor=scale_table[si],
        rot=rot_table[ri],
        flip=flip_u < aug_cfg.flip_prob,
    )
    ref_params = sample_aug_params_ps(
        per_sample_keys(k_ref, idx),
        scale_factor=aug_cfg.scale_factor,
        rot_factor=aug_cfg.rot_factor,
        rot_prob=aug_cfg.rot_prob,
        flip_prob=aug_cfg.flip_prob,
        scale_mode=aug_cfg.scale_mode,
    )
    jitter_keys = (
        per_sample_keys(k_jit, idx) if aug_cfg.color_jitter else None
    )
    return extras, adv_params, ref_params, jitter_keys


def _policy_logp(logits, extras):
    """log pi(sampled path) per sample — differentiable in ``logits``; the
    sampled indices in ``extras`` are fixed (standard REINFORCE)."""
    logp = jnp.take_along_axis(
        jax.nn.log_softmax(logits["scale"]), extras["si"][:, None], axis=1
    )[:, 0]
    logp = logp + jnp.take_along_axis(
        jax.nn.log_softmax(logits["rot"]), extras["ri"][:, None], axis=1
    )[:, 0]
    if "occ_lvl" in extras:  # tree-structured AHO (C13)
        logp = logp + occlusion_tree_logp(
            logits["occ_level"],
            logits["occ_cells"],
            extras["occ_lvl"],
            extras["occ_cell"],
        )
    elif "oi" in extras:  # flat AHO head
        logp = logp + jnp.take_along_axis(
            jax.nn.log_softmax(logits["occ"]), extras["oi"][:, None], axis=1
        )[:, 0]
    return logp


def _head_entropy(head_logits):
    """Mean categorical entropy (nats) of one (B, N) logits head."""
    p = jax.nn.softmax(head_logits)
    return -jnp.mean((p * jax.nn.log_softmax(head_logits)).sum(-1))


def _entropy(logits):
    """Mean policy entropy (nats) across ALL heads of the policy — scale,
    rotation, and occlusion when present.  A single-head reading would be
    blind to the rot/occ distributions collapsing (the policy-collapse
    diagnostic this metric exists for).  Tree/parts AHO agents emit
    ``occ_level`` + per-level ``occ_cells`` instead of a flat ``occ`` head
    (models/agent.py head_occ_level/head_occ_cell*); those enter as one
    entropy term each, so a collapsed occlusion policy drives the metric
    down in EVERY occ_mode (round-3 verdict: tree/parts were invisible)."""
    ents = []
    for head in ("scale", "rot", "occ", "occ_level"):
        if head in logits:
            ents.append(_head_entropy(logits[head]))
    for cell in logits.get("occ_cells", ()):
        ents.append(_head_entropy(cell))
    if not ents:  # no known head matched — a future agent variant must
        return jnp.float32(0.0)  # not ZeroDivisionError inside jit
    return sum(ents) / len(ents)


def _normalize_advantage(adv, baseline, axis_name):
    """Standardize the advantage with GLOBAL batch moments.

    Under DP the mean and mean-of-squares are psum-averaged across shards
    before the std — the mean of per-shard stds is NOT the global std
    (round-1 defect), and equal shard sizes make these pmean'd moments
    exactly the full-batch moments.
    """
    adv = jax.lax.stop_gradient(adv)
    if baseline == "batch_mean":
        m = jnp.mean(adv)
        m2 = jnp.mean(adv * adv)
        if axis_name is not None:
            m = jax.lax.pmean(m, axis_name)
            m2 = jax.lax.pmean(m2, axis_name)
        s = jnp.sqrt(jnp.maximum(m2 - m * m, 0.0)) + 1e-6
        adv = (adv - m) / s
    elif baseline == "sign":
        adv = jnp.sign(adv)
    return adv


def _agent_update(
    agent_model, agent_tx, agent_state, neutral_inp, extras, adv, do_update
):
    """REINFORCE update of the agent, gated by ``do_update`` (the minimax
    cadence knob `agent.update_every`, SURVEY.md §3.2 line 181): params,
    optimizer state, BN stats, and the step counter only advance on update
    steps.  The gradient is always computed (static program shape; the agent
    is ~1% of the joint step's FLOPs) and discarded via jnp.where.
    """

    def objective(p):
        logits, mut = agent_model.apply(
            {"params": p, "batch_stats": agent_state.batch_stats},
            neutral_inp,
            train=True,
            mutable=["batch_stats"],
        )
        loss = -jnp.mean(adv * _policy_logp(logits, extras))
        return loss, (mut["batch_stats"], _entropy(logits))

    (agent_loss, (new_bs, ent)), grads = jax.value_and_grad(
        objective, has_aux=True
    )(agent_state.params)
    return agent_loss, ent, grads, new_bs


def _gate(do, new, old):
    return jax.tree.map(lambda a, b: jnp.where(do, a, b), new, old)


def _finish_agent_state(agent_tx, agent_state, grads, new_bs, do_update):
    updates, new_opt = agent_tx.update(
        grads, agent_state.opt_state, agent_state.params
    )
    new_params = optax.apply_updates(agent_state.params, updates)
    return TrainState(
        params=_gate(do_update, new_params, agent_state.params),
        batch_stats=_gate(do_update, new_bs, agent_state.batch_stats),
        opt_state=_gate(do_update, new_opt, agent_state.opt_state),
        step=agent_state.step + do_update.astype(jnp.int32),
    )


def _occ_spec(occ_boxes, agent_model, occ_mode, occ_levels):
    """The sampler must match the agent's AHO head layout; None arguments
    resolve from the agent model's own fields (the default — passing
    explicit values is only for agents without those attributes).

    "parts" mode needs no static box table (boxes derive from each
    sample's keypoints in-step) — it is enabled iff the agent carries AHO
    heads; the grid modes are enabled by passing ``occ_boxes``."""
    mode = occ_mode or getattr(agent_model, "occ_mode", "flat")
    if mode == "parts":
        if getattr(agent_model, "num_occ_nodes", 0) <= 0:
            return None
        return {
            "mode": mode,
            "levels": (),
            "dataset": getattr(agent_model, "occ_dataset", "mpii"),
        }
    if occ_boxes is None:
        return None
    levels = tuple(occ_levels or getattr(agent_model, "occ_levels", ()))
    return {"mode": mode, "levels": levels}


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
    occ_mode=None,
    occ_levels=None,
    baseline="batch_mean",
    update_every=1,
    pose_ref_weight=0.0,
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
      D: agent REINFORCE update from the advantage (cadence-gated)

    Not shard_map-compatible (the epoch driver handles DP via the fused
    variant); returns a callable (state, batch, key) -> (state, metrics).
    Proven numerically equivalent to the fused variant by
    tests/test_adversarial.py::TestVariantEquivalence.

    ``pose_ref_weight`` mixes the reference crops into the pose update
    exactly as in :func:`make_joint_step` (stage B then runs the concat
    grad pass and stage C is skipped — the in-pass reference losses feed
    the reward).
    """
    if not 0.0 <= pose_ref_weight < 1.0:
        raise ValueError(f"pose_ref_weight must be in [0, 1): {pose_ref_weight}")
    scale_table_j = jnp.asarray(scale_table, jnp.float32)
    rot_table_j = jnp.asarray(rot_table, jnp.float32)
    occ = _occ_spec(occ_boxes, agent_model, occ_mode, occ_levels)

    @jax.jit
    def stage_a(agent_state: TrainState, batch, key):
        B = batch["image"].shape[0]
        aug_n = _augment(batch, neutral_params(B), aug_cfg, mean, std, None)
        # train=True batch semantics, mutation discarded — identical to the
        # fused variant's sampling forward (the update forward in stage D
        # applies the BN-stat mutation, exactly as the fused objective does)
        logits, _ = agent_model.apply(
            {
                "params": agent_state.params,
                "batch_stats": agent_state.batch_stats,
            },
            aug_n["input"],
            train=True,
            mutable=["batch_stats"],
        )
        extras, adv_params, ref_params, jitter_keys = _sample_policy(
            key, batch, logits, aug_cfg, scale_table_j, rot_table_j, occ
        )
        aug2 = _augment_pair(
            batch, adv_params, ref_params, aug_cfg, mean, std, jitter_keys
        )
        inp_a = aug2["input"][:B]
        if occ is not None:
            inp_a = apply_occlusion(
                inp_a,
                extras["oi"],
                _occ_box_table(
                    occ,
                    occ_boxes,
                    aug2["tpts_float"][:B],
                    aug2["target_weight"][:B],
                    aug_cfg,
                ),
            )
        return {
            "neutral_inp": aug_n["input"],
            "inp_a": inp_a,
            "tgt_a": aug2["target"][:B],
            "inp_r": aug2["input"][B:],
            "tgt_r": aug2["target"][B:],
            "extras": extras,
        }

    mixed = pose_ref_weight > 0.0

    @jax.jit
    def stage_b(pose_state: TrainState, inp_a, tgt_a, inp_r, tgt_r):
        """Pose fwd/bwd + update.  Unmixed: on the adversarial batch
        alone (inp_r/tgt_r are traced but unused).  Mixed: one grad pass
        over concat(adv, ref) with the weighted loss — the same body,
        branched at trace time."""
        B = inp_a.shape[0]
        if mixed:
            inp_t = jnp.concatenate([inp_a, inp_r], axis=0)
            target = jnp.concatenate([tgt_a, tgt_r], axis=0).transpose(
                0, 2, 3, 1
            )
        else:
            inp_t, target = inp_a, tgt_a.transpose(0, 2, 3, 1)

        def loss_fn(p):
            outs, mut = pose_model.apply(
                {"params": p, "batch_stats": pose_state.batch_stats},
                inp_t,
                train=True,
                mutable=["batch_stats"],
            )
            l_sample = per_sample_stacked_mse(outs, target)  # (B,) or (2B,)
            if mixed:
                loss = (1.0 - pose_ref_weight) * jnp.mean(
                    l_sample[:B]
                ) + pose_ref_weight * jnp.mean(l_sample[B:])
            else:
                loss = jnp.mean(l_sample)
            return loss, (l_sample, mut["batch_stats"], outs[-1][:B])

        (loss, (l_sample, new_bs, last)), grads = jax.value_and_grad(
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
        return new_state, loss, l_sample, acc

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
    def stage_d(agent_state: TrainState, neutral_inp, extras, advantage, do_update):
        adv = _normalize_advantage(advantage, baseline, axis_name=None)
        agent_loss, ent, grads, new_bs = _agent_update(
            agent_model, agent_tx, agent_state, neutral_inp, extras, adv, do_update
        )
        new_state = _finish_agent_state(
            agent_tx, agent_state, grads, new_bs, do_update
        )
        return new_state, agent_loss, ent

    def joint_step(state: JointState, batch, key):
        key = jax.random.fold_in(key, state.step)
        staged = stage_a(state.agent, batch, key)
        new_pose, loss, l_sample, acc = stage_b(
            state.pose,
            staged["inp_a"],
            staged["tgt_a"],
            staged["inp_r"],
            staged["tgt_r"],
        )
        B = staged["inp_a"].shape[0]
        l_adv = l_sample[:B]
        if mixed:
            l_ref = l_sample[B:]
        else:
            l_ref = stage_c(state.pose, staged["inp_r"], staged["tgt_r"])
        do_update = (state.step % update_every) == 0
        new_agent, agent_loss, ent = stage_d(
            state.agent,
            staged["neutral_inp"],
            staged["extras"],
            l_adv - l_ref,
            do_update,
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
    occ_mode=None,
    occ_levels=None,
    axis_name=None,
    baseline="batch_mean",
    ref_baseline=True,
    update_every=1,
    pose_ref_weight=0.0,
):
    """Build the jitted joint minimax step (configs 3-5 of
    BASELINE.json:10-12).

    All randomness is per-sample (keyed on ``batch['index']``), so with
    ``axis_name`` under shard_map the step is numerically identical to the
    single-device run on the merged batch — sampled bins, aug params, and
    jitter do not depend on the sharding, gradients are pmean'd, and the
    advantage normalization uses global psum'd moments.

    ``ref_baseline=False`` drops the reference-augmentation forward pass
    and rewards relative to the batch's own mean loss (standard REINFORCE
    self-baseline) — cheaper (one model application instead of two) at the
    cost of deviating from the paper's harder-than-reference comparison.

    ``update_every=N`` applies the agent's REINFORCE update only on steps
    where step % N == 0 (the reference's alternating minimax schedule,
    SURVEY.md §3.2 line 181); the pose net updates every step.

    ``pose_ref_weight=w`` (0 ≤ w < 1, requires ``ref_baseline``) mixes the
    reference-augmentation crops into the POSE update: one grad pass runs
    over concat(adversarial, reference) and the loss is
    ``(1-w)·mean(l_adv) + w·mean(l_ref)``, with BN batch statistics drawn
    from the combined batch.  w=0 (default) is the reference protocol —
    the pose net trains on the adversarial crops only.  w>0 anchors the
    training distribution (and the BN running stats the clean-val forward
    uses) on the reference recipe while keeping adversarial pressure; the
    per-sample reward then reuses the in-pass reference losses (same
    params, same BN regime on both sides of the comparison) instead of a
    separate no-grad forward, so the step stays at two model applications.
    """
    if pose_ref_weight and not ref_baseline:
        raise ValueError("pose_ref_weight > 0 requires ref_baseline=True")
    if not 0.0 <= pose_ref_weight < 1.0:
        raise ValueError(f"pose_ref_weight must be in [0, 1): {pose_ref_weight}")
    scale_table = jnp.asarray(scale_table, jnp.float32)
    rot_table = jnp.asarray(rot_table, jnp.float32)
    occ = _occ_spec(occ_boxes, agent_model, occ_mode, occ_levels)

    def joint_step(state: JointState, batch, key):
        key = jax.random.fold_in(key, state.step)
        B = batch["image"].shape[0]

        # --- 1. neutral crop for the agent (SURVEY.md §3.2) ---
        aug_n = _augment(batch, neutral_params(B), aug_cfg, mean, std, None)

        # --- 2-3. agent forward + per-sample bin sampling ---
        logits0, _ = agent_model.apply(
            {
                "params": state.agent.params,
                "batch_stats": state.agent.batch_stats,
            },
            aug_n["input"],
            train=True,
            mutable=["batch_stats"],
        )
        extras, adv_params, ref_params, jitter_keys = _sample_policy(
            key, batch, logits0, aug_cfg, scale_table, rot_table, occ
        )

        # --- 4-5. adversarial + reference warps fused into ONE pass ---
        if ref_baseline:
            aug2 = _augment_pair(
                batch, adv_params, ref_params, aug_cfg, mean, std, jitter_keys
            )
            inp_a = aug2["input"][:B]
            target_a = aug2["target"][:B].transpose(0, 2, 3, 1)
            inp_r = aug2["input"][B:]
            tgt_r = aug2["target"][B:].transpose(0, 2, 3, 1)
        else:
            aug_a = _augment(batch, adv_params, aug_cfg, mean, std, jitter_keys)
            inp_a = aug_a["input"]
            target_a = aug_a["target"].transpose(0, 2, 3, 1)
        if occ is not None:
            if ref_baseline:
                tpts_a = aug2["tpts_float"][:B]
                tw_a = aug2["target_weight"][:B]
            else:
                tpts_a, tw_a = aug_a["tpts_float"], aug_a["target_weight"]
            inp_a = apply_occlusion(
                inp_a,
                extras["oi"],
                _occ_box_table(occ, occ_boxes, tpts_a, tw_a, aug_cfg),
            )

        # --- 6. pose forward/backward on the adversarial batch (mixed
        # mode: one grad pass over concat(adv, ref), whose in-pass
        # reference losses double as the reward baseline) ---
        mixed = pose_ref_weight > 0.0
        if mixed:
            inp_t = jnp.concatenate([inp_a, inp_r], axis=0)
            tgt_t = jnp.concatenate([target_a, tgt_r], axis=0)
        else:
            inp_t, tgt_t = inp_a, target_a

        def pose_loss_fn(pose_params):
            outs, mut = pose_model.apply(
                {
                    "params": pose_params,
                    "batch_stats": state.pose.batch_stats,
                },
                inp_t,
                train=True,
                mutable=["batch_stats"],
            )
            l_sample = per_sample_stacked_mse(outs, tgt_t)  # (B,) or (2B,)
            if mixed:
                loss = (1.0 - pose_ref_weight) * jnp.mean(
                    l_sample[:B]
                ) + pose_ref_weight * jnp.mean(l_sample[B:])
            else:
                loss = jnp.mean(l_sample)
            return loss, (l_sample, mut["batch_stats"], outs[-1][:B])

        (pose_loss, (l_sample, new_pose_bs, last)), pose_grads = (
            jax.value_and_grad(pose_loss_fn, has_aux=True)(state.pose.params)
        )
        l_adv = l_sample[:B]

        # --- 7. baseline for the reward ---
        if mixed:
            l_ref = l_sample[B:]  # from the mixed grad pass
        elif ref_baseline:
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
        adv = _normalize_advantage(l_adv - l_ref, baseline, axis_name)

        # --- agent REINFORCE update (cadence-gated minimax) ---
        do_update = (state.step % update_every) == 0
        agent_loss, entropy, agent_grads, new_agent_bs = _agent_update(
            agent_model, agent_tx, state.agent, aug_n["input"], extras, adv,
            do_update,
        )

        if axis_name is not None:
            pose_grads = jax.lax.pmean(pose_grads, axis_name)
            agent_grads = jax.lax.pmean(agent_grads, axis_name)
            pose_loss = jax.lax.pmean(pose_loss, axis_name)
            agent_loss = jax.lax.pmean(agent_loss, axis_name)
            entropy = jax.lax.pmean(entropy, axis_name)

        p_updates, new_pose_opt = pose_tx.update(
            pose_grads, state.pose.opt_state, state.pose.params
        )
        new_pose_params = optax.apply_updates(state.pose.params, p_updates)
        new_agent = _finish_agent_state(
            agent_tx, state.agent, agent_grads, new_agent_bs, do_update
        )

        # global counts then ratio (same rule as make_train_step): pmean
        # of per-shard PCK ratios is not the single-device PCK
        hit, cnt = pck_counts(
            last.astype(jnp.float32).transpose(0, 3, 1, 2),
            target_a.transpose(0, 3, 1, 2),
        )
        advantage = jnp.mean(l_adv - l_ref)
        if axis_name is not None:
            hit = jax.lax.psum(hit, axis_name)
            cnt = jax.lax.psum(cnt, axis_name)
            advantage = jax.lax.pmean(advantage, axis_name)
        acc = pck_from_counts(hit, cnt)[0]

        new_state = JointState(
            pose=TrainState(
                params=new_pose_params,
                batch_stats=new_pose_bs,
                opt_state=new_pose_opt,
                step=state.pose.step + 1,
            ),
            agent=new_agent,
            step=state.step + 1,
        )
        metrics = {
            "loss": pose_loss,
            "acc": acc,
            "agent_loss": agent_loss,
            "advantage": advantage,
            "entropy": entropy,
        }
        return new_state, metrics

    return joint_step
