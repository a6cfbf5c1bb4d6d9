"""Agent/joint-step tests (SURVEY.md §4.5): reward sign correctness, AHO
occlusion masking, the fused minimax step running under jit and shard_map."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from posetpu.configs import named_config
from posetpu.data import HostLoader, MpiiDataset, make_synthetic_dataset
from posetpu.models import (
    AugAgent,
    hg,
    occlusion_hierarchy,
    rotation_bin_table,
    scale_bin_table,
)
from posetpu.parallel import make_mesh, shard_train_step
from posetpu.train import JointState, TrainState, apply_occlusion, make_joint_step
from posetpu.train.state import make_optimizer


@pytest.fixture(scope="module")
def synth(tmp_path_factory):
    d = tmp_path_factory.mktemp("synth_adv")
    make_synthetic_dataset(str(d), num_train=16, num_val=4, res=(320, 240))
    return MpiiDataset(
        os.path.join(d, "annotations.json"),
        os.path.join(d, "images"),
        split="train",
    )


def _joint_setup(cfg, occ=False, axis_name=None):
    model = hg(
        num_stacks=1, num_feats=16, num_classes=16, axis_name=axis_name
    )
    boxes = occlusion_hierarchy((64, 64), (1, 2)) if occ else None
    agent = AugAgent(
        num_scale_bins=5,
        num_rot_bins=5,
        num_occ_nodes=len(boxes) if occ else 0,
        widths=(8, 16),
        axis_name=axis_name,
    )
    tx = make_optimizer(cfg.optim, 10)
    atx = make_optimizer(cfg.optim, 10)
    x = jnp.zeros((1, 64, 64, 3))
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
    step = make_joint_step(
        model,
        agent,
        tx,
        atx,
        cfg.aug,
        (0.2, 0.2, 0.2),
        scale_table=scale_bin_table(5),
        rot_table=rotation_bin_table(5),
        occ_boxes=boxes,
        axis_name=axis_name,
    )
    return step, state


def _tiny_cfg():
    cfg = named_config("hg2_mpii_mini")
    cfg.aug.inp_res = (64, 64)
    cfg.aug.out_res = (16, 16)
    return cfg


class TestOcclusion:
    def test_apply_occlusion_zeroes_box(self):
        boxes = np.array([[0, 0, 0, 0], [4, 6, 8, 10]], np.int32)
        img = jnp.ones((2, 32, 32, 3))
        out = np.asarray(apply_occlusion(img, jnp.array([0, 1]), boxes))
        assert out[0].min() == 1.0  # node 0: untouched
        assert out[1, 4:12, 6:16].max() == 0.0
        assert out[1, :4].min() == 1.0 and out[1, 12:].min() == 1.0

    def test_hierarchy_nodes_inside(self):
        boxes = occlusion_hierarchy((256, 256), (1, 2, 4))
        for y0, x0, h, w in boxes[1:]:
            assert 0 <= y0 and y0 + h <= 256
            assert 0 <= x0 and x0 + w <= 256


class TestJointStep:
    def test_runs_and_updates_both(self, synth):
        cfg = _tiny_cfg()
        step, state = _joint_setup(cfg)
        jstep = jax.jit(step)
        batch = next(iter(HostLoader(synth, 8, pad_hw=(256, 384))))
        new_state, metrics = jstep(state, batch, jax.random.PRNGKey(0))
        for k in ("loss", "acc", "agent_loss", "advantage", "entropy"):
            assert np.isfinite(float(metrics[k])), k
        # both networks updated
        d_pose = jax.tree.map(
            lambda a, b: float(jnp.abs(a - b).max()), state.pose.params, new_state.pose.params
        )
        d_agent = jax.tree.map(
            lambda a, b: float(jnp.abs(a - b).max()), state.agent.params, new_state.agent.params
        )
        assert max(jax.tree.leaves(d_pose)) > 0
        assert max(jax.tree.leaves(d_agent)) > 0
        assert int(new_state.step) == 1

    def test_with_occlusion_head(self, synth):
        cfg = _tiny_cfg()
        step, state = _joint_setup(cfg, occ=True)
        jstep = jax.jit(step)
        batch = next(iter(HostLoader(synth, 8, pad_hw=(256, 384))))
        _, metrics = jstep(state, batch, jax.random.PRNGKey(0))
        assert np.isfinite(float(metrics["loss"]))

    def test_sharded_joint_step(self, synth):
        cfg = _tiny_cfg()
        mesh = make_mesh(8)
        step, state = _joint_setup(cfg, axis_name="data")
        dstep = shard_train_step(step, mesh, donate=False)
        batch = next(iter(HostLoader(synth, 16, pad_hw=(256, 384))))
        new_state, metrics = dstep(state, batch, jax.random.PRNGKey(0))
        assert np.isfinite(float(metrics["loss"]))
        assert np.isfinite(float(metrics["agent_loss"]))


class TestRewardSign:
    def test_reinforce_direction(self):
        """A bin forced to yield higher loss must gain probability mass
        (SURVEY.md §4.5)."""
        # Minimal REINFORCE reproduction of the agent update rule:
        # logits over 3 bins; bin 2 always gets advantage +1, others -1.
        logits = jnp.zeros((1, 3))
        params = {"w": logits}

        def objective(params, key):
            lp = jax.nn.log_softmax(params["w"], axis=-1)
            idx = jax.random.categorical(key, params["w"], axis=-1)
            sel = jnp.take_along_axis(lp, idx[:, None], axis=-1)[:, 0]
            adv = jnp.where(idx == 2, 1.0, -1.0)
            return -jnp.mean(jax.lax.stop_gradient(adv) * sel)

        key = jax.random.PRNGKey(0)
        p = params
        for i in range(200):
            key, sub = jax.random.split(key)
            g = jax.grad(objective)(p, sub)
            p = jax.tree.map(lambda a, b: a - 0.1 * b, p, g)
        probs = np.asarray(jax.nn.softmax(p["w"]))[0]
        assert probs[2] > 0.6, probs


class TestSplitJointStep:
    def test_split_matches_semantics(self, synth):
        """Split-program joint step runs and updates both nets (single-chip
        path of the epoch driver)."""
        from posetpu.train.adversarial import make_joint_step_split
        from posetpu.models import rotation_bin_table, scale_bin_table

        cfg = _tiny_cfg()
        model = hg(num_stacks=1, num_feats=16, num_classes=16)
        boxes = occlusion_hierarchy((64, 64), (1, 2))
        agent = AugAgent(
            num_scale_bins=5, num_rot_bins=5, num_occ_nodes=len(boxes),
            widths=(8, 16),
        )
        tx = make_optimizer(cfg.optim, 10)
        atx = make_optimizer(cfg.optim, 10)
        x = jnp.zeros((1, 64, 64, 3))
        pv = model.init(jax.random.PRNGKey(0), x, train=True)
        av = agent.init(jax.random.PRNGKey(1), x, train=True)
        state = JointState(
            pose=TrainState(
                params=pv["params"], batch_stats=pv["batch_stats"],
                opt_state=tx.init(pv["params"]), step=jnp.zeros((), jnp.int32),
            ),
            agent=TrainState(
                params=av["params"], batch_stats=av["batch_stats"],
                opt_state=atx.init(av["params"]), step=jnp.zeros((), jnp.int32),
            ),
            step=jnp.zeros((), jnp.int32),
        )
        step = make_joint_step_split(
            model, agent, tx, atx, cfg.aug, (0.2, 0.2, 0.2),
            scale_table=scale_bin_table(5), rot_table=rotation_bin_table(5),
            occ_boxes=boxes,
        )
        batch = next(iter(HostLoader(synth, 8, pad_hw=(256, 384))))
        new_state, metrics = step(state, batch, jax.random.PRNGKey(0))
        for k in ("loss", "acc", "agent_loss", "advantage", "entropy"):
            assert np.isfinite(float(metrics[k])), k
        d_pose = max(
            jax.tree.leaves(jax.tree.map(
                lambda a, b: float(jnp.abs(a - b).max()),
                state.pose.params, new_state.pose.params))
        )
        d_agent = max(
            jax.tree.leaves(jax.tree.map(
                lambda a, b: float(jnp.abs(a - b).max()),
                state.agent.params, new_state.agent.params))
        )
        assert d_pose > 0 and d_agent > 0
        assert int(new_state.step) == 1
