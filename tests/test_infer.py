"""Serving API tests: PosePredictor shape/coord contract, padding
invariance (the static-shape batch contract), and checkpoint loading for
both pose-only and joint layouts."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from posetpu.configs import OptimConfig, named_config
from posetpu.infer import PosePredictor, load_checkpoint_params
from posetpu.models import AugAgent, hg
from posetpu.train import JointState, TrainState
from posetpu.train.state import make_optimizer


def _tiny_predictor(seed=0):
    model = hg(num_stacks=1, num_feats=8, num_classes=4)
    v = model.init(jax.random.PRNGKey(seed), jnp.zeros((1, 64, 64, 3)), train=True)
    return PosePredictor(
        model,
        v["params"],
        v["batch_stats"],
        inp_res=(64, 64),
        out_res=(16, 16),
    )


def _batch(rng, B, hw=(128, 160)):
    H, W = hw
    return {
        "images": rng.randint(0, 255, (B, H, W, 3), dtype=np.uint8),
        "valid_wh": np.tile(np.array([[W, H]], np.int32), (B, 1)),
        "center": np.tile(np.array([[W / 2, H / 2]], np.float32), (B, 1)),
        "scale": np.full((B,), H / 200.0, np.float32),
    }


class TestPosePredictor:
    def test_output_contract(self):
        p = _tiny_predictor()
        rng = np.random.RandomState(0)
        b = _batch(rng, 3)
        out = p(b["images"], b["valid_wh"], b["center"], b["scale"])
        assert out["pred"].shape == (3, 4, 2)
        assert out["conf"].shape == (3, 4)
        assert out["heatmap_coords"].shape == (3, 4, 2)
        assert np.isfinite(out["pred"]).all()
        # heatmap coords are 1-indexed within the 16x16 map (+-0.25 offset)
        assert (out["heatmap_coords"] >= 0).all()
        assert (out["heatmap_coords"] <= 16.25).all()

    def test_padding_invariance(self):
        """Zero-padding to a larger static shape must not change the
        prediction — valid_wh masks the pad out of the warp."""
        p = _tiny_predictor()
        rng = np.random.RandomState(1)
        b = _batch(rng, 2, hw=(96, 112))
        out1 = p(b["images"], b["valid_wh"], b["center"], b["scale"])
        Hp, Wp = 160, 192
        padded = np.zeros((2, Hp, Wp, 3), np.uint8)
        padded[:, :96, :112] = b["images"]
        out2 = p(padded, b["valid_wh"], b["center"], b["scale"])
        np.testing.assert_allclose(out1["pred"], out2["pred"], atol=1e-4)
        np.testing.assert_allclose(out1["conf"], out2["conf"], atol=1e-5)

    @pytest.mark.parametrize("depth", [0, 2, 5])
    def test_predict_iter_matches_sequential(self, depth):
        """Pipelined prediction is the same numerics as per-batch calls,
        in order, for any in-flight depth (including depth > #batches)."""
        p = _tiny_predictor()
        batches = [_batch(np.random.RandomState(s), 2) for s in range(3)]
        seq = [
            p(b["images"], b["valid_wh"], b["center"], b["scale"])
            for b in batches
        ]
        piped = list(
            p.predict_iter(
                (
                    (b["images"], b["valid_wh"], b["center"], b["scale"])
                    for b in batches
                ),
                depth=depth,
            )
        )
        assert len(piped) == len(seq)
        for a, b in zip(seq, piped):
            assert set(a) == set(b)
            for k in a:
                np.testing.assert_array_equal(a[k], b[k])

    def test_predict_single_matches_batch(self):
        p = _tiny_predictor()
        rng = np.random.RandomState(2)
        b = _batch(rng, 1, hw=(100, 130))
        pred, conf = p.predict_single(
            b["images"][0], b["center"][0], float(b["scale"][0])
        )
        out = p(
            np.pad(b["images"], ((0, 0), (0, 28), (0, 62), (0, 0))),
            b["valid_wh"],
            b["center"],
            b["scale"],
        )
        np.testing.assert_allclose(pred, out["pred"][0], atol=1e-4)
        np.testing.assert_allclose(conf, out["conf"][0], atol=1e-5)


@pytest.mark.slow
class TestCheckpointLoading:
    def _pose_state(self, model, seed=0):
        v = model.init(
            jax.random.PRNGKey(seed), jnp.zeros((1, 64, 64, 3)), train=True
        )
        tx = make_optimizer(OptimConfig(), 10)
        return TrainState(
            params=v["params"],
            batch_stats=v["batch_stats"],
            opt_state=tx.init(v["params"]),
            step=jnp.zeros((), jnp.int32),
        )

    def test_pose_only_checkpoint(self, tmp_path):
        from posetpu.ckpt import CheckpointManager

        model = hg(num_stacks=1, num_feats=8, num_classes=4)
        state = self._pose_state(model)
        mgr = CheckpointManager(str(tmp_path))
        mgr.save(state, epoch=1, best_acc=0.4, is_best=True)
        mgr.wait()
        params, bs, epoch, best = load_checkpoint_params(
            str(tmp_path) + "/best"
        )
        assert epoch == 1 and best == pytest.approx(0.4)
        for a, b in zip(
            jax.tree.leaves(state.params), jax.tree.leaves(params)
        ):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_joint_checkpoint_serves_pose_net(self, tmp_path):
        from posetpu.ckpt import CheckpointManager

        model = hg(num_stacks=1, num_feats=8, num_classes=4)
        pose = self._pose_state(model)
        agent = AugAgent(num_scale_bins=3, num_rot_bins=3, widths=(4, 8))
        av = agent.init(
            jax.random.PRNGKey(1), jnp.zeros((1, 64, 64, 3)), train=True
        )
        atx = make_optimizer(OptimConfig(), 10)
        joint = JointState(
            pose=pose,
            agent=TrainState(
                params=av["params"],
                batch_stats=av["batch_stats"],
                opt_state=atx.init(av["params"]),
                step=jnp.zeros((), jnp.int32),
            ),
            step=jnp.zeros((), jnp.int32),
        )
        mgr = CheckpointManager(str(tmp_path))
        mgr.save(joint, epoch=2, best_acc=0.3)
        mgr.wait()
        params, bs, epoch, _ = load_checkpoint_params(mgr.latest_path())
        assert epoch == 2
        for a, b in zip(
            jax.tree.leaves(pose.params), jax.tree.leaves(params)
        ):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_from_config_end_to_end(self, tmp_path):
        from posetpu.ckpt import CheckpointManager

        cfg = named_config("hg2_mpii_mini")
        cfg.model.stacks = 1
        cfg.model.feats = 8
        cfg.aug.inp_res = (64, 64)
        cfg.aug.out_res = (16, 16)
        model = hg(
            num_stacks=1,
            num_feats=8,
            num_classes=cfg.model.classes,
            dtype=jnp.bfloat16,
        )
        state = self._pose_state(model)
        mgr = CheckpointManager(str(tmp_path))
        mgr.save(state, epoch=1, best_acc=0.1, is_best=True)
        mgr.wait()
        p = PosePredictor.from_config(cfg, str(tmp_path))
        rng = np.random.RandomState(3)
        b = _batch(rng, 2)
        out = p(b["images"], b["valid_wh"], b["center"], b["scale"])
        assert out["pred"].shape == (2, cfg.model.classes, 2)
        assert np.isfinite(out["pred"]).all()

    def test_best_false_falls_back_to_best_only_dir(self, tmp_path):
        """A directory holding only best/ (epoch ckpts pruned) must load
        via best/ even with best=False, not fail on the parent dir."""
        import shutil

        from posetpu.ckpt import CheckpointManager

        cfg = named_config("hg2_mpii_mini")
        cfg.model.stacks = 1
        cfg.model.feats = 8
        cfg.aug.inp_res = (64, 64)
        cfg.aug.out_res = (16, 16)
        model = hg(
            num_stacks=1,
            num_feats=8,
            num_classes=cfg.model.classes,
            dtype=jnp.bfloat16,
        )
        state = self._pose_state(model)
        mgr = CheckpointManager(str(tmp_path))
        mgr.save(state, epoch=1, best_acc=0.1, is_best=True)
        mgr.wait()
        shutil.rmtree(str(tmp_path / "ckpt"))
        p = PosePredictor.from_config(cfg, str(tmp_path), best=False)
        rng = np.random.RandomState(3)
        b = _batch(rng, 2)
        out = p(b["images"], b["valid_wh"], b["center"], b["scale"])
        assert np.isfinite(out["pred"]).all()


class TestWarpTableKnob:
    def test_packed32_identical_predictions(self):
        # serving shares the train path's bit-exact packed32 lever
        model = hg(num_stacks=1, num_feats=8, num_classes=4)
        v = model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), train=True
        )
        kw = dict(inp_res=(64, 64), out_res=(16, 16))
        p_u8 = PosePredictor(model, v["params"], v["batch_stats"], **kw)
        p_32 = PosePredictor(
            model, v["params"], v["batch_stats"], warp_table="packed32", **kw
        )
        b = _batch(np.random.RandomState(3), 2)
        a = p_u8(b["images"], b["valid_wh"], b["center"], b["scale"])
        c = p_32(b["images"], b["valid_wh"], b["center"], b["scale"])
        for k in a:
            np.testing.assert_array_equal(a[k], c[k], err_msg=k)
