"""System-level integration tests: the adversarial agent genuinely learns
to prefer harder augmentation bins (SURVEY.md §2 C7 semantics), the five
named configs build, and config 5 (384², DP-8, agent) runs end-to-end on
the virtual mesh."""

import os

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from posetpu.configs import NAMED_CONFIGS, named_config
from posetpu.data import HostLoader, MpiiDataset, make_synthetic_dataset
from posetpu.models import AugAgent, scale_bin_table
from posetpu.train import JointState, TrainState, make_joint_step
from posetpu.train.state import make_optimizer
from posetpu.configs import OptimConfig


@pytest.fixture(scope="module")
def synth(tmp_path_factory):
    d = tmp_path_factory.mktemp("synth_integ")
    make_synthetic_dataset(str(d), num_train=16, num_val=8, res=(320, 240))
    return MpiiDataset(
        os.path.join(d, "annotations.json"),
        os.path.join(d, "images"),
        split="train",
    )


class ZeroPose(nn.Module):
    """Pose stub that always predicts zeros: per-sample loss equals the
    target energy, which depends ONLY on the sampled augmentation — a
    controlled reward landscape for testing the REINFORCE direction."""

    classes: int = 16
    out_hw: int = 16

    @nn.compact
    def __call__(self, x, train=True):
        w = self.param("w", nn.initializers.zeros, (1,))
        bs = self.variable("batch_stats", "n", lambda: jnp.zeros(()))
        del bs
        B = x.shape[0]
        out = jnp.zeros((B, self.out_hw, self.out_hw, self.classes)) + 0.0 * w[0]
        return [out]


@pytest.mark.slow
class TestAgentLearnsHardBins:
    def test_mass_shifts_to_hardest_scale_bin(self, synth):
        cfg = named_config("hg2_mpii_mini")
        cfg.aug.inp_res = (64, 64)
        cfg.aug.out_res = (16, 16)
        cfg.aug.color_jitter = False
        cfg.aug.flip_prob = 0.0

        pose = ZeroPose()
        agent = AugAgent(
            num_scale_bins=3, num_rot_bins=3, widths=(8,), axis_name=None
        )
        # zoom-in bins: x0.35 clips most joints off the heatmap (low target
        # energy => easy for the zero-model), x1 keeps them all (hard)
        scale_table = scale_bin_table(3, -1.5, 0.0)
        rot_table = np.zeros(3, np.float32)

        pose_tx = make_optimizer(OptimConfig(lr=0.0), 10)  # frozen pose
        agent_tx = make_optimizer(OptimConfig(lr=3e-3), 10)
        x = jnp.zeros((1, 64, 64, 3))
        pv = pose.init(jax.random.PRNGKey(0), x, train=True)
        av = agent.init(jax.random.PRNGKey(1), x, train=True)
        state = JointState(
            pose=TrainState(
                params=pv["params"],
                batch_stats=pv["batch_stats"],
                opt_state=pose_tx.init(pv["params"]),
                step=jnp.zeros((), jnp.int32),
            ),
            agent=TrainState(
                params=av["params"],
                batch_stats=av["batch_stats"],
                opt_state=agent_tx.init(av["params"]),
                step=jnp.zeros((), jnp.int32),
            ),
            step=jnp.zeros((), jnp.int32),
        )
        step = jax.jit(
            make_joint_step(
                pose,
                agent,
                pose_tx,
                agent_tx,
                cfg.aug,
                (0.2, 0.2, 0.2),
                scale_table=scale_table,
                rot_table=rot_table,
                baseline="sign",
            )
        )
        batch = next(iter(HostLoader(synth, 16, pad_hw=(256, 384), seed=0)))

        # Ground truth: which scale bin actually yields the highest loss for
        # the zero-model?  Compute target energy per forced bin.
        from posetpu.aug import AugParams, augment_batch

        energies = []
        for b in range(3):
            aug = augment_batch(
                jnp.asarray(batch["image"]),
                jnp.asarray(batch["valid_wh"]),
                jnp.asarray(batch["center"]),
                jnp.asarray(batch["scale"]),
                jnp.asarray(batch["pts"]),
                jnp.asarray(batch["vis"]),
                AugParams(
                    scale_factor=jnp.full((16,), float(scale_table[b])),
                    rot=jnp.zeros((16,)),
                    flip=jnp.zeros((16,), bool),
                ),
                inp_res=(64, 64),
                out_res=(16, 16),
            )
            energies.append(float(jnp.mean(aug["target"] ** 2)))
        hardest = int(np.argmax(energies))
        assert max(energies) > 1.02 * sorted(energies)[-2], energies

        key = jax.random.PRNGKey(0)
        for _ in range(60):
            key, sub = jax.random.split(key)
            state, metrics = step(state, batch, sub)

        # evaluate the learned policy on the actual neutral crops
        from posetpu.aug import neutral_params

        aug_n = augment_batch(
            jnp.asarray(batch["image"]),
            jnp.asarray(batch["valid_wh"]),
            jnp.asarray(batch["center"]),
            jnp.asarray(batch["scale"]),
            jnp.asarray(batch["pts"]),
            jnp.asarray(batch["vis"]),
            neutral_params(16),
            inp_res=(64, 64),
            out_res=(16, 16),
            mean=(0.2, 0.2, 0.2),
        )
        logits = agent.apply(
            {
                "params": state.agent.params,
                "batch_stats": state.agent.batch_stats,
            },
            aug_n["input"],
            train=False,
        )
        probs = np.asarray(jax.nn.softmax(logits["scale"], axis=-1)).mean(0)
        assert probs[hardest] > 1.0 / 3 + 0.1, (probs, hardest, energies)


class TestNamedConfigs:
    def test_all_configs_instantiate(self):
        for name in NAMED_CONFIGS:
            cfg = named_config(name)
            assert cfg.name == name
            assert cfg.model.stacks >= 1

    @pytest.mark.slow
    def test_config5_dp8_end_to_end(self, synth, tmp_path):
        """Config 5 shape (384² + agent + 8-device DP), scaled tiny."""
        from posetpu.train.loop import Experiment

        cfg = named_config("hg8_mpii_384_dp8")
        cfg.model.stacks = 1
        cfg.model.feats = 8
        cfg.aug.inp_res = (64, 64)
        cfg.aug.out_res = (16, 16)
        cfg.batch_size = 16
        cfg.num_devices = 8
        cfg.synthetic = False
        cfg.annotations = synth.samples[0].img_path.rsplit("/images", 1)[0] + "/annotations.json"
        cfg.images_dir = os.path.dirname(synth.samples[0].img_path)
        cfg.pad_hw = (256, 384)
        cfg.optim.epochs = 1
        cfg.steps_per_epoch = 1
        cfg.checkpoint_dir = str(tmp_path)
        exp = Experiment(cfg)
        assert exp.dp and exp.mesh is not None
        state, best = exp.fit(progress=lambda *_: None)
        assert np.isfinite(best)
        # joint state (agent enabled in config 5)
        assert hasattr(state, "agent")

    @pytest.mark.slow
    def test_experiment_parts_aho_end_to_end(self, synth, tmp_path):
        """Body-part AHO (occ_mode='parts') through the full Experiment
        wiring: no static box table, per-sample keypoint-derived occluders
        inside the joint step (SURVEY.md C13)."""
        from posetpu.train.loop import Experiment

        cfg = named_config("hg2_mpii_mini")
        cfg.model.stacks = 1
        cfg.model.feats = 8
        cfg.aug.inp_res = (64, 64)
        cfg.aug.out_res = (16, 16)
        cfg.agent.enabled = True
        cfg.agent.occ_mode = "parts"
        cfg.agent.occ_nodes = 9  # 1 + 2 + 6 (PART_GROUPS["mpii"])
        cfg.batch_size = 8
        cfg.synthetic = False
        cfg.annotations = synth.samples[0].img_path.rsplit("/images", 1)[0] + "/annotations.json"
        cfg.images_dir = os.path.dirname(synth.samples[0].img_path)
        cfg.pad_hw = (256, 384)
        cfg.optim.epochs = 1
        cfg.steps_per_epoch = 2
        cfg.checkpoint_dir = str(tmp_path)
        exp = Experiment(cfg)
        assert exp.occ_boxes is None  # parts mode: boxes derive in-step
        state, best = exp.fit(progress=lambda *_: None)
        assert np.isfinite(best)
        assert hasattr(state, "agent")


class TestExperimentGuards:
    def test_num_devices_over_available_raises(self, synth, tmp_path):
        """A config demanding more devices than visible fails fast with an
        actionable message instead of silently running single-chip."""
        from posetpu.train.loop import Experiment

        cfg = named_config("hg2_mpii_mini")
        cfg.model.stacks = 1
        cfg.model.feats = 8
        cfg.batch_size = 32
        cfg.num_devices = 99
        cfg.synthetic = False
        cfg.annotations = synth.samples[0].img_path.rsplit("/images", 1)[0] + "/annotations.json"
        cfg.images_dir = os.path.dirname(synth.samples[0].img_path)
        cfg.checkpoint_dir = str(tmp_path)
        with pytest.raises(RuntimeError, match="num_devices=99"):
            Experiment(cfg)

    def test_agent_optimizer_follows_experiment_schedule(
        self, synth, tmp_path, monkeypatch
    ):
        """The agent's optimizer copies the experiment's OptimConfig with
        only lr swapped (it was silently built from defaults, so --schedule
        moved the pose lr while the agent kept (60, 90))."""
        import posetpu.train.loop as loop_mod
        from posetpu.train.loop import Experiment
        from posetpu.train.state import make_optimizer

        calls = []

        def spy(optim_cfg, steps_per_epoch=1):
            calls.append(optim_cfg)
            return make_optimizer(optim_cfg, steps_per_epoch)

        monkeypatch.setattr(loop_mod, "make_optimizer", spy)
        cfg = named_config("hg2_mpii_mini")
        cfg.model.stacks = 1
        cfg.model.feats = 8
        cfg.aug.inp_res = (64, 64)
        cfg.aug.out_res = (16, 16)
        cfg.agent.enabled = True
        cfg.agent.lr = 1e-3
        cfg.batch_size = 4
        cfg.num_devices = 1
        cfg.optim.schedule = (7, 11)
        cfg.synthetic = False
        cfg.annotations = synth.samples[0].img_path.rsplit("/images", 1)[0] + "/annotations.json"
        cfg.images_dir = os.path.dirname(synth.samples[0].img_path)
        cfg.pad_hw = (256, 384)
        cfg.checkpoint_dir = str(tmp_path)
        Experiment(cfg)
        agent_cfgs = [c for c in calls if c.lr == 1e-3]
        assert agent_cfgs, "agent optimizer not built via make_optimizer"
        assert tuple(agent_cfgs[0].schedule) == (7, 11)


class TestObservability:
    @pytest.mark.slow
    def test_tensorboard_and_config_dump(self, synth, tmp_path):
        """cfg.tensorboard writes clu event files next to the reference
        txt log (SURVEY.md §1 L7 mapping), and every Experiment dumps its
        resolved config.json for reproducibility."""
        import glob
        import json

        from posetpu.train.loop import Experiment

        cfg = named_config("hg2_mpii_mini")
        cfg.model.stacks = 1
        cfg.model.feats = 8
        cfg.aug.inp_res = (64, 64)
        cfg.aug.out_res = (16, 16)
        cfg.batch_size = 4
        cfg.num_devices = 1
        cfg.synthetic = False
        cfg.annotations = synth.samples[0].img_path.rsplit("/images", 1)[0] + "/annotations.json"
        cfg.images_dir = os.path.dirname(synth.samples[0].img_path)
        cfg.pad_hw = (256, 384)
        cfg.optim.epochs = 1
        cfg.steps_per_epoch = 1
        cfg.checkpoint_dir = str(tmp_path)
        cfg.tensorboard = True
        exp = Experiment(cfg)
        exp.fit(progress=lambda *_: None)
        run_dir = os.path.join(str(tmp_path), cfg.name)
        events = glob.glob(os.path.join(run_dir, "tb", "events.*"))
        assert events, "no TensorBoard event files written"
        with open(os.path.join(run_dir, "config.json")) as f:
            dumped = json.load(f)
        assert dumped["name"] == cfg.name
        assert dumped["model"]["stacks"] == 1
        assert dumped["tensorboard"] is True
        assert os.path.exists(os.path.join(run_dir, "log.txt"))


class TestPadHwCheck:
    def test_warns_when_person_outruns_window(self, synth, tmp_path):
        import warnings

        from posetpu.train.loop import Experiment

        cfg = named_config("hg2_mpii_mini")
        cfg.model.stacks = 1
        cfg.model.feats = 8
        cfg.aug.inp_res = (64, 64)
        cfg.aug.out_res = (16, 16)
        cfg.batch_size = 4
        cfg.num_devices = 1
        cfg.synthetic = False
        cfg.annotations = synth.samples[0].img_path.rsplit("/images", 1)[0] + "/annotations.json"
        cfg.images_dir = os.path.dirname(synth.samples[0].img_path)
        cfg.pad_hw = (64, 64)  # far smaller than any person box
        cfg.optim.epochs = 1
        cfg.steps_per_epoch = 1
        cfg.checkpoint_dir = str(tmp_path)
        with warnings.catch_warnings(record=True) as w:
            warnings.simplefilter("always")
            Experiment(cfg)
        assert any("pad_hw" in str(x.message) for x in w)

        cfg2 = named_config("hg2_mpii_mini")
        cfg2.model.stacks = 1
        cfg2.model.feats = 8
        cfg2.batch_size = 4
        cfg2.num_devices = 1
        cfg2.synthetic = False
        cfg2.annotations = cfg.annotations
        cfg2.images_dir = cfg.images_dir
        cfg2.pad_hw = (1024, 1024)  # generous window: silent
        cfg2.steps_per_epoch = 1
        cfg2.checkpoint_dir = str(tmp_path / "b")
        with warnings.catch_warnings(record=True) as w:
            warnings.simplefilter("always")
            Experiment(cfg2)
        assert not any("pad_hw" in str(x.message) for x in w)


class TestGrainLoader:
    def test_same_contract_as_hostloader(self, synth):
        from posetpu.data.grain_pipeline import GrainLoader

        gl = GrainLoader(synth, 4, pad_hw=(256, 384), shuffle=False)
        hl = HostLoader(
            synth, 4, pad_hw=(256, 384), shuffle=False, backend="pil"
        )
        bg = next(iter(gl))
        bh = next(iter(hl))
        assert set(bg) == set(bh)
        for k in bh:
            assert bg[k].shape == bh[k].shape, k
            assert bg[k].dtype == bh[k].dtype, k
        np.testing.assert_array_equal(bg["image"], bh["image"])

    @pytest.mark.slow
    def test_experiment_runs_on_grain_backend(self, synth, tmp_path):
        """loader_backend='grain' is a drop-in Experiment backend
        (SURVEY.md §2 C15 alternative input pipeline)."""
        from posetpu.train.loop import Experiment

        cfg = named_config("hg2_mpii_mini")
        cfg.model.stacks = 1
        cfg.model.feats = 8
        cfg.aug.inp_res = (64, 64)
        cfg.aug.out_res = (16, 16)
        cfg.batch_size = 8
        cfg.synthetic = False
        cfg.annotations = (
            synth.samples[0].img_path.rsplit("/images", 1)[0]
            + "/annotations.json"
        )
        cfg.images_dir = os.path.dirname(synth.samples[0].img_path)
        cfg.pad_hw = (256, 384)
        cfg.optim.epochs = 2  # two epochs: proves grain re-iterates
        cfg.steps_per_epoch = 1
        cfg.checkpoint_dir = str(tmp_path)
        cfg.loader_backend = "grain"
        exp = Experiment(cfg)
        state, best = exp.fit(progress=lambda *_: None)
        assert np.isfinite(best)


@pytest.mark.slow
class TestPhase2Flow:
    def test_init_pose_from_checkpoint(self, synth, tmp_path):
        """Reference phase-2: joint training starts from a phase-1 pose
        checkpoint (SURVEY.md §3.2 'load pretrained pose net')."""
        from posetpu.train.loop import Experiment

        ann = synth.samples[0].img_path.rsplit("/images", 1)[0] + "/annotations.json"
        imgs = os.path.dirname(synth.samples[0].img_path)

        def base_cfg(name, agent_on):
            cfg = named_config("hg2_mpii_mini")
            cfg.name = name
            cfg.model.stacks = 1
            cfg.model.feats = 8
            cfg.aug.inp_res = (64, 64)
            cfg.aug.out_res = (16, 16)
            cfg.batch_size = 8
            cfg.synthetic = False
            cfg.annotations = ann
            cfg.images_dir = imgs
            cfg.pad_hw = (256, 384)
            cfg.optim.epochs = 1
            cfg.steps_per_epoch = 1
            cfg.checkpoint_dir = str(tmp_path)
            cfg.agent.enabled = agent_on
            return cfg

        # phase 1: one epoch of baseline training -> checkpoint
        exp1 = Experiment(base_cfg("p1", False))
        exp1.fit(progress=lambda *_: None)
        p1_dir = os.path.join(tmp_path, "p1")

        # phase 2: joint training initialized from the phase-1 checkpoint
        cfg2 = base_cfg("p2", True)
        cfg2.init_pose_from = p1_dir
        exp2 = Experiment(cfg2)
        p1_leaf = np.asarray(jax.tree.leaves(exp1.state.params)[0])
        p2_leaf = np.asarray(jax.tree.leaves(exp2.state.pose.params)[0])
        np.testing.assert_array_equal(p1_leaf, p2_leaf)
        state, best = exp2.fit(progress=lambda *_: None)
        assert np.isfinite(best)


class TestStepsPerDispatch:
    """steps_per_dispatch=K through the full Experiment wiring: the loader
    groups K batches, train_epoch drives the fused lax.scan step, and the
    trained state matches the K=1 run (same seeds -> same batches and the
    same PRNG chain)."""

    @pytest.mark.slow
    def test_fused_epoch_matches_per_step_epoch(self, synth, tmp_path):
        from posetpu.train.loop import Experiment

        def run(k, name):
            cfg = named_config("hg2_mpii_mini")
            cfg.model.stacks = 1
            cfg.model.feats = 8
            cfg.model.bf16 = False  # exact-math comparison
            cfg.aug.inp_res = (64, 64)
            cfg.aug.out_res = (16, 16)
            cfg.batch_size = 4
            cfg.synthetic = False
            cfg.annotations = synth.samples[0].img_path.rsplit(
                "/images", 1
            )[0] + "/annotations.json"
            cfg.images_dir = os.path.dirname(synth.samples[0].img_path)
            cfg.pad_hw = (256, 384)
            cfg.optim.epochs = 1
            # cap 3 with K=2 also exercises the trim-at-cap path (the
            # second group of 2 is sliced to 1 inside train_epoch); kept
            # to 3 optimizer steps because fp reassociation noise between
            # the scanned and standalone step programs is amplified
            # through RMSprop's eps-dominated early second moments
            cfg.steps_per_epoch = 3
            cfg.num_devices = 1
            cfg.steps_per_dispatch = k
            cfg.checkpoint_dir = str(tmp_path / name)
            cfg.name = name
            exp = Experiment(cfg)
            state, best = exp.fit(progress=lambda *_: None)
            return state

        s1 = run(1, "k1")
        s2 = run(2, "k2")
        assert int(s1.step) == int(s2.step) == 3
        # wiring test, not an exactness proof (that is
        # test_train_step.py::TestFusedDispatch): three RMSprop steps with
        # eps-dominated second moments amplify the scanned-vs-standalone
        # program's fp reassociation noise to ~5e-4 on isolated elements
        for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=1e-3, rtol=1e-2
            )

    def test_single_chip_joint_split_rejects_fusion(self, synth, tmp_path):
        from posetpu.train.loop import Experiment

        cfg = named_config("hg2_mpii_mini")
        cfg.model.stacks = 1
        cfg.model.feats = 8
        cfg.aug.inp_res = (64, 64)
        cfg.aug.out_res = (16, 16)
        cfg.agent.enabled = True
        cfg.batch_size = 4
        cfg.synthetic = False
        cfg.annotations = synth.samples[0].img_path.rsplit(
            "/images", 1
        )[0] + "/annotations.json"
        cfg.images_dir = os.path.dirname(synth.samples[0].img_path)
        cfg.num_devices = 1
        cfg.steps_per_dispatch = 4
        cfg.checkpoint_dir = str(tmp_path)
        with pytest.raises(ValueError, match="steps_per_dispatch"):
            Experiment(cfg)


class TestAutoPadHw:
    """pad_hw=None (the default) auto-sizes the pre-pad window from the
    annotation scan so the too-small warning path is unreachable on any
    schema-valid dataset (VERDICT r2 item 4)."""

    def test_auto_sizes_and_never_warns(self, synth, tmp_path):
        import warnings

        from posetpu.train.loop import Experiment

        cfg = named_config("hg2_mpii_mini")
        cfg.model.stacks = 1
        cfg.model.feats = 8
        cfg.aug.inp_res = (64, 64)
        cfg.aug.out_res = (16, 16)
        cfg.batch_size = 4
        cfg.num_devices = 1
        cfg.synthetic = False
        cfg.annotations = synth.samples[0].img_path.rsplit(
            "/images", 1
        )[0] + "/annotations.json"
        cfg.images_dir = os.path.dirname(synth.samples[0].img_path)
        assert cfg.pad_hw is None  # auto is the default
        cfg.steps_per_epoch = 1
        cfg.checkpoint_dir = str(tmp_path)
        with warnings.catch_warnings(record=True) as w:
            warnings.simplefilter("always")
            exp = Experiment(cfg)
        assert not any("pad_hw" in str(x.message) for x in w)
        ph, pw = exp.cfg.pad_hw
        box = exp._worst_case_box()
        mh, mw = exp.train_ds.max_image_hw()
        assert ph % 64 == 0 and pw % 64 == 0
        # per-axis: covers the worst-case crop footprint, capped at the
        # largest real image (beyond it the warp's valid_wh masking
        # already implies zeros — extra canvas is pure H2D waste)
        assert ph >= min(box, mh) and pw >= min(box, mw)
        assert ph <= max(256, -(-mh // 64) * 64) or ph <= -(-int(box) // 64) * 64

    def test_worst_case_box_includes_rotation_expansion(self, synth, tmp_path):
        from posetpu.train.loop import Experiment

        def build(rot_prob):
            cfg = named_config("hg2_mpii_mini")
            cfg.model.stacks = 1
            cfg.model.feats = 8
            cfg.aug.inp_res = (64, 64)
            cfg.aug.out_res = (16, 16)
            cfg.batch_size = 4
            cfg.num_devices = 1
            cfg.synthetic = False
            cfg.annotations = synth.samples[0].img_path.rsplit(
                "/images", 1
            )[0] + "/annotations.json"
            cfg.images_dir = os.path.dirname(synth.samples[0].img_path)
            cfg.aug.rot_prob = rot_prob
            cfg.steps_per_epoch = 1
            cfg.checkpoint_dir = str(tmp_path / f"rp{rot_prob}")
            cfg.name = f"rp{rot_prob}"
            return Experiment(cfg)

        # default rot_factor=30 -> clipped max 60 deg -> sqrt(2) bound
        with_rot = build(0.6)._worst_case_box()
        without = build(0.0)._worst_case_box()
        np.testing.assert_allclose(with_rot / without, np.sqrt(2.0), rtol=1e-6)


class TestJointFusedSingleChip:
    """agent.fused_step='fused' routes the single-chip joint path onto the
    monolithic make_joint_step (round-3 re-adjudication: ~10 min TPU
    compile but faster, scannable steps) and composes with
    steps_per_dispatch."""

    @pytest.mark.slow
    def test_fused_joint_with_steps_per_dispatch(self, synth, tmp_path):
        from posetpu.train.loop import Experiment

        cfg = named_config("hg2_mpii_mini")
        cfg.model.stacks = 1
        cfg.model.feats = 8
        cfg.aug.inp_res = (64, 64)
        cfg.aug.out_res = (16, 16)
        cfg.agent.enabled = True
        cfg.agent.fused_step = "fused"
        cfg.batch_size = 4
        cfg.synthetic = False
        cfg.annotations = synth.samples[0].img_path.rsplit(
            "/images", 1
        )[0] + "/annotations.json"
        cfg.images_dir = os.path.dirname(synth.samples[0].img_path)
        cfg.num_devices = 1
        cfg.steps_per_dispatch = 2
        cfg.optim.epochs = 1
        cfg.steps_per_epoch = 2
        cfg.checkpoint_dir = str(tmp_path)
        exp = Experiment(cfg)
        assert exp.joint_fused and not exp.dp
        state, best = exp.fit(progress=lambda *_: None)
        assert np.isfinite(best)
        assert int(state.step) == 2
        assert hasattr(state, "agent")

    def test_bad_fused_step_value_rejected(self, synth, tmp_path):
        from posetpu.train.loop import Experiment

        cfg = named_config("hg2_mpii_mini")
        cfg.agent.fused_step = "monolith"
        cfg.num_devices = 1
        cfg.batch_size = 4
        cfg.synthetic = False
        cfg.annotations = synth.samples[0].img_path.rsplit(
            "/images", 1
        )[0] + "/annotations.json"
        cfg.images_dir = os.path.dirname(synth.samples[0].img_path)
        cfg.checkpoint_dir = str(tmp_path)
        with pytest.raises(ValueError, match="fused_step"):
            Experiment(cfg)


@pytest.mark.slow
class TestRealMpiiReadinessDrill:
    """Day-1-real-data drill (round-3 verdict item 6): annotations in the
    exact reference MPII schema WITH official head rectangles ->
    posetpu-train CLI -> tools/evaluate.py -> preds.mat, asserting the
    OFFICIAL-protocol PCKh branch (head_rect) is exercised rather than the
    keypoint fallback.  When real MPII annotations appear, this is the
    path they take with zero untested seams."""

    def _fixture(self, tmp_path):
        root = tmp_path / "mpii_like"
        ann = make_synthetic_dataset(
            str(root), num_train=12, num_val=6, res=(320, 240),
            head_rects=True,
        )
        return root, ann

    def test_official_normalizer_differs_from_fallback(self, tmp_path):
        import importlib.util

        spec = importlib.util.spec_from_file_location(
            "tools_evaluate",
            os.path.join(os.path.dirname(os.path.dirname(__file__)),
                         "tools", "evaluate.py"),
        )
        ev = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(ev)

        root, ann = self._fixture(tmp_path)
        val = MpiiDataset(ann, os.path.join(str(root), "images"),
                          split="valid")
        n = len(val)
        assert n == 6
        gts = np.stack([val.meta(i)[2] for i in range(n)])
        sizes = ev.head_sizes(val, gts, "mpii")
        fallback = ev.head_sizes_from_pts(gts, "mpii")
        # every sample carries a head box, and the official 0.6*diag
        # normalizer is what comes back — NOT the 1.2*segment fallback
        for i in range(n):
            official = val.head_size(i)
            assert official is not None
            np.testing.assert_allclose(sizes[i], max(official, 1.0), rtol=1e-6)
        assert np.all(np.abs(sizes - fallback) / fallback > 0.02), (
            sizes, fallback,
        )

    def test_train_then_official_eval_to_preds_mat(self, tmp_path, capsys):
        import importlib.util

        from scipy.io import loadmat

        from posetpu.train import cli

        root, ann = self._fixture(tmp_path)
        ckpt = str(tmp_path / "ckpt")
        common = [
            "--json", ann,
            "--image-path", os.path.join(str(root), "images"),
            "--checkpoint", ckpt,
            "--stacks", "1", "--features", "8", "--train-batch", "4",
            "--num-devices", "1",
        ]
        rc = cli.main([
            "--config", "hg2_mpii_mini", "--cpu",
            "--epochs", "1", "--steps-per-epoch", "2", *common,
        ])
        assert rc == 0

        spec = importlib.util.spec_from_file_location(
            "tools_evaluate",
            os.path.join(os.path.dirname(os.path.dirname(__file__)),
                         "tools", "evaluate.py"),
        )
        ev = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(ev)
        # --cpu also skips evaluate's backend probe (which would otherwise
        # spawn a subprocess targeting the pinned axon tunnel mid-test)
        pckh = ev.main(["--config", "hg2_mpii_mini", "--best", "--cpu",
                        *common])
        out = capsys.readouterr().out
        assert np.isfinite(pckh) and 0.0 <= pckh <= 100.0
        # all-official head boxes: the mixed-sources warning must NOT fire
        assert "keypoint-approximated" not in out
        assert "PCKh@0.5" in out
        mat = loadmat(os.path.join(ckpt, "hg2_mpii_mini", "preds.mat"))
        assert mat["preds"].shape == (6, 16, 2)
