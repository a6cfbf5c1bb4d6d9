"""Train-step integration tests (SURVEY.md §4.3/§4.4): the fused jitted step
learns on the synthetic mini-split, and the shard_map DP step is numerically
equivalent to the single-device step on the merged batch."""

import dataclasses
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from posetpu.configs import named_config
from posetpu.data import HostLoader, MpiiDataset, make_synthetic_dataset
from posetpu.models import hg
from posetpu.parallel import make_mesh, shard_eval_step, shard_train_step
from posetpu.train.state import TrainState, make_optimizer
from posetpu.train.step import make_eval_step, make_train_step


@pytest.fixture(scope="module")
def synth(tmp_path_factory):
    d = tmp_path_factory.mktemp("synth_train")
    make_synthetic_dataset(str(d), num_train=16, num_val=8, res=(320, 240))
    ds = MpiiDataset(
        os.path.join(d, "annotations.json"),
        os.path.join(d, "images"),
        split="train",
    )
    return ds


def _setup(cfg, seed=0):
    model = hg(
        num_stacks=cfg.model.stacks,
        num_blocks=cfg.model.blocks,
        num_classes=cfg.model.classes,
        num_feats=cfg.model.feats,
    )
    x = jnp.zeros((1, *cfg.aug.inp_res, 3))
    variables = model.init(jax.random.PRNGKey(seed), x, train=True)
    tx = make_optimizer(cfg.optim, steps_per_epoch=10)
    state = TrainState(
        params=variables["params"],
        batch_stats=variables["batch_stats"],
        opt_state=tx.init(variables["params"]),
        step=jnp.zeros((), jnp.int32),
    )
    return model, tx, state


def _tiny_cfg(**kw):
    cfg = named_config("hg2_mpii_mini")
    cfg.model.stacks = 1
    cfg.model.feats = 16
    cfg.aug.inp_res = (64, 64)
    cfg.aug.out_res = (16, 16)
    for k, v in kw.items():
        head, _, leaf = k.partition(".")
        if leaf:
            setattr(getattr(cfg, head), leaf, v)
        else:
            setattr(cfg, head, v)
    return cfg


MEAN = (0.2, 0.2, 0.2)


class TestTrainStep:
    @pytest.mark.slow
    def test_loss_decreases(self, synth):
        cfg = _tiny_cfg()
        model, tx, state = _setup(cfg)
        step = jax.jit(make_train_step(model, tx, cfg.aug, MEAN))
        loader = HostLoader(synth, 8, pad_hw=(256, 384), seed=0)
        losses = []
        key = jax.random.PRNGKey(0)
        for epoch in range(6):
            for batch in loader:
                key, sub = jax.random.split(key)
                state, metrics = step(state, batch, sub)
                losses.append(float(metrics["loss"]))
        assert losses[-1] < losses[0] * 0.8, (losses[0], losses[-1])
        assert int(state.step) == len(losses)

    @pytest.mark.slow
    def test_eval_step_shapes(self, synth):
        cfg = _tiny_cfg()
        model, tx, state = _setup(cfg)
        ev = jax.jit(make_eval_step(model, cfg.aug, MEAN))
        batch = next(iter(HostLoader(synth, 4, pad_hw=(256, 384))))
        metrics, preds = ev(state, batch)
        assert preds.shape == (4, 16, 2)
        assert np.isfinite(float(metrics["loss"]))
        assert 0.0 <= float(metrics["acc"]) <= 1.0

    @pytest.mark.slow
    def test_eval_preds_in_original_frame_under_crop(self, synth):
        """When an image exceeds pad_hw the loader takes an integer crop
        window and shifts center/pts; eval predictions must come back in
        the ORIGINAL image frame (where annotations and preds.mat live),
        identical to the uncropped-window run on the same samples."""
        cfg = _tiny_cfg()
        model, tx, state = _setup(cfg)
        ev = jax.jit(make_eval_step(model, cfg.aug, MEAN))
        # 320x240 images: (256, 384) holds them whole; (240, 256) forces
        # an x-crop (window still covers every person's crop box:
        # box = 200*s_adj <= 1.25*0.8*240 = 240 <= 256)
        big = next(iter(HostLoader(synth, 8, pad_hw=(256, 384), seed=5)))
        small = next(iter(HostLoader(synth, 8, pad_hw=(240, 256), seed=5)))
        np.testing.assert_array_equal(big["index"], small["index"])
        assert (small["offset"] != 0).any()  # the crop actually engaged
        np.testing.assert_allclose(
            small["center"] + small["offset"], big["center"], atol=1e-5
        )
        _, p_big = ev(state, big)
        _, p_small = ev(state, small)
        # the crop shifts the affine by an integer offset, so the warped
        # pixels agree only to f32 noise (~1e-5); through an UNTRAINED
        # model whose heatmaps are noise, that can flip near-tie argmaxes
        # on a few joints (measured 3/256).  The frame mapping itself is
        # exact — require near-total agreement and bound the tie flips.
        d = np.abs(np.asarray(p_small) - np.asarray(p_big))
        assert (d <= 1e-3).mean() > 0.95, f"{(d > 1e-3).sum()} coords differ"


@pytest.mark.slow
class TestDataParallel:
    def test_dp_equals_single_device(self, synth):
        # deterministic aug so the only difference is the sharding
        cfg = _tiny_cfg(
            **{
                "aug.scale_factor": 0.0,
                "aug.rot_factor": 0.0,
                "aug.rot_prob": 0.0,
                "aug.flip_prob": 0.0,
                "aug.color_jitter": False,
            }
        )
        mesh = make_mesh(8)
        # f32 models: the equivalence claim is exact math; bf16 accumulation
        # order would add ~2^-8 relative noise and mask real bugs.
        model_dp = hg(
            num_stacks=1, num_feats=16, num_classes=16, axis_name="data",
            dtype=jnp.float32,
        )
        model_1d = hg(num_stacks=1, num_feats=16, num_classes=16, dtype=jnp.float32)
        tx = make_optimizer(cfg.optim, steps_per_epoch=10)
        x = jnp.zeros((1, 64, 64, 3))
        variables = model_1d.init(jax.random.PRNGKey(0), x, train=True)
        state0 = TrainState(
            params=variables["params"],
            batch_stats=variables["batch_stats"],
            opt_state=tx.init(variables["params"]),
            step=jnp.zeros((), jnp.int32),
        )
        batch = next(iter(HostLoader(synth, 16, pad_hw=(256, 384), seed=3)))
        key = jax.random.PRNGKey(7)

        step_1d = jax.jit(make_train_step(model_1d, tx, cfg.aug, MEAN))
        s1, m1 = step_1d(state0, batch, key)

        step_dp = shard_train_step(
            make_train_step(model_dp, tx, cfg.aug, MEAN, axis_name="data"),
            mesh,
            donate=False,
        )
        s8, m8 = step_dp(state0, batch, key)

        np.testing.assert_allclose(
            float(m1["loss"]), float(m8["loss"]), rtol=2e-4
        )
        # parameters after one update agree across implementations
        flat1 = jax.tree.leaves(s1.params)
        flat8 = jax.tree.leaves(s8.params)
        for a, b in zip(flat1, flat8):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=2e-4, rtol=1e-3
            )
        # cross-replica BN stats equal full-batch BN stats
        bs1 = jax.tree.leaves(s1.batch_stats)
        bs8 = jax.tree.leaves(s8.batch_stats)
        for a, b in zip(bs1, bs8):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=2e-4, rtol=1e-3
            )

    def test_dp_eval_ragged_batch_matches_unpadded(self, synth):
        """A final val batch that isn't mesh-divisible (12 over 8 devices)
        is padded + masked; the DP metrics and preds must match the plain
        single-device eval of the unpadded 12 samples (SURVEY.md §3.3)."""
        from posetpu.data import pad_batch

        cfg = _tiny_cfg()
        tx = make_optimizer(cfg.optim, steps_per_epoch=10)
        x = jnp.zeros((1, 64, 64, 3))
        model_1d = hg(num_stacks=1, num_feats=16, num_classes=16, dtype=jnp.float32)
        variables = model_1d.init(jax.random.PRNGKey(0), x, train=True)
        state = TrainState(
            params=variables["params"],
            batch_stats=variables["batch_stats"],
            opt_state=tx.init(variables["params"]),
            step=jnp.zeros((), jnp.int32),
        )
        full = next(iter(HostLoader(synth, 16, pad_hw=(256, 384), seed=5)))
        ragged = {k: v[:12] for k, v in full.items()}

        ev1 = jax.jit(make_eval_step(model_1d, cfg.aug, MEAN))
        m1, p1 = ev1(state, ragged)

        model_dp = hg(
            num_stacks=1, num_feats=16, num_classes=16, axis_name="data",
            dtype=jnp.float32,
        )
        ev8 = shard_eval_step(
            make_eval_step(model_dp, cfg.aug, MEAN, axis_name="data"),
            make_mesh(8),
        )
        m8, p8 = ev8(state, pad_batch(ragged, 16))

        np.testing.assert_allclose(float(m1["loss"]), float(m8["loss"]), rtol=1e-5)
        np.testing.assert_allclose(float(m1["acc"]), float(m8["acc"]), rtol=1e-5)
        np.testing.assert_allclose(
            np.asarray(p1), np.asarray(p8)[:12], atol=1e-4
        )

    def test_dp_eval_gathers_preds(self, synth):
        cfg = _tiny_cfg()
        mesh = make_mesh(8)
        model = hg(num_stacks=1, num_feats=16, num_classes=16, axis_name="data")
        tx = make_optimizer(cfg.optim, steps_per_epoch=10)
        x = jnp.zeros((1, 64, 64, 3))
        variables = model.init(jax.random.PRNGKey(0), x, train=True)
        state = TrainState(
            params=variables["params"],
            batch_stats=variables["batch_stats"],
            opt_state=tx.init(variables["params"]),
            step=jnp.zeros((), jnp.int32),
        )
        ev = shard_eval_step(
            make_eval_step(model, cfg.aug, MEAN, axis_name="data"), mesh
        )
        batch = next(iter(HostLoader(synth, 16, pad_hw=(256, 384))))
        metrics, preds = ev(state, batch)
        assert preds.shape == (16, 16, 2)
        assert np.isfinite(float(metrics["loss"]))


class TestFusedDispatch:
    """K-steps-per-dispatch fusion (fuse_steps + HostLoader(group=K)):
    one lax.scan dispatch must be numerically the K sequential steps —
    the mechanism the production loop uses to amortize per-dispatch host
    relay cost (BASELINE.md duty-cycle section)."""

    def test_fused_equals_sequential(self, synth):
        from posetpu.train.step import fuse_steps

        cfg = _tiny_cfg()
        model = hg(num_stacks=1, num_feats=16, num_classes=16, dtype=jnp.float32)
        tx = make_optimizer(cfg.optim, steps_per_epoch=10)
        x = jnp.zeros((1, 64, 64, 3))
        variables = model.init(jax.random.PRNGKey(0), x, train=True)
        state0 = TrainState(
            params=variables["params"],
            batch_stats=variables["batch_stats"],
            opt_state=tx.init(variables["params"]),
            step=jnp.zeros((), jnp.int32),
        )
        step = make_train_step(model, tx, cfg.aug, MEAN)
        batches = list(HostLoader(synth, 4, pad_hw=(256, 384), seed=0))[:3]
        K = len(batches)
        assert K == 3

        # sequential: the exact epoch-loop key chain
        key = jax.random.PRNGKey(7)
        st_seq = state0
        jstep = jax.jit(step)
        for b in batches:
            key, sub = jax.random.split(key)
            st_seq, _ = jstep(st_seq, b, sub)

        superbatch = {k: np.stack([b[k] for b in batches]) for k in batches[0]}
        fused = jax.jit(fuse_steps(step))
        st_f, key_f, metrics = fused(state0, superbatch, jax.random.PRNGKey(7))

        assert metrics["loss"].shape == (K,)
        assert int(st_f.step) == K
        # same PRNG chain continues after the dispatch
        np.testing.assert_array_equal(np.asarray(key_f), np.asarray(key))
        # tolerance: the scan body and the standalone jit compile with
        # different fusion choices; fp reassociation noise (~4e-5 abs) is
        # then amplified through RMSprop's eps-dominated early second
        # moments — isolated elements reach ~4e-4 after 3 steps
        for a, b in zip(jax.tree.leaves(st_seq.params), jax.tree.leaves(st_f.params)):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=5e-4, rtol=5e-3
            )
        for a, b in zip(
            jax.tree.leaves(st_seq.batch_stats), jax.tree.leaves(st_f.batch_stats)
        ):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=5e-4, rtol=5e-3
            )

    @pytest.mark.slow
    def test_fused_dp_matches_sequential_single_device(self, synth):
        """The sharded fused step (superbatch sharded on dim 1) equals the
        sequential single-device chain on the merged batches.

        Two-part assertion.  (1) With SGD the two chains must agree to
        float-noise level — this pins the aug/forward/grad/psum math with
        no optimizer confound (measured worst diff 8e-7).  (2) With the
        production RMSprop chain, step 1 from v=0 turns every update into
        ±10·lr·sign(g), so elements whose full-batch gradient sits at
        summation-order-noise scale legitimately flip sign between the
        single-reduction and pmean-of-shard-sums orders; chaining a second
        step compounds it (measured 0.91% of elements beyond 5e-4, all
        inside the ±10·lr step bound) — asserted via the step-bound /
        flip-fraction check rather than a blanket tolerance."""
        import optax

        from posetpu.parallel import shard_fused_train_step
        from posetpu.train.step import fuse_steps

        cfg = _tiny_cfg(
            **{
                "aug.scale_factor": 0.0,
                "aug.rot_factor": 0.0,
                "aug.rot_prob": 0.0,
                "aug.flip_prob": 0.0,
                "aug.color_jitter": False,
            }
        )
        mesh = make_mesh(8)
        model_dp = hg(
            num_stacks=1, num_feats=16, num_classes=16, axis_name="data",
            dtype=jnp.float32,
        )
        model_1d = hg(num_stacks=1, num_feats=16, num_classes=16, dtype=jnp.float32)
        # 16-image dataset -> batch 8 gives the two batches this test
        # fuses (batch 16 would yield a single batch and K=1)
        batches = list(HostLoader(synth, 8, pad_hw=(256, 384), seed=3))[:2]
        assert len(batches) == 2
        superbatch = {k: np.stack([b[k] for b in batches]) for k in batches[0]}
        x = jnp.zeros((1, 64, 64, 3))
        variables = model_1d.init(jax.random.PRNGKey(0), x, train=True)

        def run_both(tx):
            state0 = TrainState(
                params=variables["params"],
                batch_stats=variables["batch_stats"],
                opt_state=tx.init(variables["params"]),
                step=jnp.zeros((), jnp.int32),
            )
            key = jax.random.PRNGKey(7)
            st_seq = state0
            jstep = jax.jit(make_train_step(model_1d, tx, cfg.aug, MEAN))
            for b in batches:
                key, sub = jax.random.split(key)
                st_seq, _ = jstep(st_seq, b, sub)
            fused_dp = shard_fused_train_step(
                fuse_steps(
                    make_train_step(model_dp, tx, cfg.aug, MEAN, axis_name="data")
                ),
                mesh,
                donate=False,
            )
            st_f, key_f, metrics = fused_dp(
                state0, superbatch, jax.random.PRNGKey(7)
            )
            assert metrics["loss"].shape == (2,)
            np.testing.assert_array_equal(np.asarray(key_f), np.asarray(key))
            return st_seq, st_f

        # (1) strict math equivalence, optimizer out of the picture
        st_seq, st_f = run_both(optax.sgd(1e-3))
        for a, b in zip(jax.tree.leaves(st_seq.params), jax.tree.leaves(st_f.params)):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=1e-5, rtol=1e-5
            )
        for a, b in zip(
            jax.tree.leaves(st_seq.batch_stats), jax.tree.leaves(st_f.batch_stats)
        ):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=5e-4, rtol=5e-3
            )

        # (2) production RMSprop chain, modulo first-step sign amplification
        from test_adversarial import _assert_params_close_post_rmsprop

        st_seq, st_f = run_both(make_optimizer(cfg.optim, steps_per_epoch=10))
        _assert_params_close_post_rmsprop(
            st_seq.params,
            st_f.params,
            atol=5e-4,
            lr=cfg.optim.lr,
            max_flip_frac=0.02,
            steps=2,
        )
