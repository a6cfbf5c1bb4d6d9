"""Model unit tests (SURVEY.md §4.2): shapes/dtypes per stack, param counts,
one-batch overfit (loss decreases), agent heads + sampling determinism."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from posetpu.models import (
    AugAgent,
    HourglassNet,
    hg,
    occlusion_hierarchy,
    rotation_bin_table,
    sample_bins,
    scale_bin_table,
)


def _init(model, shape=(2, 64, 64, 3), train=False):
    x = jnp.zeros(shape, jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, train=train)
    return variables, x


@pytest.mark.slow
class TestHourglassNet:
    def test_output_shapes_per_stack(self):
        model = hg(num_stacks=2, num_blocks=1, num_classes=16, num_feats=32)
        variables, x = _init(model, (2, 64, 64, 3))
        outs = model.apply(variables, x, train=False)
        assert len(outs) == 2
        for o in outs:
            assert o.shape == (2, 16, 16, 16)  # 64/4 spatial, K=16 channels
            assert o.dtype == jnp.float32

    def test_batchnorm_state_exists(self):
        model = hg(num_stacks=1, num_feats=32)
        variables, x = _init(model)
        assert "batch_stats" in variables
        # mutable update in train mode
        outs, new_state = model.apply(
            variables, x, train=True, mutable=["batch_stats"]
        )
        assert "batch_stats" in new_state

    def test_param_count_scales_with_stacks(self):
        def count(stacks):
            m = hg(num_stacks=stacks, num_feats=64)
            v, _ = _init(m)
            return sum(p.size for p in jax.tree.leaves(v["params"]))

        c1, c2, c3 = count(1), count(2), count(3)
        # each extra stack adds a constant-size block (hourglass+heads+remap)
        assert c2 > c1
        assert abs((c3 - c2) - (c2 - c1)) < 0.05 * (c2 - c1) + 10000

    def test_full_size_param_count(self):
        # 8-stack/256-feat model lands in the known ~25M range of the
        # reference hg8 (literature ~25.6M params; SURVEY.md §2 C5).
        m = hg(num_stacks=8, num_blocks=1, num_classes=16, num_feats=128)
        v = jax.eval_shape(
            lambda: m.init(jax.random.PRNGKey(0), jnp.zeros((1, 256, 256, 3)), train=False)
        )
        n = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(v["params"]))
        assert 20e6 < n < 32e6, f"param count {n/1e6:.2f}M out of range"

    def test_overfit_one_batch(self):
        model = hg(num_stacks=2, num_blocks=1, num_classes=4, num_feats=16)
        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.rand(2, 64, 64, 3).astype(np.float32))
        tgt = jnp.asarray(rng.rand(2, 16, 16, 4).astype(np.float32))
        variables = model.init(jax.random.PRNGKey(0), x, train=True)
        params, bstats = variables["params"], variables["batch_stats"]
        opt = optax.rmsprop(2.5e-3)
        opt_state = opt.init(params)

        @jax.jit
        def step(params, bstats, opt_state):
            def loss_fn(p):
                outs, st = model.apply(
                    {"params": p, "batch_stats": bstats},
                    x,
                    train=True,
                    mutable=["batch_stats"],
                )
                loss = sum(jnp.mean((o - tgt) ** 2) for o in outs)
                return loss, st["batch_stats"]

            (loss, bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
            updates, opt_state = opt.update(grads, opt_state)
            params = optax.apply_updates(params, updates)
            return params, bs, opt_state, loss

        losses = []
        for _ in range(12):
            params, bstats, opt_state, loss = step(params, bstats, opt_state)
            losses.append(float(loss))
        assert losses[-1] < losses[0] * 0.7, losses

    def test_remat_matches(self):
        kw = dict(num_stacks=2, num_blocks=1, num_classes=4, num_feats=16)
        m0 = HourglassNet(**kw, remat=False)
        m1 = HourglassNet(**kw, remat=True)
        v, x = _init(m0)
        o0 = m0.apply(v, x, train=False)
        o1 = m1.apply(v, x, train=False)
        for a, b in zip(o0, o1):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


class TestAgent:
    @pytest.mark.slow
    def test_heads_and_shapes(self):
        agent = AugAgent(
            num_scale_bins=7, num_rot_bins=5, num_occ_nodes=21, occ_mode="flat"
        )
        x = jnp.zeros((3, 64, 64, 3))
        v = agent.init(jax.random.PRNGKey(0), x, train=False)
        out = agent.apply(v, x, train=False)
        assert out["scale"].shape == (3, 7)
        assert out["rot"].shape == (3, 5)
        assert out["occ"].shape == (3, 21)
        assert out["scale"].dtype == jnp.float32

    def test_tree_heads_and_shapes(self):
        agent = AugAgent(
            num_scale_bins=7,
            num_rot_bins=5,
            num_occ_nodes=22,
            occ_mode="tree",
            occ_levels=(1, 2, 4),
        )
        x = jnp.zeros((3, 64, 64, 3))
        v = agent.init(jax.random.PRNGKey(0), x, train=False)
        out = agent.apply(v, x, train=False)
        assert out["occ_level"].shape == (3, 4)  # none + 3 levels
        assert tuple(c.shape for c in out["occ_cells"]) == (
            (3, 1),
            (3, 4),
            (3, 16),
        )
        assert "occ" not in out

    @pytest.mark.slow
    def test_tree_head_node_count_validated(self):
        agent = AugAgent(
            num_occ_nodes=21, occ_mode="tree", occ_levels=(1, 2, 4)
        )
        x = jnp.zeros((1, 64, 64, 3))
        with pytest.raises(ValueError):
            agent.init(jax.random.PRNGKey(0), x, train=False)

    def test_bin_tables(self):
        s = scale_bin_table(7)
        assert len(s) == 7
        np.testing.assert_allclose(s[3], 1.0, rtol=1e-6)  # center bin = 1
        np.testing.assert_allclose(s[0] * s[-1], 1.0, rtol=1e-6)  # symmetric
        r = rotation_bin_table(7)
        assert r[0] == -30.0 and r[-1] == 30.0 and r[3] == 0.0

    def test_occlusion_hierarchy(self):
        boxes = occlusion_hierarchy((256, 256), levels=(1, 2, 4))
        assert boxes.shape == (1 + 1 + 4 + 16, 4)
        assert tuple(boxes[0]) == (0, 0, 0, 0)  # identity node
        y0, x0, h, w = boxes[1]
        assert h > 0 and w > 0 and 0 <= y0 < 256 and 0 <= x0 < 256

    def test_sampling_deterministic_and_distributed(self):
        logits = jnp.log(jnp.asarray([[0.05, 0.9, 0.05]] * 64) + 1e-9)
        key = jax.random.PRNGKey(42)
        idx1, logp1 = sample_bins(key, logits)
        idx2, logp2 = sample_bins(key, logits)
        np.testing.assert_array_equal(np.asarray(idx1), np.asarray(idx2))
        np.testing.assert_allclose(np.asarray(logp1), np.asarray(logp2))
        # dominant bin sampled most of the time
        assert np.mean(np.asarray(idx1) == 1) > 0.7
        # log prob matches the softmax of chosen bin
        np.testing.assert_allclose(
            np.asarray(logp1[0]),
            np.log(0.9),
            atol=1e-3,
        )


class TestTreeSampling:
    """Tree-structured AHO sampling (SURVEY.md C13): logp correctness and
    node-index consistency with the flat hierarchy box table."""

    def _logits(self, B, key):
        from posetpu.models import occ_level_offsets  # noqa: F401

        k1, k2, k3, k4 = jax.random.split(key, 4)
        return {
            "level": jax.random.normal(k1, (B, 3)),  # none + levels (1, 2)
            "cells": (
                jax.random.normal(k2, (B, 1)),
                jax.random.normal(k3, (B, 4)),
            ),
        }

    @pytest.mark.slow
    def test_logp_matches_manual_chain_rule(self):
        from posetpu.models import occlusion_tree_logp, sample_occlusion_tree
        from posetpu.aug import per_sample_keys

        B, levels = 64, (1, 2)
        lg = self._logits(B, jax.random.PRNGKey(0))
        keys = per_sample_keys(jax.random.PRNGKey(1), jnp.arange(B))
        node, lvl, cell, logp = sample_occlusion_tree(
            keys, lg["level"], lg["cells"], levels
        )
        # manual: log softmax(level)[lvl] + (lvl>0) * log softmax(cell_lvl)[cell]
        lp_lvl = np.asarray(jax.nn.log_softmax(lg["level"]))
        lp_c = [np.asarray(jax.nn.log_softmax(c)) for c in lg["cells"]]
        want = []
        for b in range(B):
            v = lp_lvl[b, int(lvl[b])]
            if int(lvl[b]) > 0:
                v += lp_c[int(lvl[b]) - 1][b, int(cell[b])]
            want.append(v)
        np.testing.assert_allclose(np.asarray(logp), want, rtol=1e-5)
        # differentiable re-evaluation agrees with the sampling-time logp
        logp2 = occlusion_tree_logp(lg["level"], lg["cells"], lvl, cell)
        np.testing.assert_allclose(np.asarray(logp2), np.asarray(logp), rtol=1e-5)

    @pytest.mark.slow
    def test_node_indices_match_hierarchy_layout(self):
        from posetpu.models import sample_occlusion_tree
        from posetpu.aug import per_sample_keys

        B, levels = 256, (1, 2)
        boxes = occlusion_hierarchy((64, 64), levels)
        lg = self._logits(B, jax.random.PRNGKey(2))
        keys = per_sample_keys(jax.random.PRNGKey(3), jnp.arange(B))
        node, lvl, cell, _ = sample_occlusion_tree(
            keys, lg["level"], lg["cells"], levels
        )
        node, lvl, cell = map(np.asarray, (node, lvl, cell))
        assert node.min() >= 0 and node.max() < len(boxes)
        # lvl 0 -> node 0; lvl 1 -> node 1; lvl 2 -> nodes 2..5
        np.testing.assert_array_equal(node[lvl == 0], 0)
        np.testing.assert_array_equal(node[lvl == 1], 1)
        assert set(node[lvl == 2]) <= {2, 3, 4, 5}
        np.testing.assert_array_equal(node[lvl == 2] - 2, cell[lvl == 2])

    @pytest.mark.slow
    def test_per_sample_sampling_is_shard_invariant(self):
        """sample_bins_ps depends only on (key_i, logits_i): any slicing of
        the batch reproduces the same draws — the DP-equivalence property."""
        from posetpu.models import sample_bins_ps
        from posetpu.aug import per_sample_keys

        B = 32
        logits = jax.random.normal(jax.random.PRNGKey(4), (B, 7))
        keys = per_sample_keys(jax.random.PRNGKey(5), jnp.arange(B))
        full, _ = sample_bins_ps(keys, logits)
        halves = jnp.concatenate(
            [
                sample_bins_ps(keys[:16], logits[:16])[0],
                sample_bins_ps(keys[16:], logits[16:])[0],
            ]
        )
        np.testing.assert_array_equal(np.asarray(full), np.asarray(halves))


@pytest.mark.slow
class TestScanStacks:
    def test_scan_matches_interface_and_learns_shape(self):
        m = hg(num_stacks=3, num_feats=16, num_classes=8, scan_stacks=True)
        x = jnp.zeros((2, 64, 64, 3))
        v = m.init(jax.random.PRNGKey(0), x, train=True)
        outs, st = m.apply(v, x, train=True, mutable=["batch_stats"])
        assert len(outs) == 3
        for o in outs:
            assert o.shape == (2, 16, 16, 8)
            assert o.dtype == jnp.float32
        # stacked params carry the leading num_stacks axis
        leaf = jax.tree.leaves(v["params"]["stacks"])[0]
        assert leaf.shape[0] == 3

    def test_scan_eval_mode(self):
        m = hg(num_stacks=2, num_feats=16, num_classes=4, scan_stacks=True)
        x = jnp.zeros((1, 64, 64, 3))
        v = m.init(jax.random.PRNGKey(0), x, train=True)
        outs = m.apply(v, x, train=False)
        assert len(outs) == 2 and outs[0].shape == (1, 16, 16, 4)
