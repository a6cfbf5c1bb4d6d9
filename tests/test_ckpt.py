"""Checkpoint round-trip tests (SURVEY.md §4.6): orbax save->restore->
bitwise-equal resume, best-copy behavior, torch-layout export round-trip."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from posetpu.ckpt import (
    CheckpointManager,
    load_torch_checkpoint,
    save_torch_checkpoint,
    to_torch_state_dict,
)
from posetpu.configs import OptimConfig
from posetpu.models import hg
from posetpu.train.state import TrainState, make_optimizer


def _state(seed=0, feats=8):
    model = hg(num_stacks=1, num_feats=feats, num_classes=4)
    x = jnp.zeros((1, 64, 64, 3))
    v = model.init(jax.random.PRNGKey(seed), x, train=True)
    tx = make_optimizer(OptimConfig(), 10)
    return model, TrainState(
        params=v["params"],
        batch_stats=v["batch_stats"],
        opt_state=tx.init(v["params"]),
        step=jnp.asarray(7, jnp.int32),
    )


class TestOrbaxRoundTrip:
    @pytest.mark.slow
    def test_bitwise_roundtrip(self, tmp_path):
        _, state = _state()
        mgr = CheckpointManager(str(tmp_path))
        mgr.save(state, epoch=3, best_acc=0.5)
        _, template = _state(seed=99)  # different values, same shapes
        restored, epoch, best = mgr.restore(template)
        assert epoch == 3 and best == 0.5
        assert int(restored.step) == 7
        for a, b in zip(
            jax.tree.leaves(state.params), jax.tree.leaves(restored.params)
        ):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(
            jax.tree.leaves(state.opt_state), jax.tree.leaves(restored.opt_state)
        ):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    @pytest.mark.slow
    def test_best_copy_and_gc(self, tmp_path):
        _, state = _state()
        mgr = CheckpointManager(str(tmp_path), max_to_keep=2)
        mgr.save(state, 0, 0.1, is_best=True)
        mgr.save(state, 1, 0.1)
        mgr.save(state, 2, 0.2, is_best=True)
        mgr.save(state, 3, 0.2)
        mgr.wait()  # saves are async; settle before inspecting the dir
        mgr._gc()
        kept = sorted(os.listdir(os.path.join(tmp_path, "ckpt")))
        assert kept == ["00002", "00003"]
        assert os.path.isdir(mgr.best_path)
        _, template = _state(seed=5)
        restored, epoch, best = mgr.restore(template, mgr.best_path)
        assert epoch == 2
        np.testing.assert_allclose(best, 0.2, rtol=1e-6)  # stored as f32


class TestTorchExport:
    def test_conv_layout_and_roundtrip(self, tmp_path):
        _, state = _state()
        sd = to_torch_state_dict(state.params, state.batch_stats)
        # conv kernels exported OIHW
        k = [v for kk, v in sd.items() if kk.endswith("stem_conv.weight")][0]
        assert k.shape == (64, 3, 7, 7)
        # BN stats present under torch names
        assert any(kk.endswith("running_mean") for kk in sd)
        path = os.path.join(tmp_path, "checkpoint.pth.tar")
        save_torch_checkpoint(
            path, state.params, state.batch_stats, 4, 0.9,
            opt_state=state.opt_state,
        )
        params, bstats, epoch, best, opt = load_torch_checkpoint(
            path, state.params, state.batch_stats, state.opt_state
        )
        assert epoch == 4 and best == 0.9
        for a, b in zip(jax.tree.leaves(state.params), jax.tree.leaves(params)):
            np.testing.assert_allclose(
                np.asarray(a, np.float32), np.asarray(b, np.float32), atol=0
            )
        # optimizer state round-trips (reference container keeps `optimizer`,
        # SURVEY.md C10) — same tree structure, bit-equal leaves
        assert jax.tree_util.tree_structure(opt) == jax.tree_util.tree_structure(
            state.opt_state
        )
        for a, b in zip(
            jax.tree.leaves(state.opt_state), jax.tree.leaves(opt)
        ):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_container_has_reference_fields(self, tmp_path):
        import torch

        _, state = _state()
        path = os.path.join(tmp_path, "checkpoint.pth.tar")
        save_torch_checkpoint(
            path, state.params, state.batch_stats, 1, 0.5,
            opt_state=state.opt_state,
        )
        blob = torch.load(path, map_location="cpu", weights_only=False)
        assert set(blob) == {"epoch", "state_dict", "optimizer", "best_acc"}
        assert len(blob["optimizer"]) == len(
            jax.tree.leaves(state.opt_state)
        )


class TestLogger:
    def test_log_format_and_resume(self, tmp_path):
        from posetpu.utils import Logger

        p = os.path.join(tmp_path, "log.txt")
        lg = Logger(p)
        lg.set_names(Logger.DEFAULT_NAMES)
        lg.append([0, 2.5e-4, 1.0, 1.1, 0.2, 0.19])
        lg.append([1, 2.5e-4, 0.8, 0.9, 0.3, 0.28])
        lg.close()
        with open(p) as f:
            lines = f.read().strip().split("\n")
        assert lines[0].split("\t") == list(Logger.DEFAULT_NAMES)
        assert len(lines) == 3
        lg2 = Logger(p, resume=True)
        lg2.set_names(Logger.DEFAULT_NAMES)
        assert lg2.numbers["Train Loss"] == [1.0, 0.8]
        lg2.append([2, 2.5e-5, 0.7, 0.8, 0.4, 0.39])
        lg2.close()
        with open(p) as f:
            assert len(f.read().strip().split("\n")) == 4

    def test_resume_from_empty_file(self, tmp_path):
        """A crash before the header flushed leaves an empty log; resume
        must treat it as fresh (names=[''] would fail every append)."""
        from posetpu.utils import Logger

        p = os.path.join(tmp_path, "log.txt")
        open(p, "w").close()
        lg = Logger(p, resume=True)
        lg.set_names(Logger.DEFAULT_NAMES)
        lg.append([0, 2.5e-4, 1.0, 1.1, 0.2, 0.19])
        lg.close()
        with open(p) as f:
            lines = f.read().strip().split("\n")
        assert lines[0].split("\t") == list(Logger.DEFAULT_NAMES)
        assert len(lines) == 2

    def test_resume_skips_partial_last_line(self, tmp_path):
        """A crash mid-append leaves a truncated row; resume skips it
        instead of raising float('')."""
        from posetpu.utils import Logger

        p = os.path.join(tmp_path, "log.txt")
        lg = Logger(p)
        lg.set_names(Logger.DEFAULT_NAMES)
        lg.append([0, 2.5e-4, 1.0, 1.1, 0.2, 0.19])
        lg.close()
        with open(p, "a") as f:
            f.write("1\t0.00025\t")  # torn write
        lg2 = Logger(p, resume=True)
        lg2.set_names(Logger.DEFAULT_NAMES)
        assert lg2.numbers["Train Loss"] == [1.0]
        lg2.close()

    def test_plot(self, tmp_path):
        from posetpu.utils import Logger

        p = os.path.join(tmp_path, "log.txt")
        lg = Logger(p)
        lg.set_names(("Epoch", "Train Loss"))
        lg.append([0, 1.0])
        lg.append([1, 0.5])
        out = lg.plot()
        assert os.path.exists(out)
