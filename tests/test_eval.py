"""Device decode/PCK parity vs the numpy oracles (SURVEY.md §4.1)."""

import os

import numpy as np
import pytest
import jax.numpy as jnp

from posetpu.eval import accuracy, final_preds, get_preds, quarter_offset
from posetpu.eval.pck import pck_lsp, pckh
from posetpu.oracles import (
    accuracy as oracle_accuracy,
    draw_labelmap,
    final_preds as oracle_final_preds,
    get_preds as oracle_get_preds,
)


def _mk_heatmaps(peaks, res=(64, 64), noise=0.0, seed=0):
    rng = np.random.RandomState(seed)
    N, K = len(peaks), len(peaks[0])
    hm = np.zeros((N, K, res[0], res[1]))
    for n in range(N):
        for k, (x, y) in enumerate(peaks[n]):
            hm[n, k], _ = draw_labelmap(hm[n, k], (x, y), sigma=1)
    if noise:
        hm += rng.rand(*hm.shape) * noise
    return hm


class TestDecodeParity:
    def test_get_preds(self):
        rng = np.random.RandomState(0)
        peaks = rng.randint(2, 60, size=(4, 16, 2)).tolist()
        hm = _mk_heatmaps(peaks, noise=0.05)
        np.testing.assert_array_equal(
            np.asarray(get_preds(jnp.asarray(hm))), oracle_get_preds(hm)
        )

    def test_get_preds_masks_zero(self):
        hm = np.zeros((1, 3, 64, 64))
        hm[0, 0, 5, 9] = 1.0
        out = np.asarray(get_preds(jnp.asarray(hm)))
        np.testing.assert_array_equal(out[0, 1], [0, 0])
        np.testing.assert_array_equal(out[0, 0], [10, 6])

    @pytest.mark.slow
    def test_final_preds_matches_oracle(self):
        rng = np.random.RandomState(1)
        peaks = rng.randint(3, 60, size=(3, 16, 2)).tolist()
        hm = _mk_heatmaps(peaks, noise=0.2, seed=2)
        center = np.array([[150.3, 120.9], [200.1, 90.4], [80.7, 60.2]])
        scale = np.array([1.1, 0.9, 1.7])
        dev = np.asarray(
            final_preds(jnp.asarray(hm), jnp.asarray(center), jnp.asarray(scale), (64, 64))
        )
        ref = oracle_final_preds(hm, center, scale, (64, 64))
        # integer truncation parity: allow |diff| <= 1 at boundary cases
        assert (np.abs(dev - ref) <= 1.0 + 1e-6).all()
        assert (dev == ref).mean() > 0.9

    def test_final_preds_nonsquare_matches_oracle(self):
        """Non-square heatmaps: x must be bounded by the WIDTH and y by
        the HEIGHT in the quarter-offset in-bounds test (res is (H, W)
        repo-wide) — a swap only shows up off the square case."""
        rng = np.random.RandomState(4)
        H, W = 32, 16
        peaks = [
            [(int(x), int(y)) for x, y in zip(
                rng.randint(1, W - 1, 16), rng.randint(1, H - 1, 16)
            )]
            for _ in range(3)
        ]
        # include edge peaks that straddle the swapped bounds (x near W,
        # y in (W, H)) — exactly where an axis swap diverges or crashes
        peaks[0][0] = (W - 1, H - 2)
        peaks[0][1] = (2, H - 1)
        peaks[0][2] = (W - 2, W + 3)
        hm = _mk_heatmaps(peaks, res=(H, W), noise=0.2, seed=5)
        center = np.array([[150.3, 120.9], [200.1, 90.4], [80.7, 60.2]])
        scale = np.array([1.1, 0.9, 1.7])
        dev = np.asarray(
            final_preds(
                jnp.asarray(hm), jnp.asarray(center), jnp.asarray(scale), (H, W)
            )
        )
        ref = oracle_final_preds(hm, center, scale, (H, W))
        assert (np.abs(dev - ref) <= 1.0 + 1e-6).all()
        assert (dev == ref).mean() > 0.9

    def test_save_load_preds_round_trip(self, tmp_path):
        """save_preds/load_preds round-trip for .mat, .npz AND a bare
        extension (np.savez alone would write '<path>.npz' and break the
        read-back)."""
        from posetpu.eval.export import load_preds, save_preds

        preds = np.random.RandomState(0).rand(5, 16, 2)
        for name in ("p.mat", "p.npz", "p.bin"):
            path = str(tmp_path / name)
            save_preds(preds, path)
            assert os.path.exists(path), name
            np.testing.assert_allclose(load_preds(path), preds, err_msg=name)

    def test_quarter_offset_direction(self):
        hm = np.zeros((1, 1, 64, 64))
        hm[0, 0, 20, 30] = 1.0
        hm[0, 0, 20, 31] = 0.6
        hm[0, 0, 19, 30] = 0.5
        coords = get_preds(jnp.asarray(hm))
        out = np.asarray(quarter_offset(coords, jnp.asarray(hm)))
        np.testing.assert_allclose(out[0, 0], [31.25, 20.75])  # +x, -y

    def test_quarter_offset_border_noop(self):
        hm = np.zeros((1, 1, 64, 64))
        hm[0, 0, 0, 0] = 1.0
        coords = get_preds(jnp.asarray(hm))
        out = np.asarray(quarter_offset(coords, jnp.asarray(hm)))
        np.testing.assert_allclose(out[0, 0], [1.0, 1.0])

    def test_accuracy_matches_oracle(self):
        rng = np.random.RandomState(3)
        peaks_out = rng.randint(2, 60, size=(6, 16, 2))
        jitter = rng.randint(-4, 5, size=(6, 16, 2))
        peaks_tgt = np.clip(peaks_out + jitter, 0, 63)
        out_hm = _mk_heatmaps(peaks_out.tolist())
        tgt_hm = _mk_heatmaps(peaks_tgt.tolist())
        dev = np.asarray(accuracy(jnp.asarray(out_hm), jnp.asarray(tgt_hm)))
        ref = oracle_accuracy(out_hm, tgt_hm)
        np.testing.assert_allclose(dev, ref, atol=1e-6)


class TestOfflineProtocols:
    def test_pckh_perfect_and_off(self):
        gts = np.random.RandomState(0).rand(10, 16, 2) * 200
        mean, per_joint = pckh(gts, gts, headsizes=np.full(10, 30.0))
        assert mean == 100.0
        far = gts + 100.0
        mean2, _ = pckh(far, gts, headsizes=np.full(10, 30.0))
        assert mean2 == 0.0

    def test_pckh_threshold(self):
        gts = np.zeros((1, 16, 2))
        preds = gts.copy()
        preds[0, 0] += [14.9, 0]  # dist 14.9, head 30 -> within 0.5*30
        preds[0, 1] += [15.1, 0]  # just outside
        _, pj = pckh(preds, gts, headsizes=np.array([30.0]))
        assert pj[0] == 100.0 and pj[1] == 0.0

    def test_pck_lsp(self):
        rng = np.random.RandomState(1)
        gts = rng.rand(5, 14, 2) * 100
        mean, _ = pck_lsp(gts, gts)
        assert mean == 100.0


class TestEvalCliEntry:
    def test_entry_returns_int_zero(self, monkeypatch):
        # console script does sys.exit(entry()); main returns a float PCKh,
        # and sys.exit(float) prints it and exits 1 — entry must coerce
        import posetpu.eval.cli as cli

        monkeypatch.setattr(cli, "main", lambda argv=None: 42.5)
        rc = cli.entry()
        assert rc == 0 and isinstance(rc, int)
