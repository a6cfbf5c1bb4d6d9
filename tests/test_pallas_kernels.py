"""Pallas kernel parity (interpret mode on CPU; compiled path exercised on
TPU by bench/tools).  The kernel must match the XLA rasterizer (and thus the
numpy oracle) exactly."""

import numpy as np
import pytest

from posetpu.aug.heatmap import rasterize_gaussians
from posetpu.aug.pallas_kernels import rasterize_gaussians_pallas


class TestPallasRasterizer:
    @pytest.mark.parametrize("sigma", [1.0, 2.0])
    def test_matches_xla_interpret(self, sigma):
        rng = np.random.RandomState(0)
        pts = rng.randint(-10, 74, size=(3, 16, 2)).astype(np.float64)
        vis = rng.randint(0, 2, size=(3, 16)).astype(np.float64)
        t_x, v_x = rasterize_gaussians(pts, vis, (64, 64), sigma, backend="xla")
        t_p, v_p = rasterize_gaussians_pallas(
            pts, vis, (64, 64), sigma, interpret=True
        )
        np.testing.assert_allclose(np.asarray(t_p), np.asarray(t_x), atol=1e-6)
        np.testing.assert_array_equal(np.asarray(v_p), np.asarray(v_x))

    def test_row_padding_dropped(self):
        # B*K=6 not divisible by 8: padded rows must not leak into output
        pts = np.full((2, 3, 2), 30.0)
        vis = np.ones((2, 3))
        t_p, v_p = rasterize_gaussians_pallas(pts, vis, (64, 64), interpret=True)
        assert t_p.shape == (2, 3, 64, 64)
        np.testing.assert_allclose(
            np.asarray(t_p).max(axis=(2, 3)), np.ones((2, 3)), atol=1e-6
        )

    def test_backend_auto_on_cpu_is_xla(self):
        # On the CPU test backend, auto must not attempt a TPU pallas call.
        pts = np.full((1, 2, 2), 10.0)
        vis = np.ones((1, 2))
        t, v = rasterize_gaussians(pts, vis, (32, 32), backend="auto")
        assert t.shape == (1, 2, 32, 32)


class TestAutoBackendSelection:
    """"auto" must pick the Pallas kernel on BOTH tpu and axon platforms —
    this machine's TPU registers as the experimental "axon" PJRT platform,
    and before round 4 the auto rule compared against "tpu" only, so the
    kernel silently never ran on the real chip."""

    def _select(self, monkeypatch, platform):
        import jax

        import posetpu.aug.pallas_kernels as pk

        chosen = []
        monkeypatch.setattr(
            pk,
            "rasterize_gaussians_pallas",
            lambda *a, **k: chosen.append("pallas") or ("t", "v"),
        )
        monkeypatch.setattr(jax, "default_backend", lambda: platform)
        out = rasterize_gaussians(
            np.zeros((1, 2, 2)), np.ones((1, 2)), (8, 8), backend="auto"
        )
        return chosen, out

    def test_axon_selects_pallas(self, monkeypatch):
        chosen, out = self._select(monkeypatch, "axon")
        assert chosen == ["pallas"] and out == ("t", "v")

    def test_tpu_selects_pallas(self, monkeypatch):
        chosen, out = self._select(monkeypatch, "tpu")
        assert chosen == ["pallas"]

    def test_cpu_selects_xla(self, monkeypatch):
        chosen, (t, v) = self._select(monkeypatch, "cpu")
        assert chosen == []  # real XLA arrays came back
        assert t.shape == (1, 2, 8, 8)
