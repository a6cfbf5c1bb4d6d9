"""Native C++ decode pool tests: build, decode parity vs PIL path, crop
offsets, failure fallback, loader integration + throughput sanity."""

import os
import time

import numpy as np
import pytest

from posetpu.data import HostLoader, MpiiDataset, make_synthetic_dataset
from posetpu.data.loader import load_sample

native = pytest.importorskip("posetpu.native")


def _timed(fn):
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


@pytest.fixture(scope="module")
def synth_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("synth_native")
    make_synthetic_dataset(str(d), num_train=16, num_val=4, res=(320, 240))
    return str(d)


@pytest.fixture(scope="module")
def ds(synth_dir):
    return MpiiDataset(
        os.path.join(synth_dir, "annotations.json"),
        os.path.join(synth_dir, "images"),
        split="train",
    )


@pytest.mark.skipif(not native.native_available(), reason="no g++/libjpeg")
class TestNativeDecoder:
    def test_decode_matches_pil(self, ds):
        dec = native.NativeDecoder(num_threads=4)
        paths = [ds.image_path(i) for i in range(4)]
        centers = np.stack([ds.meta(i)[0] for i in range(4)]).astype(np.float32)
        images, wh, offs, ok = dec.decode_batch(paths, centers, (256, 384))
        assert ok.all()
        assert (wh == [320, 240]).all()
        assert (offs == 0).all()
        for i in range(4):
            ref = load_sample(ds, i, (256, 384))
            np.testing.assert_array_equal(wh[i], ref["valid_wh"])
            # identical decode up to libjpeg vs PIL IDCT rounding (<=2 LSB)
            diff = np.abs(images[i].astype(np.int16) - ref["image"].astype(np.int16)).max()
            assert diff <= 2.5, diff
        dec.close()

    def test_use_after_close_raises(self, ds):
        dec = native.NativeDecoder(num_threads=1)
        dec.close()
        with pytest.raises(RuntimeError, match="after close"):
            dec.decode_batch(
                [ds.image_path(0)], np.zeros((1, 2), np.float32), (64, 64)
            )

    def test_oversize_crop_offsets(self, ds):
        dec = native.NativeDecoder(num_threads=2)
        paths = [ds.image_path(0)]
        c = ds.meta(0)[0].astype(np.float32)
        images, wh, offs, ok = dec.decode_batch(paths, c[None], (200, 200))
        assert ok.all()
        ref = load_sample(ds, 0, (200, 200))
        np.testing.assert_array_equal(wh[0], ref["valid_wh"])
        # crop windows may differ by <=1px from the PIL path (rounding);
        # verify self-consistency instead: window content matches original
        full = load_sample(ds, 0, (240, 320))
        ox, oy = int(offs[0][0]), int(offs[0][1])
        np.testing.assert_allclose(
            images[0][:50, :50].astype(np.int16),
            full["image"][oy : oy + 50, ox : ox + 50].astype(np.int16),
            atol=2.5,
        )
        dec.close()

    def test_failure_flags(self, tmp_path, ds):
        bad = os.path.join(tmp_path, "missing.jpg")
        dec = native.NativeDecoder(num_threads=2)
        images, wh, offs, ok = dec.decode_batch(
            [bad, ds.image_path(0)], np.zeros((2, 2), np.float32), (64, 64)
        )
        assert not ok[0] and ok[1]
        assert (wh[0] == 0).all()
        dec.close()

    def test_loader_native_backend(self, ds):
        l_nat = HostLoader(ds, 4, pad_hw=(256, 384), seed=1, backend="native")
        l_pil = HostLoader(ds, 4, pad_hw=(256, 384), seed=1, backend="pil")
        b_nat = next(iter(l_nat))
        b_pil = next(iter(l_pil))
        np.testing.assert_array_equal(b_nat["index"], b_pil["index"])
        np.testing.assert_array_equal(b_nat["valid_wh"], b_pil["valid_wh"])
        np.testing.assert_allclose(b_nat["pts"], b_pil["pts"], atol=1e-5)
        diff = np.abs(
            b_nat["image"].astype(np.int16) - b_pil["image"].astype(np.int16)
        ).max()
        assert diff <= 2.5

    def test_throughput_vs_pil(self, ds):
        # sanity: native parallel decode should not be slower than serial PIL.
        # Timing on a shared 1-core CI host is noisy, so take best-of-3 on
        # both sides and allow 2x headroom — this still catches a real
        # regression (native was measured ~2x FASTER per image) without
        # flaking when another process steals the core mid-measurement.
        paths = [ds.image_path(i % len(ds)) for i in range(32)]
        centers = np.zeros((32, 2), np.float32)
        dec = native.NativeDecoder()
        dec.decode_batch(paths[:4], centers[:4], (256, 384))  # warm
        t_nat = min(
            _timed(lambda: dec.decode_batch(paths, centers, (256, 384)))
            for _ in range(3)
        )
        t_pil = min(
            _timed(
                lambda: [
                    load_sample(ds, i % len(ds), (256, 384)) for i in range(32)
                ]
            )
            for _ in range(3)
        )
        assert t_nat < t_pil * 2.0, (t_nat, t_pil)
        dec.close()
