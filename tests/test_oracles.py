"""Golden/property tests pinning the oracle numerics (SURVEY.md §4.1).

These define the fp-parity contract the device ops must match.  Goldens are
computed from the reconstructed reference semantics (SURVEY.md §2 C3/C4/C9).
"""

import numpy as np
import pytest

from posetpu.oracles import (
    accuracy,
    calc_dists,
    color_normalize,
    crop,
    draw_labelmap,
    final_preds,
    fliplr,
    gaussian_patch,
    get_preds,
    get_transform,
    shufflelr,
    transform,
    transform_preds,
)


class TestGetTransform:
    def test_identity_box(self):
        # A 200px box centered at (100,100) mapped to 200x200 output is identity
        # up to the half-pixel centering terms.
        t = get_transform([100.0, 100.0], 1.0, (200, 200), rot=0)
        np.testing.assert_allclose(t[0, 0], 1.0)
        np.testing.assert_allclose(t[1, 1], 1.0)
        np.testing.assert_allclose(t[0, 2], 200 * (-100.0 / 200 + 0.5))
        np.testing.assert_allclose(t[1, 2], 0.0)

    def test_golden_matrix(self):
        t = get_transform([120.0, 80.0], 1.5, (64, 64), rot=0)
        h = 300.0
        expect = np.array(
            [
                [64 / h, 0.0, 64 * (-120.0 / h + 0.5)],
                [0.0, 64 / h, 64 * (-80.0 / h + 0.5)],
                [0.0, 0.0, 1.0],
            ]
        )
        np.testing.assert_allclose(t, expect, rtol=1e-12)

    def test_rotation_preserves_center(self):
        # The output center must be a fixed point of the rotation component.
        res = (256, 256)
        c, s = [123.0, 77.0], 1.2
        t0 = get_transform(c, s, res, rot=0)
        t30 = get_transform(c, s, res, rot=30)
        ctr_src = np.linalg.inv(t0) @ np.array([res[1] / 2, res[0] / 2, 1.0])
        out = t30 @ ctr_src
        np.testing.assert_allclose(out[:2], [res[1] / 2, res[0] / 2], atol=1e-9)

    def test_rotation_is_rotation(self):
        t = get_transform([50.0, 60.0], 1.0, (64, 64), rot=45)
        lin = t[:2, :2] * 200.0 / 64.0  # undo scale
        np.testing.assert_allclose(lin @ lin.T, np.eye(2), atol=1e-12)


class TestTransformPoints:
    def test_round_trip(self):
        c, s, res = [150.0, 200.0], 2.0, (64, 64)
        pt = np.array([33, 41])
        fwd = transform(pt, c, s, res, invert=0)
        # Round trip is lossy only by the integer truncation (<= 1px in 64-res,
        # which is 200*2/64 ≈ 6.25 source px).
        back = transform(fwd, c, s, res, invert=1)
        assert np.all(np.abs(back - pt) <= 200.0 * s / res[0] + 1)

    def test_center_maps_to_middle(self):
        c, s, res = [100.0, 120.0], 1.0, (64, 64)
        # 1-indexed center point
        out = transform([c[0] + 1, c[1] + 1], c, s, res)
        np.testing.assert_array_equal(out, [33, 33])  # 64*0.5=32 (0-idx) -> 33

    def test_golden_values(self):
        out = transform([50, 60], [100.0, 100.0], 1.25, (64, 64), invert=0)
        # x: (49 - 100)/250*64 + 32 = 18.944 -> int 18 -> +1 = 19
        # y: (59 - 100)/250*64 + 32 = 21.504 -> int 21 -> +1 = 22
        np.testing.assert_array_equal(out, [19, 22])

    def test_transform_preds_shape(self):
        coords = np.array([[10.0, 20.0], [30.0, 40.0]])
        out = transform_preds(coords, [100.0, 100.0], 1.0, (64, 64))
        assert out.shape == (2, 2)


class TestCrop:
    def test_identity_crop(self):
        # center = middle of image, scale = H/200, res = H: near-identity warp.
        rng = np.random.RandomState(0)
        img = rng.rand(200, 200, 3)
        out = crop(img, [99.5, 99.5], 1.0, (200, 200), rot=0)
        # get_transform maps src x=c to out 0.5*res + 0.5 offset; identity up to
        # a half-pixel shift -> compare interior via the known shift.
        t = get_transform([99.5, 99.5], 1.0, (200, 200))
        shift = t[:2, 2]
        # shift should be exactly [0.16, 0.16]: 200*(-99.5/200+0.5)=0.5? compute:
        np.testing.assert_allclose(shift, [0.5, 0.5], atol=1e-9)
        # out[y, x] = img[y - 0.5, x - 0.5] bilinear = avg of 4 neighbors
        expect = (
            img[0:-1, 0:-1] + img[1:, 0:-1] + img[0:-1, 1:] + img[1:, 1:]
        ) / 4.0
        np.testing.assert_allclose(out[1:, 1:], expect, atol=1e-9)

    def test_zero_border(self):
        img = np.ones((50, 50, 1))
        # Box much larger than the image: corners of the crop fall outside.
        out = crop(img, [25.0, 25.0], 1.0, (64, 64), rot=0)
        assert out[0, 0, 0] == 0.0
        assert out[32, 32, 0] == 1.0

    def test_rotation_180(self):
        rng = np.random.RandomState(1)
        img = rng.rand(64, 64, 1)
        c, s = [31.5, 31.5], 64.0 / 200.0
        out0 = crop(img, c, s, (64, 64), rot=0)
        out180 = crop(img, c, s, (64, 64), rot=180)
        np.testing.assert_allclose(
            out180[1:, 1:], out0[1:, 1:][::-1, ::-1], atol=1e-9
        )


class TestFlip:
    def test_fliplr_involution(self):
        rng = np.random.RandomState(2)
        img = rng.rand(10, 12, 3)
        np.testing.assert_array_equal(fliplr(fliplr(img)), img)

    def test_shufflelr_mpii(self):
        pts = np.arange(32, dtype=np.float64).reshape(16, 2)
        out = shufflelr(pts, width=256, dataset="mpii")
        # r-ankle (0) <-> l-ankle (5)
        np.testing.assert_allclose(out[0, 1], pts[5, 1])
        np.testing.assert_allclose(out[5, 1], pts[0, 1])
        np.testing.assert_allclose(out[0, 0], 256 - pts[5, 0])
        # pelvis (6) unswapped
        np.testing.assert_allclose(out[6, 0], 256 - pts[6, 0])

    def test_shufflelr_involution(self):
        rng = np.random.RandomState(3)
        pts = rng.rand(16, 2) * 100
        out = shufflelr(shufflelr(pts, 256, "mpii"), 256, "mpii")
        np.testing.assert_allclose(out, pts)


class TestColorNormalize:
    def test_mean_subtract(self):
        img = np.full((4, 4, 3), 0.5)
        out = color_normalize(img, [0.1, 0.2, 0.3])
        np.testing.assert_allclose(out[0, 0], [0.4, 0.3, 0.2])


class TestDrawLabelmap:
    def test_peak_and_neighbors(self):
        hm = np.zeros((64, 64))
        out, vis = draw_labelmap(hm, (30, 20), sigma=1)
        assert vis == 1
        assert out[20, 30] == 1.0
        np.testing.assert_allclose(out[20, 31], np.exp(-0.5))
        np.testing.assert_allclose(out[21, 31], np.exp(-1.0))
        # truncation: zero at Chebyshev distance 4
        assert out[20, 34] == 0.0
        assert out[24, 30] == 0.0
        np.testing.assert_allclose(out[20, 33], np.exp(-4.5))

    def test_out_of_bounds_invisible(self):
        hm = np.zeros((64, 64))
        out, vis = draw_labelmap(hm, (70, 20), sigma=1)
        assert vis == 0
        assert out.sum() == 0.0
        out, vis = draw_labelmap(hm, (-5, 20), sigma=1)
        assert vis == 0

    def test_partial_window_visible(self):
        hm = np.zeros((64, 64))
        out, vis = draw_labelmap(hm, (0, 0), sigma=1)
        assert vis == 1
        assert out[0, 0] == 1.0
        assert out.sum() > 1.0

    def test_edge_window_still_visible(self):
        # Window overlaps the map by one row/col -> still visible.
        hm = np.zeros((64, 64))
        out, vis = draw_labelmap(hm, (66, 66), sigma=1)
        assert vis == 1
        np.testing.assert_allclose(out[63, 63], np.exp(-9.0))

    def test_gaussian_patch_golden(self):
        g = gaussian_patch(1)
        assert g.shape == (7, 7)
        assert g[3, 3] == 1.0
        np.testing.assert_allclose(g[3, 4], np.exp(-0.5))
        np.testing.assert_allclose(g[0, 0], np.exp(-9.0))


class TestEvaluation:
    def _mk_heatmaps(self, peaks, res=(64, 64)):
        N = len(peaks)
        K = len(peaks[0])
        hm = np.zeros((N, K, res[0], res[1]))
        for n in range(N):
            for k, (x, y) in enumerate(peaks[n]):
                hm[n, k], _ = draw_labelmap(hm[n, k], (x, y), sigma=1)
        return hm

    def test_get_preds_one_indexed(self):
        hm = self._mk_heatmaps([[(30, 20), (5, 7)]])
        preds = get_preds(hm)
        np.testing.assert_array_equal(preds[0, 0], [31, 21])
        np.testing.assert_array_equal(preds[0, 1], [6, 8])

    def test_get_preds_masks_empty(self):
        hm = np.zeros((1, 2, 64, 64))
        hm[0, 0, 10, 12] = 1.0
        preds = get_preds(hm)
        np.testing.assert_array_equal(preds[0, 1], [0, 0])

    def test_calc_dists_and_acc(self):
        preds = np.array([[[10.0, 10.0], [20.0, 20.0]]])
        target = np.array([[[10.0, 13.0], [0.0, 0.0]]])
        dists = calc_dists(preds, target, np.array([6.4]))
        np.testing.assert_allclose(dists[0, 0], 3.0 / 6.4)
        assert dists[1, 0] == -1

    def test_accuracy_perfect(self):
        hm = self._mk_heatmaps([[(30, 20), (5, 7)]])
        acc = accuracy(hm, hm.copy())
        np.testing.assert_allclose(acc[0], 1.0)

    def test_accuracy_off_by_far(self):
        out = self._mk_heatmaps([[(10, 10)]])
        tgt = self._mk_heatmaps([[(50, 50)]])
        acc = accuracy(out, tgt)
        np.testing.assert_allclose(acc[0], 0.0)

    def test_final_preds_quarter_offset(self):
        hm = np.zeros((1, 1, 64, 64))
        hm[0, 0, 20, 30] = 1.0
        hm[0, 0, 20, 31] = 0.5  # pull +x
        hm[0, 0, 21, 30] = 0.4  # pull +y
        # identity-ish affine: center mid, scale maps 64 -> 64
        c = np.array([[31.5, 31.5]])
        s = np.array([64.0 / 200.0])
        preds = final_preds(hm, c, s, (64, 64))
        # coords (31,21) + (0.25,0.25) offset + 0.5 -> (31.75, 21.75), then
        # near-identity inverse affine with integer truncation.
        assert preds.shape == (1, 1, 2)
        assert abs(preds[0, 0, 0] - 31.75) <= 1.0
        assert abs(preds[0, 0, 1] - 21.75) <= 1.0

    def test_final_preds_offset_direction(self):
        hm = np.zeros((1, 1, 64, 64))
        hm[0, 0, 20, 30] = 1.0
        hm[0, 0, 20, 29] = 0.5  # pull -x
        coords = get_preds(hm)
        np.testing.assert_array_equal(coords[0, 0], [31, 21])
        # direct quarter-offset check on decode path happens in device tests;
        # here assert sign convention via final_preds on identity transform
        c = np.array([[31.5, 31.5]])
        s = np.array([64.0 / 200.0])
        p_pull_left = final_preds(hm, c, s, (64, 64))
        hm[0, 0, 20, 29] = 0.0
        hm[0, 0, 20, 31] = 0.5  # pull +x
        p_pull_right = final_preds(hm, c, s, (64, 64))
        assert p_pull_right[0, 0, 0] >= p_pull_left[0, 0, 0]
