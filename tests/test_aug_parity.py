"""Device-op vs oracle parity (SURVEY.md §4.1) — the fp-parity bar of
BASELINE.json:5: affine matrices, bilinear warp, keypoint transform, and the
Gaussian rasterizer must match the numpy oracles within fp tolerance."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from posetpu.aug import (
    affine_warp,
    augment_batch,
    invert_affine,
    make_transform,
    neutral_params,
    rasterize_gaussians,
    sample_aug_params,
    transform_points,
    AugParams,
)
from posetpu.oracles import (
    crop as oracle_crop,
    draw_labelmap,
    get_transform as oracle_get_transform,
    shufflelr,
    transform as oracle_transform,
)
from posetpu.oracles.imutils import rasterize_targets

CASES = [
    # (center, scale, rot)
    ([100.0, 120.0], 1.0, 0.0),
    ([50.0, 80.0], 1.5, 30.0),
    ([200.0, 100.0], 0.8, -45.0),
    ([123.0, 77.0], 2.0, 13.0),
]


def assert_trunc_parity(dev, ref, cont, eps=5e-3):
    """Assert truncated-coordinate parity, permitting ±1 only where the
    continuous f64 coordinate sits within ``eps`` of an integer — there f32
    vs f64 rounding legitimately lands on either side of the truncation."""
    dev = np.asarray(dev, np.float64)
    ref = np.asarray(ref, np.float64)
    cont = np.asarray(cont, np.float64)
    exact = dev == ref
    boundary = np.abs(cont - np.round(cont)) < eps
    ok = exact | (boundary & (np.abs(dev - ref) <= 1))
    assert ok.all(), f"trunc mismatch:\ndev={dev}\nref={ref}\ncont={cont}"


class TestAffineParity:
    @pytest.mark.parametrize("res", [(256, 256), (64, 64), (384, 384)])
    def test_matrix_matches_oracle(self, res):
        centers = np.array([c for c, _, _ in CASES])
        scales = np.array([s for _, s, _ in CASES])
        rots = np.array([r for _, _, r in CASES])
        t_dev = np.asarray(make_transform(centers, scales, res, rots))
        for i, (c, s, r) in enumerate(CASES):
            t_ref = oracle_get_transform(c, s, res, rot=r)
            np.testing.assert_allclose(t_dev[i], t_ref, rtol=1e-5, atol=1e-4)

    def test_invert_affine(self):
        centers = np.array([c for c, _, _ in CASES])
        scales = np.array([s for _, s, _ in CASES])
        rots = np.array([r for _, _, r in CASES])
        t = make_transform(centers, scales, (256, 256), rots)
        ti = invert_affine(t)
        prod = np.asarray(t) @ np.asarray(ti)  # product in numpy: exact f32
        for i in range(len(CASES)):
            np.testing.assert_allclose(prod[i], np.eye(3), atol=1e-4)

    def test_transform_points_matches_oracle(self):
        rng = np.random.RandomState(0)
        pts = rng.randint(1, 250, size=(len(CASES), 16, 2)).astype(np.float64)
        centers = np.array([c for c, _, _ in CASES])
        scales = np.array([s for _, s, _ in CASES])
        rots = np.array([r for _, _, r in CASES])
        t = make_transform(centers, scales, (64, 64), rots)
        out = np.asarray(transform_points(pts, t, truncate=True))
        from posetpu.oracles.transforms import transform_float

        for i, (c, s, r) in enumerate(CASES):
            for k in range(16):
                ref = oracle_transform(pts[i, k], c, s, (64, 64), rot=r)
                cont = transform_float(pts[i, k], c, s, (64, 64), rot=r)
                assert_trunc_parity(out[i, k], ref, cont)

    def test_int_float_pair_ulp_below_integer(self):
        # Regression (ADVICE r3): trunc((out+1)-1) != trunc(out) in f32 for
        # raw coords 1-2 ulp below an integer — out=1-2^-24 has out+1 round
        # to 2.0 exactly, so the +1 round-trip truncates to 1 instead of 0.
        # transform_points_int_float must truncate the raw 0-indexed map.
        from posetpu.aug.affine import transform_points_int_float
        import jax.numpy as jnp

        eps_out = np.float32(1.0) - np.float32(2.0**-24)  # largest f32 < 1
        # identity linear part, translation c: raw out = (pts - 1) + c
        t = np.zeros((1, 3, 3), np.float32)
        t[0, 0, 0] = t[0, 1, 1] = t[0, 2, 2] = 1.0
        t[0, 0, 2] = t[0, 1, 2] = eps_out
        pts = jnp.ones((1, 1, 2), jnp.float32)  # x-1 = 0 -> out = eps_out
        ints, floats = transform_points_int_float(pts, jnp.asarray(t))
        ints, floats = np.asarray(ints), np.asarray(floats)
        # reference semantics: astype(int) + 1 on the raw map -> 0 + 1 = 1
        np.testing.assert_array_equal(ints[0, 0], [1.0, 1.0])
        # the float view keeps the (rounded) +1 offset value
        np.testing.assert_array_equal(floats[0, 0], [2.0, 2.0])
        # and matches transform_points(truncate=True) on the same inputs
        via_trunc = np.asarray(transform_points(pts, jnp.asarray(t)))
        np.testing.assert_array_equal(ints, via_trunc)


class TestWarpParity:
    def test_matches_oracle_crop(self):
        rng = np.random.RandomState(1)
        img = rng.rand(240, 320, 3).astype(np.float32)
        B = len(CASES)
        imgs = np.broadcast_to(img, (B, 240, 320, 3))
        centers = np.array([c for c, _, _ in CASES])
        scales = np.array([s for _, s, _ in CASES])
        rots = np.array([r for _, _, r in CASES])
        t = make_transform(centers, scales, (256, 256), rots)
        out = np.asarray(affine_warp(imgs, t, (256, 256)))
        for i, (c, s, r) in enumerate(CASES):
            ref = oracle_crop(img, c, s, (256, 256), rot=r)
            np.testing.assert_allclose(out[i], ref, atol=2e-4)

    def test_packed32_table_bit_exact(self):
        # packed32 moves the SAME integers through a uint32 lane (pack ->
        # gather -> unpack), so the result must be bitwise identical to the
        # u8 table path on uint8 sources — incl. borders, ragged valid_wh,
        # and src_index fan-out.
        rng = np.random.RandomState(7)
        B = len(CASES)
        imgs = rng.randint(0, 256, (B, 120, 160, 3), dtype=np.uint8)
        centers = np.array([c for c, _, _ in CASES]) * 0.5
        scales = np.array([s for _, s, _ in CASES])
        rots = np.array([r for _, _, r in CASES])
        t = make_transform(centers, scales, (64, 64), rots)
        valid_wh = np.tile(np.array([[150, 110]], np.int32), (B, 1))
        src = np.array([i // 2 for i in range(B)], np.int32)  # fan-out
        a = np.asarray(
            affine_warp(imgs, t, (64, 64), valid_wh=valid_wh, src_index=src)
        )
        b = np.asarray(
            affine_warp(
                imgs, t, (64, 64), valid_wh=valid_wh, src_index=src,
                table_format="packed32",
            )
        )
        np.testing.assert_array_equal(a, b)

    def test_packed32_through_augment_batch(self):
        # the config knob threads through the full pipeline identically
        import jax
        import jax.numpy as jnp

        from posetpu.aug import augment_batch, neutral_params

        rng = np.random.RandomState(9)
        B, K = 3, 16
        imgs = rng.randint(0, 256, (B, 96, 128, 3), dtype=np.uint8)
        kw = dict(
            valid_wh=np.tile(np.array([[128, 96]], np.int32), (B, 1)),
            center=np.tile(np.array([[64.0, 48.0]], np.float32), (B, 1)),
            scale=np.full((B,), 0.4, np.float32),
            pts=(rng.rand(B, K, 2) * 80 + 10).astype(np.float32),
            vis=np.ones((B, K), np.float32),
        )
        p = neutral_params(B)
        a = augment_batch(imgs, kw["valid_wh"], kw["center"], kw["scale"],
                          kw["pts"], kw["vis"], p, inp_res=(64, 64),
                          out_res=(16, 16))
        b = augment_batch(imgs, kw["valid_wh"], kw["center"], kw["scale"],
                          kw["pts"], kw["vis"], p, inp_res=(64, 64),
                          out_res=(16, 16), warp_table="packed32")
        for key in a:
            np.testing.assert_array_equal(
                np.asarray(a[key]), np.asarray(b[key]), err_msg=key
            )

    def test_packed32_falls_back_on_float_input(self):
        rng = np.random.RandomState(8)
        img = rng.rand(2, 50, 60, 3).astype(np.float32)
        t = make_transform(
            np.array([[30.0, 25.0]] * 2), np.array([0.3, 0.3]), (32, 32),
            np.array([0.0, 10.0]),
        )
        a = np.asarray(affine_warp(img, t, (32, 32)))
        b = np.asarray(affine_warp(img, t, (32, 32), table_format="packed32"))
        np.testing.assert_array_equal(a, b)

    def test_valid_wh_padding_equivalence(self):
        # Warping a padded image with valid_wh must equal warping the
        # unpadded image.
        rng = np.random.RandomState(2)
        img = rng.rand(100, 150, 3).astype(np.float32)
        padded = np.zeros((1, 240, 320, 3), np.float32)
        padded[0, :100, :150] = img
        c, s, r = [75.0, 50.0], 0.6, 20.0
        t = make_transform(np.array([c]), np.array([s]), (256, 256), np.array([r]))
        out_pad = np.asarray(
            affine_warp(padded, t, (256, 256), valid_wh=jnp.array([[150, 100]]))
        )
        out_ref = oracle_crop(img, c, s, (256, 256), rot=r)
        np.testing.assert_allclose(out_pad[0], out_ref, atol=2e-4)

    def test_padding_leak(self):
        # Nonzero garbage in the padding must not leak through valid_wh.
        img = np.ones((1, 64, 64, 3), np.float32) * 7.0
        img[0, :32, :32] = 0.5
        t = make_transform(
            np.array([[15.5, 15.5]]), np.array([32 / 200.0]), (32, 32), np.array([0.0])
        )
        out = np.asarray(affine_warp(img, t, (32, 32), valid_wh=jnp.array([[32, 32]])))
        assert out.max() <= 0.5 + 1e-6


class TestRandomizedParitySweep:
    """Seeded randomized sweep over the augmentation-parameter space
    (beyond the four golden CASES): warp and point-transform parity must
    hold across the full (center, scale, rotation) ranges the training
    recipes draw from, including half-pixel centers, near-±rot_factor·2
    rotations, and sub-/super-unit scales."""

    N = 48

    def _draws(self):
        rng = np.random.RandomState(42)
        centers = np.stack(
            [rng.uniform(20, 300, self.N), rng.uniform(20, 220, self.N)], 1
        )
        # exercise exact half-pixel centers (the crop-window rounding edge
        # a round-2 review fix addressed) on a quarter of the draws
        half = rng.rand(self.N) < 0.25
        centers[half] = np.floor(centers[half]) + 0.5
        scales = rng.uniform(0.5, 2.5, self.N)
        rots = rng.uniform(-60.0, 60.0, self.N)
        rots[rng.rand(self.N) < 0.1] = 0.0  # the un-rotated fast path too
        return centers, scales, rots

    def test_warp_matches_oracle_sweep(self):
        rng = np.random.RandomState(7)
        img = rng.rand(240, 320, 3).astype(np.float32)
        centers, scales, rots = self._draws()
        imgs = np.broadcast_to(img, (self.N, 240, 320, 3))
        t = make_transform(centers, scales, (64, 64), rots)
        out = np.asarray(affine_warp(imgs, t, (64, 64)))
        for i in range(self.N):
            ref = oracle_crop(
                img, centers[i], scales[i], (64, 64), rot=rots[i]
            )
            np.testing.assert_allclose(
                out[i], ref, atol=2e-4,
                err_msg=f"draw {i}: c={centers[i]} s={scales[i]:.3f} "
                f"r={rots[i]:.2f}",
            )

    def test_point_transform_matches_oracle_sweep(self):
        centers, scales, rots = self._draws()
        rng = np.random.RandomState(8)
        pts = np.stack(
            [rng.uniform(0, 320, (self.N, 16)), rng.uniform(0, 240, (self.N, 16))],
            -1,
        )
        t = make_transform(centers, scales, (64, 64), rots)
        dev = np.asarray(transform_points(jnp.asarray(pts), t))
        for i in range(self.N):
            for k in range(16):
                ref = oracle_transform(
                    pts[i, k], centers[i], scales[i], (64, 64), rot=rots[i]
                )
                np.testing.assert_allclose(
                    dev[i, k], ref, atol=5e-3,
                    err_msg=f"draw {i} joint {k}: c={centers[i]} "
                    f"s={scales[i]:.3f} r={rots[i]:.2f}",
                )


class TestRasterizerParity:
    def test_matches_oracle_many_points(self):
        rng = np.random.RandomState(3)
        # include in-bounds, boundary, and out-of-bounds points
        pts = rng.randint(-10, 74, size=(8, 16, 2)).astype(np.float64)
        vis = rng.randint(0, 2, size=(8, 16)).astype(np.float64)
        tgt_dev, vis_dev = rasterize_gaussians(pts, vis, (64, 64), sigma=1.0)
        tgt_dev = np.asarray(tgt_dev)
        vis_dev = np.asarray(vis_dev)
        for b in range(8):
            ref_t, ref_v = rasterize_targets(pts[b], vis[b], 16, (64, 64), sigma=1)
            np.testing.assert_allclose(tgt_dev[b], ref_t, atol=1e-5)
            np.testing.assert_array_equal(vis_dev[b], ref_v.astype(np.float64))

    def test_sigma2(self):
        pts = np.array([[[30.0, 20.0], [2.0, 62.0]]])
        vis = np.ones((1, 2))
        tgt_dev, _ = rasterize_gaussians(pts, vis, (64, 64), sigma=2.0)
        for k in range(2):
            ref_t, _ = draw_labelmap(np.zeros((64, 64)), pts[0, k], sigma=2)
            np.testing.assert_allclose(np.asarray(tgt_dev)[0, k], ref_t, atol=1e-5)

    def test_boundary_visibility(self):
        # pt=66 with sigma 1: window [63,70) overlaps by one -> visible;
        # pt=67: window [64,71) -> invisible (reference rule).
        pts = np.array([[[66.0, 10.0], [67.0, 10.0], [10.0, -4.0], [10.0, -5.0]]])
        vis = np.ones((1, 4))
        _, v = rasterize_gaussians(pts, vis, (64, 64), sigma=1.0)
        np.testing.assert_array_equal(np.asarray(v)[0], [1.0, 0.0, 1.0, 0.0])


class TestAugmentBatch:
    def _sample(self, B=2, K=16, H=128, W=160, seed=0):
        # Generic (non-grid-aligned) geometry: exact integer-boundary points
        # truncate differently in f32 vs the f64 oracle (measure-zero set),
        # so parity tests must avoid them — real data never aligns exactly.
        rng = np.random.RandomState(seed)
        images = rng.rand(B, H, W, 3).astype(np.float32)
        valid_wh = jnp.array([[W, H]] * B)
        center = jnp.array([[W / 2.0 + 0.37, H / 2.0 + 0.19]] * B)
        scale = jnp.array([H / 200.0 * 1.07] * B)
        pts = jnp.asarray(
            rng.randint(30, 100, size=(B, K, 2)).astype(np.float32) + 0.23
        )
        vis = jnp.ones((B, K))
        return images, valid_wh, center, scale, pts, vis

    @pytest.mark.slow
    def test_neutral_shapes_and_vals(self):
        images, valid_wh, center, scale, pts, vis = self._sample()
        out = augment_batch(
            images, valid_wh, center, scale, pts, vis, neutral_params(2)
        )
        assert out["input"].shape == (2, 256, 256, 3)
        assert out["target"].shape == (2, 16, 64, 64)
        assert out["target_weight"].shape == (2, 16)
        # all joints visible for interior points
        assert float(out["target_weight"].sum()) == 32.0
        # peak value exactly 1.0 for joints whose peak lies inside the map
        tpts = np.asarray(out["tpts"]) - 1.0  # 0-indexed
        peaks = np.asarray(out["target"]).max(axis=(2, 3))
        inside = np.all((tpts >= 0) & (tpts < 64), axis=-1)
        assert inside.sum() > 20  # the sample must exercise the common case
        np.testing.assert_allclose(peaks[inside], 1.0, atol=1e-6)

    @pytest.mark.slow
    def test_neutral_matches_oracle_end_to_end(self):
        images, valid_wh, center, scale, pts, vis = self._sample(B=1)
        out = augment_batch(
            images, valid_wh, center, scale, pts, vis, neutral_params(1)
        )
        ref_img = np.asarray(
            augment_batch.__wrapped__(
                images, valid_wh, center, scale, pts, vis, neutral_params(1)
            )["input"]
            if hasattr(augment_batch, "__wrapped__")
            else out["input"]
        )
        c = np.asarray(center[0])
        s = float(scale[0])
        ref = oracle_crop(np.asarray(images[0]), c, s, (256, 256), rot=0)
        np.testing.assert_allclose(np.asarray(out["input"][0]), ref, atol=2e-4)
        # target pts match oracle transform per joint
        from posetpu.oracles.transforms import transform_float

        for k in range(16):
            tref = oracle_transform(np.asarray(pts[0, k]), c, s, (64, 64), rot=0)
            cont = transform_float(np.asarray(pts[0, k]), c, s, (64, 64), rot=0)
            assert_trunc_parity(np.asarray(out["tpts"][0, k]), tref, cont)

    def test_flip_consistency(self):
        # Flipped sample: warped image equals fliplr of the neutral warp of
        # the mirrored-center crop; keypoints pass through shufflelr.
        images, valid_wh, center, scale, pts, vis = self._sample(B=1, seed=4)
        params = AugParams(
            scale_factor=jnp.ones((1,)),
            rot=jnp.zeros((1,)),
            flip=jnp.ones((1,), bool),
        )
        out = augment_batch(
            images, valid_wh, center, scale, pts, vis, params
        )
        W = int(valid_wh[0, 0])
        # oracle: flip image + mirror center, then crop
        img_f = np.asarray(images[0])[:, ::-1, :]
        c = np.asarray(center[0]).copy()
        c[0] = W - c[0]
        ref = oracle_crop(img_f, c, float(scale[0]), (256, 256), rot=0)
        np.testing.assert_allclose(np.asarray(out["input"][0]), ref, atol=2e-4)
        # keypoints: shufflelr then transform
        pts_f = shufflelr(np.asarray(pts[0]), W, "mpii")
        for k in range(16):
            tref = oracle_transform(pts_f[k], c, float(scale[0]), (64, 64), rot=0)
            np.testing.assert_allclose(np.asarray(out["tpts"][0, k]), tref, atol=1e-5)

    def test_sample_aug_params_ranges(self):
        key = jax.random.PRNGKey(0)
        p = sample_aug_params(key, 512, scale_factor=0.25, rot_factor=30.0)
        sf = np.asarray(p.scale_factor)
        rot = np.asarray(p.rot)
        assert sf.min() >= 2.0**-0.5 - 1e-6 and sf.max() <= 2.0**0.5 + 1e-6
        assert rot.min() >= -60.0 and rot.max() <= 60.0
        assert 0.2 < np.mean(rot == 0.0) < 0.6  # ~40% zeroed
        assert 0.3 < np.mean(np.asarray(p.flip)) < 0.7

    def test_jit_compiles(self):
        images, valid_wh, center, scale, pts, vis = self._sample()
        fn = jax.jit(
            lambda im, p: augment_batch(im, valid_wh, center, scale, pts, vis, p)
        )
        out = fn(images, neutral_params(2))
        assert out["input"].shape == (2, 256, 256, 3)
