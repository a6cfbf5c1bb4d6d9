"""Official-release annotation converters (VERDICT r4 item 4).

The real `mpii_human_pose_v1_u12_1.mat` / LSP `joints.mat` are not in this
environment, so these tests build synthetic OFFICIAL-FORMAT .mat fixtures
with scipy.io.savemat (nested structs exactly as loadmat returns them for
the real release), convert them, and check the resulting JSON against the
schema loader — plus the full readiness drill: official .mat -> converter
-> posetpu-train -> official-normalizer eval.
"""

import json
import os
import sys

import numpy as np
import pytest
from scipy.io import savemat

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))

import convert_lsp  # noqa: E402
import convert_mpii  # noqa: E402

from posetpu.data import schema  # noqa: E402
from posetpu.data.synthetic import make_synthetic_dataset  # noqa: E402


def _official_mat_from_schema(samples, mat_path, img_train=None):
    """Inverse converter (test-only): schema samples -> official RELEASE
    struct layout, one annotated rect per sample's image."""
    annolist, train_flags = [], []
    for s in samples:
        points = [
            {"x": float(x), "y": float(y), "id": j, "is_visible": int(v > 0)}
            for j, ((x, y), v) in enumerate(zip(s.pts, s.vis))
            if v > 0
        ]
        rect = {
            "objpos": {"x": float(s.center[0]), "y": float(s.center[1])},
            "scale": float(s.scale),
            "annopoints": {"point": np.array(points, dtype=object)},
        }
        if s.head_rect is not None:
            rect.update(
                x1=float(s.head_rect[0]), y1=float(s.head_rect[1]),
                x2=float(s.head_rect[2]), y2=float(s.head_rect[3]),
            )
        annolist.append(
            {
                "image": {"name": os.path.basename(s.img_path)},
                "annorect": np.array([rect], dtype=object),
            }
        )
        train_flags.append(1)
    if img_train is not None:
        train_flags = img_train
    release = {
        "annolist": np.array(annolist, dtype=object),
        "img_train": np.array(train_flags),
    }
    savemat(mat_path, {"RELEASE": release})


@pytest.fixture(scope="module")
def synth(tmp_path_factory):
    root = tmp_path_factory.mktemp("mpii_official")
    ann = make_synthetic_dataset(
        str(root), num_train=8, num_val=4, res=(320, 240), head_rects=True
    )
    return root, schema.load_annotations(ann)


class TestConvertMpii:
    def test_round_trip_preserves_geometry(self, synth, tmp_path):
        root, ref = synth
        mat = str(tmp_path / "release.mat")
        out = str(tmp_path / "converted.json")
        _official_mat_from_schema(ref, mat)
        n, n_val = convert_mpii.convert(mat, out)
        assert n == len(ref) and n_val == 0
        got = schema.load_annotations(out)
        for a, b in zip(ref, got):
            assert os.path.basename(a.img_path) == b.img_rel
            np.testing.assert_allclose(b.center, a.center)
            assert b.scale == pytest.approx(a.scale)
            np.testing.assert_allclose(b.pts[a.vis > 0], a.pts[a.vis > 0])
            np.testing.assert_array_equal(b.vis > 0, a.vis > 0)
            np.testing.assert_allclose(b.head_rect, a.head_rect)

    def test_unlabeled_joints_are_zero_rows(self, synth, tmp_path):
        root, ref = synth
        import copy

        mod = copy.deepcopy(ref)
        mod[0].vis = mod[0].vis.copy()
        mod[0].vis[3] = 0  # drop one joint from the official points list
        mat = str(tmp_path / "r.mat")
        out = str(tmp_path / "c.json")
        _official_mat_from_schema(mod, mat)
        convert_mpii.convert(mat, out)
        got = schema.load_annotations(out)
        assert got[0].vis[3] == 0
        np.testing.assert_allclose(got[0].pts[3], [0, 0])

    def test_val_list_sets_isValidation(self, synth, tmp_path):
        root, ref = synth
        mat = str(tmp_path / "r.mat")
        out = str(tmp_path / "c.json")
        lst = tmp_path / "val.txt"
        val_names = sorted({os.path.basename(s.img_path) for s in ref})[:3]
        lst.write_text("\n".join(val_names) + "\n")
        _official_mat_from_schema(ref, mat)
        n, n_val = convert_mpii.convert(mat, out, val_list=str(lst))
        got = schema.load_annotations(out)
        assert n_val == sum(
            1 for s in got if os.path.basename(s.img_path) in val_names
        )
        for s in got:
            assert s.is_validation == (
                os.path.basename(s.img_path) in val_names
            )

    def test_val_frac_is_deterministic_split(self, synth, tmp_path):
        root, ref = synth
        mat = str(tmp_path / "r.mat")
        _official_mat_from_schema(ref, mat)
        a, b = str(tmp_path / "a.json"), str(tmp_path / "b.json")
        n1, v1 = convert_mpii.convert(mat, a, val_frac=0.5)
        n2, v2 = convert_mpii.convert(mat, b, val_frac=0.5)
        assert (n1, v1) == (n2, v2) and 0 < v1 < n1
        with open(a) as f1, open(b) as f2:
            assert json.load(f1) == json.load(f2)

    def test_test_images_and_bare_rects_skipped(self, synth, tmp_path):
        root, ref = synth
        mat = str(tmp_path / "r.mat")
        out = str(tmp_path / "c.json")
        # mark the first image as TEST (img_train=0): its rect must not
        # be converted even though it carries annopoints
        flags = [0] + [1] * (len(ref) - 1)
        _official_mat_from_schema(ref, mat, img_train=flags)
        n, _ = convert_mpii.convert(mat, out)
        assert n == len(ref) - 1

    def test_cli_reports_counts(self, synth, tmp_path, capsys):
        root, ref = synth
        mat = str(tmp_path / "r.mat")
        out = str(tmp_path / "c.json")
        _official_mat_from_schema(ref, mat)
        assert convert_mpii.main([mat, out]) == 0
        assert f"wrote {len(ref)} samples" in capsys.readouterr().out


class TestConvertLsp:
    def _joints(self, n, rng):
        # plausible LSP poses: x in [30,110], y in [20,200]
        j = np.zeros((n, 14, 3))
        j[:, :, 0] = rng.uniform(30, 110, (n, 14))
        j[:, :, 1] = rng.uniform(20, 200, (n, 14))
        j[:, :, 2] = rng.randint(0, 2, (n, 14))
        return j

    def test_lsp_flavor_flips_occlusion_flag_and_splits(self, tmp_path):
        rng = np.random.RandomState(0)
        n = 1200  # crosses the official 1000-image train/test boundary
        j = self._joints(n, rng)
        mat = str(tmp_path / "joints.mat")
        out = str(tmp_path / "lsp.json")
        # official LSP layout: 3 x 14 x N, third row = occluded flag
        savemat(mat, {"joints": np.transpose(j, (2, 1, 0))})
        cnt, n_val = convert_lsp.convert(mat, out, flavor="lsp")
        assert cnt == n and n_val == n - 1000
        got = schema.load_annotations(out)
        assert got[0].img_rel == "im0001.jpg"
        assert got[1100].is_validation and not got[999].is_validation
        # occluded (flag 1) -> vis 0
        np.testing.assert_array_equal(got[0].vis, 1.0 - j[0, :, 2])
        assert got[0].num_joints == 14

    def test_lspet_flavor_uses_flag_as_visibility(self, tmp_path):
        rng = np.random.RandomState(1)
        j = self._joints(5, rng)
        j[2, 4] = 0  # unlabeled joint: (0,0) coords must force vis 0
        j[2, 4, 2] = 1
        mat = str(tmp_path / "joints.mat")
        out = str(tmp_path / "lspet.json")
        # official LSPET layout: 14 x 3 x N, third channel = visible flag
        savemat(mat, {"joints": np.transpose(j, (1, 2, 0))})
        cnt, n_val = convert_lsp.convert(mat, out, flavor="lspet")
        assert cnt == 5 and n_val == 0
        got = schema.load_annotations(out)
        assert got[0].img_rel == "im00001.jpg"
        np.testing.assert_array_equal(got[0].vis, j[0, :, 2])
        assert got[2].vis[4] == 0

    def test_center_scale_cover_labeled_joints(self, tmp_path):
        rng = np.random.RandomState(2)
        j = self._joints(3, rng)
        j[:, :, 2] = 0  # all occluded in LSP terms -> all visible after flip
        mat = str(tmp_path / "joints.mat")
        out = str(tmp_path / "x.json")
        savemat(mat, {"joints": np.transpose(j, (2, 1, 0))})
        convert_lsp.convert(mat, out, flavor="lsp", margin=1.4)
        for s in schema.load_annotations(out):
            half = 200.0 * s.scale / 2
            lab = s.vis > 0
            assert np.all(np.abs(s.pts[lab, 0] - s.center[0]) <= half + 1e-6)
            assert np.all(np.abs(s.pts[lab, 1] - s.center[1]) <= half + 1e-6)

    def test_wrong_layout_rejected(self, tmp_path):
        mat = str(tmp_path / "joints.mat")
        savemat(mat, {"joints": np.zeros((5, 5, 5))})
        with pytest.raises(ValueError):
            convert_lsp.convert(mat, str(tmp_path / "x.json"), flavor="lsp")


@pytest.mark.slow
class TestOfficialMatToTrainingDrill:
    """The VERDICT r4 item-4 done-criterion: synthetic official-format
    .mat -> converter -> posetpu-train -> posetpu-eval prints the
    official-normalizer PCKh line."""

    def test_mat_to_train_to_official_eval(self, tmp_path, capsys):
        import importlib.util

        from posetpu.train import cli

        root = tmp_path / "data"
        ann = make_synthetic_dataset(
            str(root), num_train=8, num_val=4, res=(320, 240),
            head_rects=True,
        )
        ref = schema.load_annotations(ann)
        val_names = sorted(
            os.path.basename(s.img_path) for s in ref if s.is_validation
        )
        mat = str(tmp_path / "release.mat")
        _official_mat_from_schema(ref, mat)
        lst = tmp_path / "val.txt"
        lst.write_text("\n".join(val_names) + "\n")
        conv = str(tmp_path / "annotations.json")
        n, n_val = convert_mpii.convert(mat, conv, val_list=str(lst))
        assert n == len(ref) and n_val == len(val_names)

        ckpt = str(tmp_path / "ckpt")
        common = [
            "--json", conv,
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
            "tools_evaluate", os.path.join(REPO, "tools", "evaluate.py")
        )
        ev = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(ev)
        pckh = ev.main(
            ["--config", "hg2_mpii_mini", "--best", "--cpu", *common]
        )
        out = capsys.readouterr().out
        assert np.isfinite(pckh) and 0.0 <= pckh <= 100.0
        assert "PCKh@0.5" in out
        # converted head boxes engage the OFFICIAL normalizer everywhere:
        # the keypoint-approximated fallback warning must NOT fire
        assert "keypoint-approximated" not in out
