"""Config/CLI tests (SURVEY.md §2 C12): named configs match the five
BASELINE.json build configs, and the reference-named CLI flags map onto
the dataclass fields through apply_overrides."""

import pytest

from posetpu.configs import NAMED_CONFIGS, named_config
from posetpu.train.cli import build_parser


def _parse(argv):
    from posetpu.configs import apply_overrides

    args = build_parser().parse_args(argv)
    cfg = named_config(args.config)
    return apply_overrides(cfg, args)


class TestNamedConfigs:
    def test_five_reference_configs_present(self):
        # BASELINE.json:6-12 — one named config per reference build config
        for name in (
            "hg2_mpii_mini",
            "hg8_mpii",
            "hg8_mpii_asr",
            "hg8_lsp_aho",
            "hg8_mpii_384_dp8",
        ):
            assert name in NAMED_CONFIGS

    def test_named_config_returns_fresh_copy(self):
        a = named_config("hg8_mpii")
        a.model.stacks = 1
        assert named_config("hg8_mpii").model.stacks == 8


class TestCliOverrides:
    def test_reference_flag_names(self):
        cfg = _parse(
            [
                "--config", "hg8_mpii",
                "--stacks", "2",
                "--blocks", "2",
                "--sigma", "2.0",
                "--scale-factor", "0.3",
                "--rot-factor", "45",
                "--lr", "1e-3",
                "--epochs", "3",
                "--train-batch", "12",
                "--schedule", "10", "20",
                "--seed", "5",
            ]
        )
        assert cfg.model.stacks == 2 and cfg.model.blocks == 2
        assert cfg.aug.sigma == 2.0
        assert cfg.aug.scale_factor == 0.3 and cfg.aug.rot_factor == 45
        assert cfg.optim.lr == 1e-3 and cfg.optim.epochs == 3
        assert cfg.batch_size == 12
        assert cfg.optim.schedule == (10, 20)
        assert cfg.seed == 5

    def test_agent_flags(self):
        cfg = _parse(
            [
                "--config", "hg8_mpii_asr",
                "--occ-mode", "parts",
                "--occ-nodes", "9",
                "--agent-update-every", "2",
            ]
        )
        assert cfg.agent.occ_mode == "parts"
        assert cfg.agent.occ_nodes == 9
        assert cfg.agent.update_every == 2

    def test_aug_backend_flags(self):
        # ADVICE r4 (medium): the rasterizer choice must be revertible from
        # the CLI; warp-table is the matching A/B knob
        cfg = _parse(
            ["--config", "hg8_mpii", "--raster-backend", "pallas",
             "--warp-table", "packed32"]
        )
        assert cfg.aug.raster_backend == "pallas"
        assert cfg.aug.warp_table == "packed32"
        # defaults follow the 2026-08-18 hardware A/Bs: xla rasterizer
        # (pallas measured -1.4%) + packed32 warp table (+3.7%, bit-exact)
        dflt = _parse(["--config", "hg8_mpii"])
        assert dflt.aug.raster_backend == "xla"
        assert dflt.aug.warp_table == "packed32"
        assert _parse(
            ["--config", "hg8_mpii", "--warp-table", "u8"]
        ).aug.warp_table == "u8"

    def test_scan_stacks_flag(self):
        cfg = _parse(["--config", "hg8_mpii", "--scan-stacks"])
        assert cfg.model.scan_stacks is True
        assert _parse(["--config", "hg8_mpii"]).model.scan_stacks is False

    def test_boolean_flags(self):
        cfg = _parse(
            ["--config", "hg2_mpii_mini", "--synthetic", "--tensorboard",
             "--no-color-jitter"]
        )
        assert cfg.synthetic and cfg.tensorboard
        assert cfg.aug.color_jitter is False

    def test_no_override_keeps_defaults(self):
        cfg = _parse(["--config", "hg8_mpii"])
        ref = named_config("hg8_mpii")
        assert cfg.model.stacks == ref.model.stacks
        assert cfg.optim.lr == ref.optim.lr
        assert cfg.agent.occ_mode == ref.agent.occ_mode

    def test_unknown_config_rejected(self):
        with pytest.raises(SystemExit):
            build_parser().parse_args(["--config", "nope"])
