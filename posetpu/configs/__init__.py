"""Typed experiment configs (SURVEY.md §2 C12 rebuilt as dataclasses with
argparse overrides; §5.6).  Flag names mirror the reference CLI
(`--stacks --blocks --sigma --scale-factor --rot-factor --lr --schedule
--resume ...`) so reference users find the same knobs."""

from posetpu.configs.config import (
    AgentConfig,
    AugConfig,
    ExperimentConfig,
    ModelConfig,
    OptimConfig,
    named_config,
    NAMED_CONFIGS,
    add_overrides,
    apply_overrides,
)

__all__ = [
    "AgentConfig",
    "AugConfig",
    "ExperimentConfig",
    "ModelConfig",
    "OptimConfig",
    "named_config",
    "NAMED_CONFIGS",
    "add_overrides",
    "apply_overrides",
]
