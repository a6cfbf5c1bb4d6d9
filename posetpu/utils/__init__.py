"""Utilities: reference-format txt logger, running meters (SURVEY.md §2
C11)."""

from posetpu.utils.logger import AverageMeter, Logger

__all__ = ["AverageMeter", "Logger"]
