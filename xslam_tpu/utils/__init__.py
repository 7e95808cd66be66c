"""Timing, evaluation, checkpointing, logging."""

from . import evaluation, timers
from .timers import Timer

__all__ = ["timers", "evaluation", "Timer"]
