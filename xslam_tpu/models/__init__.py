"""SLAM engines built from the op library."""

from . import kinfu
from .kinfu import SlamState, XSlamEngine

__all__ = ["kinfu", "XSlamEngine", "SlamState"]
