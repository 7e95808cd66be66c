"""Native (C++) runtime bindings: PNG decode, prefetch, PLY export."""

from . import native

__all__ = ["native"]
