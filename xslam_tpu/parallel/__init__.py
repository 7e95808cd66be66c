"""Multi-chip sharding: mesh, halo-exchange volume stages, sharded engine."""

from . import mesh, sharded
from .mesh import SPACE_AXIS, make_space_mesh

__all__ = ["mesh", "sharded", "make_space_mesh", "SPACE_AXIS"]
