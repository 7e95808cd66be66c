"""Device mesh construction and sharding specs.

New component with no reference counterpart (X-SLAM is single-process,
single-GPU; SURVEY.md §2.E): the scaling axes of dense SLAM are the map
(TSDF X-slabs, analogous to tensor parallelism) and the pixels/rays
(analogous to data parallelism). One 1-D mesh axis ``space`` serves both —
volume ops shard over X-slabs, the ICP reduction shards over pixel rows and
psums the 6x7 system over the same axis.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

SPACE_AXIS = "space"


def make_space_mesh(n_devices: Optional[int] = None) -> Mesh:
    devices = jax.devices()
    n = n_devices or len(devices)
    return Mesh(np.array(devices[:n]), (SPACE_AXIS,))


def volume_sharding(mesh: Mesh) -> NamedSharding:
    """(X, Y, Z) volumes sharded over X-slabs."""
    return NamedSharding(mesh, P(SPACE_AXIS, None, None))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def rows_sharding(mesh: Mesh) -> NamedSharding:
    """(3, H, W) or (H, W) maps sharded over image rows (H)."""
    return NamedSharding(mesh, P(None, SPACE_AXIS, None))
