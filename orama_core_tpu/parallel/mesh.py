"""Device mesh construction.

The reference is single-node ("Multi-node setup" is a roadmap entry,
README.md:27); here multi-chip is a day-one design: documents shard across
the ``data`` axis of a `jax.sharding.Mesh` (each chip owns a contiguous doc
range and its postings/vectors), and the embedding model optionally shards
across ``model`` (tensor parallel). Queries fan out to all shards via
`shard_map`; per-shard top-k results merge with one all-gather over ICI
(SURVEY.md §2.3, §7).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(
    shape: Optional[Sequence[int]] = None,
    axis_names: Tuple[str, ...] = (DATA_AXIS, MODEL_AXIS),
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if not shape:
        shape = (n, 1)
    shape = tuple(shape)
    if int(np.prod(shape)) != n:
        raise ValueError(f"mesh shape {shape} != {n} devices")
    arr = np.asarray(devices).reshape(shape)
    return Mesh(arr, axis_names[: len(shape)])


def data_sharding(mesh: Mesh, rank: int = 1) -> NamedSharding:
    """Shard leading dim over the data axis, replicate the rest."""
    spec = [None] * rank
    spec[0] = DATA_AXIS
    return NamedSharding(mesh, P(*spec))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
