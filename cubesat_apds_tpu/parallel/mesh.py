"""Device-mesh helpers for multi-chip execution.

The reference is single-process (SURVEY.md §2.3): rayon threads + two
mutexes, Postgres as the only cross-process channel. The TPU-native
scaling model is a jax.sharding.Mesh with two axes:

  * "dp" — data parallelism over frames/tiles (the rayon analogue);
  * "tp" — tensor parallelism over the descriptor-DB axis of the Hamming
    matmul, with an all-gather top-k merge riding ICI.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(dp: Optional[int] = None, tp: Optional[int] = None,
              devices: Optional[Sequence] = None) -> Mesh:
    """Build a (dp, tp) mesh over the available devices.

    Defaults: all devices on the tp axis (descriptor DBs outgrow frame
    batches long before the reverse).
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if dp is None and tp is None:
        dp, tp = 1, n
    elif dp is None:
        dp = n // tp
    elif tp is None:
        tp = n // dp
    assert dp * tp == n, f"dp({dp})*tp({tp}) != devices({n})"
    arr = np.asarray(devices).reshape(dp, tp)
    return Mesh(arr, axis_names=("dp", "tp"))


def shard_db(mesh: Mesh, db_leaves):
    """Place DB arrays sharded over tp along their leading (M) axis."""
    sharding = NamedSharding(mesh, P("tp"))
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), db_leaves)


def replicate(mesh: Mesh, leaves):
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), leaves)
