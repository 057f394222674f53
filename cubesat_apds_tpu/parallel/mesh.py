"""Device-mesh helpers for multi-chip execution.

The reference is single-process (SURVEY.md §2.3): rayon threads + two
mutexes, Postgres as the only cross-process channel. The TPU-native
scaling model is a jax.sharding.Mesh with two axes:

  * "dp" — data parallelism over frames/tiles (the rayon analogue);
  * "tp" — tensor parallelism over the descriptor-DB axis of the Hamming
    matmul, with an all-gather top-k merge riding ICI.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize_distributed(coordinator: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None) -> bool:
    """Multi-host entry point: wire this process into a cross-host mesh.

    SURVEY §2.3 maps the comm backend to "jax.distributed + ICI
    collectives …; DCN for multi-host" — this is the DCN leg. Arguments
    fall back to the APDS_COORDINATOR / APDS_NUM_PROCESSES /
    APDS_PROCESS_ID environment variables (and jax.distributed's own
    auto-detection on managed clusters when all three are absent).
    After it returns True, jax.devices() spans every process and
    make_mesh() builds a global mesh; all parallel/ paths (GSPMD serve,
    shard_map DB merge, dp preprocess) work unchanged — XLA routes the
    collectives over ICI within a host and DCN across hosts.

    On CPU backends the gloo cross-process collective implementation is
    selected (the multi-process CPU-mesh test rig; TPU backends ignore
    it). Returns False when no coordinator is configured (single-process
    run). Safe to call twice (the second call is a no-op).
    """
    coordinator = coordinator or os.environ.get("APDS_COORDINATOR")
    if num_processes is None and os.environ.get("APDS_NUM_PROCESSES"):
        num_processes = int(os.environ["APDS_NUM_PROCESSES"])
    if process_id is None and os.environ.get("APDS_PROCESS_ID"):
        process_id = int(os.environ["APDS_PROCESS_ID"])
    if coordinator is None and num_processes is None and process_id is None:
        return False
    if coordinator is None or num_processes is None or process_id is None:
        missing = [name for name, v in
                   (("APDS_COORDINATOR", coordinator),
                    ("APDS_NUM_PROCESSES", num_processes),
                    ("APDS_PROCESS_ID", process_id)) if v is None]
        raise ValueError(
            "partial distributed configuration: set all of "
            "APDS_COORDINATOR, APDS_NUM_PROCESSES and APDS_PROCESS_ID "
            f"(or none of them for a single-process run); missing: "
            f"{', '.join(missing)}")
    # NOTE: nothing before this point may touch the XLA backend —
    # jax.distributed.initialize must run first (even jax.process_count
    # would initialize it).
    if jax.distributed.is_initialized():
        return True  # already initialized
    try:
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
    except Exception:
        pass  # older jaxlib without pluggable CPU collectives
    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=num_processes,
                               process_id=process_id)
    return True


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
