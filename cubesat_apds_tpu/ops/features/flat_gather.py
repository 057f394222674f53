"""Batch-aware flat gather for the per-keypoint samplers.

XLA:TPU lowers a gather over ONE linearized index dimension ~2.6x faster
than the same gather expressed with multiple start-index dimensions
(measured 13.8 -> 5.3 ms for the 1.13M-sample MLDB load, PERF.md round
3). Plain `flat[lin]` keeps that form ONLY unbatched: under `jax.vmap`
the operand and indices both grow a batch dimension and XLA falls back
to the slow multi-dim lowering (measured: 62.9 ms at B=4).

Two batched formulations were measured (benchmarks/exp_r3e/_r3f):

  * linearize the batch into one giant [B*N, C] table: 45.3 ms at B=4 —
    per-index cost DOUBLES because the random-access footprint grows
    from 34 MB to 134 MB (worse DRAM locality);
  * UNROLL into B per-frame gathers, each on its own single-frame
    table: 20.7 ms at B=4 = 5.2 ms/frame — linear scaling, same
    per-index cost as the unbatched call.

So the custom vmap rule below unrolls. B is a static trace-time
constant (tile batches / stream micro-batches, <= ~16), so the HLO
growth is bounded and each unrolled gather is large enough to amortize
its dispatch.

Used by the orientation/MLDB samplers (the reference's per-keypoint
sampling loops inside OpenCV AKAZE, feature_extraction/src/lib.rs:61-92)
so batched serving (vmapped tiles/frames: preprocess tile batches,
micro-batched streaming, the dp-mesh serve path) pays the same
per-sample cost as single-frame calls.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.custom_batching import custom_vmap


@custom_vmap
def flat_take(flat, lin):
    """flat [N, ...] x int32 indices lin [...] -> values [lin..., ...].

    Indices must be in-bounds (callers clip); equivalent to `flat[lin]`.
    """
    return flat[lin]


# Below this many indices per batch member, the per-gather dispatch of
# the unrolled form costs more than the slow batched lowering it avoids
# (measured: unrolling the 16 per-level 2048-index detect gathers took
# the detect stage from +2.8 to +8.2 ms/frame at B=4, while the 900k-
# index MLDB gather went from +9.4 to +4.1 — exp_r3d before/after).
_UNROLL_MIN_INDICES = 32768


@flat_take.def_vmap
def _flat_take_vmap(axis_size, in_batched, flat, lin):
    flat_b, lin_b = in_batched
    if flat_b:
        n_idx = (lin.size // axis_size) if lin_b else lin.size
        if n_idx < _UNROLL_MIN_INDICES:
            # Small gather: dominated by dispatch, not DRAM locality —
            # take the ordinary batched lowering in one op.
            if lin_b:
                return jax.vmap(lambda f, l: f[l])(flat, lin), True
            return jax.vmap(lambda f: f[lin])(flat), True
        # One gather per batch member, each on its own single-frame
        # table — keeps the random-access footprint (and so the
        # per-index cost) at the unbatched level; see module docstring.
        outs = [flat_take(flat[b], lin[b] if lin_b else lin)
                for b in range(axis_size)]
        return jnp.stack(outs), True
    # Operand shared across the batch: index dims are already arbitrary,
    # the batched indices just gather more points from the same table.
    return flat_take(flat, lin), True
