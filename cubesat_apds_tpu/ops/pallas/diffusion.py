"""Pallas TPU kernel: fused FED nonlinear-diffusion cycle.

The XLA path (ops.features.scale_space.fed_cycle) runs each explicit
diffusion step as its own fused elementwise op — every step reads and
writes the full image through HBM (2·n_steps transits per cycle). This
kernel keeps L (and the fixed conductance g) resident in VMEM for the
whole cycle: 2 HBM transits total regardless of step count.

Whole-image kernel (no spatial grid): diffusion is a 4-neighbour stencil
with a sequential dependency across steps, so tiling would force halo
exchanges per step. Images up to ~870k px f32 (measured footprint
~18 B/px vs the 16 MB v5e scoped-VMEM limit) run fused; larger inputs
(e.g. 1024² preprocessor tiles at octave 0) fall back to the XLA path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Measured kernel footprint: the v5e compiler reports ~18.5 MB of scoped
# VMEM for a 1024² f32 image (L + g + scratch + out + stencil temps ≈
# 4.6 buffers) against a 16 MB limit — so the budget is expressed in
# BYTES PER PIXEL of total footprint, not a 3-buffer estimate (which
# let 1024² through and OOMed in compile; caught by the round-2
# 128…8192 extraction sweep on hardware).
_VMEM_BYTES_PER_PIXEL = 18
_VMEM_BUDGET_BYTES = 15 * 1024 * 1024


def _fed_cycle_kernel(tau_ref, l_ref, g_ref, out_ref, scratch):
    """One FED cycle: L ← L + τₖ/2 · Σ_edges (g_p+g_q)(L_q−L_p)."""
    n_steps = tau_ref.shape[0]
    h, w = l_ref.shape

    g = g_ref[:]
    scratch[:] = l_ref[:]

    row_ids = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)

    def shift(x, dy, dx):
        # Single-axis edge-clamped neighbour: roll (wraps) + boundary
        # fix-up via an iota mask (Neumann: wrapped edge takes its own
        # clamped value, making the boundary difference vanish).
        if dy != 0:
            rolled = pltpu.roll(x, shift=(-dy) % h, axis=0)
            edge = h - 1 if dy == 1 else 0
            return jnp.where(row_ids == edge, x, rolled)
        rolled = pltpu.roll(x, shift=(-dx) % w, axis=1)
        edge = w - 1 if dx == 1 else 0
        return jnp.where(col_ids == edge, x, rolled)

    def step(k, _):
        L = scratch[:]
        tau = tau_ref[k]
        contrib = (
            (g + shift(g, 0, 1)) * (shift(L, 0, 1) - L)
            + (g + shift(g, 0, -1)) * (shift(L, 0, -1) - L)
            + (g + shift(g, 1, 0)) * (shift(L, 1, 0) - L)
            + (g + shift(g, -1, 0)) * (shift(L, -1, 0) - L)
        )
        scratch[:] = L + 0.5 * tau * contrib
        return 0

    jax.lax.fori_loop(0, n_steps, step, 0)
    out_ref[:] = scratch[:]


@functools.partial(jax.jit, static_argnames=("n_steps",))
def _fed_cycle_pallas(L, g, taus, n_steps: int):
    h, w = L.shape
    return pl.pallas_call(
        _fed_cycle_kernel,
        out_shape=jax.ShapeDtypeStruct((h, w), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((h, w), jnp.float32)],
    )(taus, L, g)


def fed_cycle_fused(L, g, taus: np.ndarray):
    """Drop-in for scale_space.fed_cycle with VMEM residency.

    Falls back to the XLA step loop when the image exceeds the VMEM
    budget or Pallas lowering is unavailable (e.g. CPU test platform).
    """
    from cubesat_apds_tpu.ops.features import scale_space as ss

    h, w = L.shape
    vmem_need = _VMEM_BYTES_PER_PIXEL * h * w
    on_tpu = jax.devices()[0].platform == "tpu"
    if not on_tpu or vmem_need > _VMEM_BUDGET_BYTES:
        return ss.fed_cycle(L, g, taus)
    taus_arr = jnp.asarray(np.asarray(taus, np.float32))
    return _fed_cycle_pallas(jnp.asarray(L, jnp.float32),
                             jnp.asarray(g, jnp.float32), taus_arr,
                             int(len(taus)))
