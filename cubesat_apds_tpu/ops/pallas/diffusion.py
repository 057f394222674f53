"""Pallas TPU kernel: fused FED nonlinear-diffusion cycle.

The XLA path (ops.features.scale_space.fed_cycle) runs each explicit
diffusion step as its own fused elementwise op — every step reads and
writes the full image through HBM (2·n_steps transits per cycle). This
kernel keeps L (and the fixed conductance g) resident in VMEM for the
whole cycle: 2 HBM transits total regardless of step count.

Whole-image kernel (no spatial grid): diffusion is a 4-neighbour stencil
with a sequential dependency across steps, so tiling would force halo
exchanges per step. Images up to ~870k px f32 (measured footprint
~18 B/px vs the 16 MB v5e scoped-VMEM limit) run fused.

Larger images (1024²+ octave-0/1 levels) run the ROW-STRIP variant:
information travels one row per explicit step, so a strip extended by
`n_steps` halo rows on each side diffuses its interior EXACTLY — no
per-step halo exchange needed when the halo covers the whole cycle.
The strips (edge-padded at the true image boundary, where replicated
rows carry zero flux = Neumann) are built once in XLA, the kernel runs
over a grid of strips, and the interiors reassemble by reshape. HBM
cost: ~ (1 + 2·halo/strip_h) image transits vs the XLA fallback's
2·n_steps. Octave-0/1 cycles are short (3–9 steps), so halos stay thin.
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


def _strip_kernel(tau_ref, l_ref, g_ref, out_ref, scratch, *,
                  strip_h: int, halo: int, h_true: int):
    """FED cycle over one [1, sh2, W] strip; same stencil as the
    whole-image kernel, but the y-shift clamps at the TRUE image
    boundary (global row 0 / h_true−1), not just the strip edge.

    Replicate-padded ghost rows are NOT Neumann once they evolve: after
    one step a ghost row diverges from its source edge row (it misses
    the edge row's interior flux), and from step 2 on it would feed
    spurious flux back. Clamping the shift at the global boundary makes
    the edge rows' zero-flux condition hold every step; ghost rows
    beyond it evolve garbage that the clamp keeps out of [0, h_true)."""
    n_steps = tau_ref.shape[0]
    _, h, w = l_ref.shape
    i = pl.program_id(0)
    row0 = i * strip_h - halo  # global row of local row 0

    g = g_ref[0]
    scratch[:] = l_ref[0]

    row_ids = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0) + row0
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)

    def shift(x, dy, dx):
        if dy != 0:
            rolled = pltpu.roll(x, shift=(-dy) % h, axis=0)
            edge = h_true - 1 if dy == 1 else 0
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
    out_ref[0] = scratch[:]


def _strip_plan(h: int, w: int, n_steps: int, budget: int | None = None):
    """Choose (strip_h, halo, n_strips) so one [sh+2·halo, W] strip's
    footprint fits the VMEM budget. Returns None when impossible (image
    too wide) — caller falls back to XLA."""
    halo = -(-n_steps // 8) * 8  # exactness needs halo ≥ n_steps
    budget_rows = (budget or _VMEM_BUDGET_BYTES) // (_VMEM_BYTES_PER_PIXEL * w)
    strip_h = (budget_rows - 2 * halo) // 8 * 8
    if strip_h < 8:
        return None
    strip_h = min(strip_h, -(-h // 8) * 8)
    n_strips = -(-h // strip_h)
    return strip_h, halo, n_strips


@functools.partial(jax.jit, static_argnames=("n_steps", "strip_h", "halo"))
def _fed_cycle_strips(L, g, taus, n_steps: int, strip_h: int, halo: int):
    h, w = L.shape
    n_strips = -(-h // strip_h)
    hp = n_strips * strip_h
    # Pad content is irrelevant (the kernel clamps at the true global
    # boundary); edge mode keeps values bounded.
    Lp = jnp.pad(L, ((halo, hp - h + halo), (0, 0)), mode="edge")
    gp = jnp.pad(g, ((halo, hp - h + halo), (0, 0)), mode="edge")
    sh2 = strip_h + 2 * halo
    strips_L = jnp.stack(
        [jax.lax.slice_in_dim(Lp, i * strip_h, i * strip_h + sh2, axis=0)
         for i in range(n_strips)])
    strips_g = jnp.stack(
        [jax.lax.slice_in_dim(gp, i * strip_h, i * strip_h + sh2, axis=0)
         for i in range(n_strips)])
    out = pl.pallas_call(
        functools.partial(_strip_kernel, strip_h=strip_h, halo=halo,
                          h_true=h),
        grid=(n_strips,),
        out_shape=jax.ShapeDtypeStruct((n_strips, sh2, w), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, sh2, w), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, sh2, w), lambda i: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, sh2, w), lambda i: (i, 0, 0)),
        scratch_shapes=[pltpu.VMEM((sh2, w), jnp.float32)],
    )(taus, strips_L, strips_g)
    interior = out[:, halo:halo + strip_h, :].reshape(hp, w)
    return interior[:h]


def fed_cycle_fused(L, g, taus: np.ndarray, batched: bool = False):
    """Drop-in for scale_space.fed_cycle with VMEM residency.

    Dispatch: whole-image kernel when it fits VMEM; row-strip kernel
    (exact, halo = cycle length) otherwise; XLA step loop on non-TPU
    platforms or when even one strip row exceeds the budget.

    batched=True halves the VMEM budget for the strip plan: under vmap
    the pallas call gains a second grid dimension and Mosaic double-
    buffers blocks across it, so strips sized for the single-image
    budget fail Mosaic compilation (measured: 22.4 MB scoped demand vs
    the 16 MB limit at [4, 1024, 1024] tile batches).
    """
    from cubesat_apds_tpu.ops.features import scale_space as ss

    h, w = L.shape
    vmem_need = _VMEM_BYTES_PER_PIXEL * h * w
    on_tpu = jax.devices()[0].platform == "tpu"
    if not on_tpu:
        return ss.fed_cycle(L, g, taus)
    taus_arr = jnp.asarray(np.asarray(taus, np.float32))
    if vmem_need <= (_VMEM_BUDGET_BYTES // 2 if batched
                     else _VMEM_BUDGET_BYTES):
        return _fed_cycle_pallas(jnp.asarray(L, jnp.float32),
                                 jnp.asarray(g, jnp.float32), taus_arr,
                                 int(len(taus)))
    plan = _strip_plan(h, w, int(len(taus)),
                       budget=_VMEM_BUDGET_BYTES // 2 if batched
                       else _VMEM_BUDGET_BYTES)
    if plan is None:
        return ss.fed_cycle(L, g, taus)
    strip_h, halo, _ = plan
    return _fed_cycle_strips(jnp.asarray(L, jnp.float32),
                             jnp.asarray(g, jnp.float32), taus_arr,
                             int(len(taus)), strip_h, halo)
