"""AKAZE nonlinear (FED) scale space in JAX.

TPU-native rebuild of the scale-space half of OpenCV's AKAZE as invoked by
the reference (feature_extraction/src/lib.rs:61-92: 4 octaves, 4 sublevels,
PM-G2 diffusivity, threshold 0.001). Structure follows the published AKAZE
algorithm (Alcantarilla et al., BMVC 2013) and OpenCV's parameterization:

  * evolution level (o, j): σ = soffset·2^(j/nsublevels + o),  t = σ²/2
  * new octave ⇒ half-sample the diffused image, kcontrast ·= 0.75
  * per level: Lsmooth = G(σ=1)·Lt; flow g = PM-G2(∇Lsmooth, k);
    FED cycle with τ schedule from fed_tau_by_process_time(Δt, τmax=0.25)
  * contrast factor k = 70th-percentile of |∇(G(σ=1)·img)| over a
    300-bin histogram (compute_k_percentile semantics)

All steps are static-shape array ops: the Python loop over the 16 levels
unrolls at trace time, each FED cycle is a lax.scan over its (static) τ
schedule, and every stencil is an XLA-fusable shift/pad expression.
Sublevels within an octave share a resolution, so per-octave tensors are
stacked [S, h, w] and vmapped where possible.
"""

from __future__ import annotations

import dataclasses
import math
from typing import List

import jax
import jax.numpy as jnp
import numpy as np

from cubesat_apds_tpu.core.config import AkazeConfig
from cubesat_apds_tpu.ops.resample import gaussian_blur, half_sample, separable_conv2d


# --- FED τ schedules (static, computed at trace time) -----------------------

def fed_tau_by_process_time(T: float, tau_max: float = 0.25) -> np.ndarray:
    """τ schedule for one FED cycle covering diffusion time T.

    Follows the FED scheme (Grewenig/Weickert): n cyclic steps whose sum
    reaches T with each τ_k ≤ stability-bounded variation of tau_max.
    """
    n = int(math.ceil(math.sqrt(3.0 * T / tau_max + 0.25) - 0.5 - 1e-8))
    n = max(n, 1)
    scale = 3.0 * T / (tau_max * n * (n + 1))
    c = 1.0 / (4.0 * n + 2.0)
    d = scale * tau_max / 2.0
    k = np.arange(n)
    tau = d / np.cos(np.pi * (2.0 * k + 1.0) * c) ** 2
    return tau.astype(np.float32)


# --- Diffusion stencils -----------------------------------------------------

# Unnormalized Scharr kernels (OpenCV cv::Scharr defaults), used for the
# conductance gradient and the contrast-factor histogram.
_SCHARR_SMOOTH = np.array([3.0, 10.0, 3.0], np.float32)
_SCHARR_DERIV = np.array([-1.0, 0.0, 1.0], np.float32)


def scharr_x(img):
    """∂x with unnormalized Scharr (smooth in y, differentiate in x)."""
    return separable_conv2d(img, _SCHARR_SMOOTH, _SCHARR_DERIV, pad_mode="reflect")


def scharr_y(img):
    return separable_conv2d(img, _SCHARR_DERIV, _SCHARR_SMOOTH, pad_mode="reflect")


def pm_g2(lx, ly, k):
    """Perona–Malik G2 conductance: g = 1 / (1 + |∇L|²/k²)."""
    return 1.0 / (1.0 + (lx * lx + ly * ly) / (k * k))


def _shift(x, dy, dx):
    """Edge-clamped shift of [..., H, W] (Neumann boundary for diffusion)."""
    h, w = x.shape[-2:]
    pad = [(0, 0)] * (x.ndim - 2) + [(1, 1), (1, 1)]
    xp = jnp.pad(x, pad, mode="edge")
    return jax.lax.dynamic_slice_in_dim(
        jax.lax.dynamic_slice_in_dim(xp, 1 + dy, h, axis=-2), 1 + dx, w, axis=-1)


def nld_step(L, g, tau):
    """One explicit nonlinear-diffusion step L ← L + τ·div(g∇L).

    Discretization matches the classic KAZE scheme: per-edge conductance
    (g_p + g_q)/2 times the intensity difference, summed over the 4-neighbourhood.
    """
    contrib = (
        (g + _shift(g, 0, 1)) * (_shift(L, 0, 1) - L)
        + (g + _shift(g, 0, -1)) * (_shift(L, 0, -1) - L)
        + (g + _shift(g, 1, 0)) * (_shift(L, 1, 0) - L)
        + (g + _shift(g, -1, 0)) * (_shift(L, -1, 0) - L)
    )
    return L + 0.5 * tau * contrib


def fed_cycle(L, g, taus):
    """Run a full FED cycle (fixed conductance g, τ schedule `taus`)."""
    taus = jnp.asarray(taus)

    def body(L, tau):
        return nld_step(L, g, tau), None

    L, _ = jax.lax.scan(body, L, taus)
    return L


# --- Contrast factor ---------------------------------------------------------

def compute_k_percentile(img, percentile: float = 0.7, gscale: float = 1.0,
                         nbins: int = 300):
    """Contrast factor k: `percentile` of the gradient-magnitude histogram.

    compute_k_percentile semantics: blur with σ=gscale, unnormalized Scharr
    gradients, histogram of non-zero |∇| over [0, max] with `nbins` bins,
    k = hmax·(first bin index where the cumulative count exceeds
    percentile·npoints)/nbins. Borders excluded.
    """
    smooth = gaussian_blur(img, gscale)
    lx = scharr_x(smooth)[..., 1:-1, 1:-1]
    ly = scharr_y(smooth)[..., 1:-1, 1:-1]
    modg2 = lx * lx + ly * ly
    hmax2 = jnp.max(modg2)
    hmax = jnp.sqrt(hmax2)
    nz = modg2 > 0.0
    npoints = jnp.sum(nz)
    nthreshold = (npoints.astype(jnp.float32) * percentile).astype(jnp.int32)
    # Histogram bin of |∇| on [0, hmax]: cum(k) = #{|∇| in bins < k} —
    # recovered by BISECTION on k instead of a 260K-element scatter-add
    # (TPU scatters are serial; nine masked reduces are ~100× cheaper).
    # cum(k) = #{floor(nbins·|∇|/hmax) < k} = #{|∇|² < (k·hmax/nbins)²}.
    def count_below(k):
        t = (k.astype(jnp.float32) * hmax / nbins) ** 2
        return jnp.sum(nz & (modg2 < t))

    def bisect(state, _):
        lo, hi = state  # invariant: cum(lo) < thr, cum(hi) >= thr
        mid = (lo + hi) // 2
        below = count_below(mid) < nthreshold
        return (jnp.where(below, mid, lo), jnp.where(below, hi, mid)), None

    # 9 rounds cover nbins=300 (2^9 = 512).
    (lo, hi), _ = jax.lax.scan(
        bisect, (jnp.int32(0), jnp.int32(nbins)), None, length=9)
    k_bin = hi
    kperc = hmax * k_bin.astype(jnp.float32) / nbins
    return jnp.where(npoints.astype(jnp.float32) * percentile < 1.0,
                     jnp.float32(0.03), kperc)


# --- Evolution ---------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class LevelMeta:
    """Static per-level metadata (known at trace time)."""

    octave: int
    sublevel: int
    esigma: float        # scale in original-image pixels
    etime: float         # diffusion time = esigma²/2
    ratio: int           # 2^octave
    sigma_size: int      # round(esigma·derivative_factor / ratio)
    border: int          # detection border in level pixels


def evolution_metadata(config: AkazeConfig) -> List[LevelMeta]:
    levels = []
    for o in range(config.octaves):
        for j in range(config.sublevels):
            esigma = config.soffset * (2.0 ** (j / config.sublevels + o))
            ratio = 1 << o
            sigma_size = int(round(esigma * config.derivative_factor / ratio))
            border = sigma_size * 2 + 1
            levels.append(LevelMeta(
                octave=o, sublevel=j, esigma=esigma,
                etime=0.5 * esigma * esigma, ratio=ratio,
                sigma_size=max(sigma_size, 1), border=border))
    return levels


@dataclasses.dataclass
class ScaleSpace:
    """The computed nonlinear scale space.

    Per level (index = o·S + j): Lt (diffused), Lsmooth (σ=1 blur of Lt) at
    the level's own resolution [H/2^o, W/2^o].
    """

    Lt: List[jax.Array]
    Lsmooth: List[jax.Array]
    meta: List[LevelMeta]
    kcontrast: jax.Array


def build_scale_space(img, config: AkazeConfig = AkazeConfig(),
                      kcontrast=None, batched: bool = False) -> ScaleSpace:
    """img: [H, W] float32 in [0, 1] → 16-level nonlinear scale space.

    The level loop unrolls at trace time; FED τ schedules are static numpy.
    `kcontrast` overrides the per-image contrast factor (a traced scalar
    — the tiled large-image path computes ONE global factor so every
    tile diffuses consistently, detect_and_compute_tiled).
    """
    meta = evolution_metadata(config)
    if kcontrast is None:
        kcontrast0 = compute_k_percentile(
            img, config.kcontrast_percentile, 1.0, config.kcontrast_nbins)
    else:
        kcontrast0 = jnp.asarray(kcontrast, jnp.float32)

    Lt_list: List[jax.Array] = []
    Ls_list: List[jax.Array] = []

    # Level 0: base smoothing at soffset.
    Lt = gaussian_blur(img, config.soffset)
    Lt_list.append(Lt)
    Ls_list.append(gaussian_blur(Lt, 1.0))
    kcontrast = kcontrast0

    for i in range(1, len(meta)):
        if meta[i].octave > meta[i - 1].octave:
            Lt = half_sample(Lt)
            kcontrast = kcontrast * 0.75
        # Lsmooth is the σ=1 blur of the level's PRE-diffusion image; it
        # feeds both the conductance here and the detection derivatives
        # later (matches the AKAZE evolution-loop ordering).
        Lsmooth = gaussian_blur(Lt, 1.0)
        lx = scharr_x(Lsmooth)
        ly = scharr_y(Lsmooth)
        g = pm_g2(lx, ly, kcontrast)
        taus = fed_tau_by_process_time(
            meta[i].etime - meta[i - 1].etime, config.fed_tau_max)
        from cubesat_apds_tpu.ops.pallas.diffusion import fed_cycle_fused

        Lt = fed_cycle_fused(Lt, g, taus, batched=batched)
        Lt_list.append(Lt)
        Ls_list.append(Lsmooth)

    return ScaleSpace(Lt=Lt_list, Lsmooth=Ls_list, meta=meta,
                      kcontrast=kcontrast0)
