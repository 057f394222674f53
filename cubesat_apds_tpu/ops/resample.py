"""Separable Lanczos / Gaussian resampling as batched XLA convolutions.

Replaces GDAL's ``read_as`` + ``ResampleAlg::Lanczos`` windowed reads
(reference: geotiff_extractor mod.rs:332-343) with on-device separable
convolution + strided sampling: the kernel taps are static, so XLA maps the
whole resample onto MXU/VPU-friendly convs.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np


def _lanczos_kernel_np(scale: float, a: int = 3):
    """Tap weights for Lanczos-a downsampling by integer/rational factor.

    For downscale, the kernel is stretched by the scale factor (standard
    anti-aliasing): support = a * scale on each side.
    """
    stretch = max(scale, 1.0)
    support = a * stretch
    radius = int(math.ceil(support))
    xs = np.arange(-radius, radius + 1, dtype=np.float64)
    t = xs / stretch
    with np.errstate(invalid="ignore", divide="ignore"):
        w = np.sinc(t) * np.sinc(t / a)
    w[np.abs(t) >= a] = 0.0
    w /= w.sum()
    return w.astype(np.float32)


@functools.partial(jax.jit, static_argnames=("factor", "a"))
def lanczos_downsample(img, factor: int, a: int = 3):
    """Downsample [..., H, W] by an integer factor with Lanczos-a filtering."""
    if factor == 1:
        return img
    w = jnp.asarray(_lanczos_kernel_np(float(factor), a))
    k = w.shape[0]
    pad = k // 2
    x = jnp.asarray(img, jnp.float32)
    batch_shape = x.shape[:-2]
    h, wd = x.shape[-2:]
    x = x.reshape((-1, 1, h, wd))
    # Separable: rows then cols, stride = factor.
    kern_row = w.reshape(1, 1, k, 1)
    kern_col = w.reshape(1, 1, 1, k)
    dn = jax.lax.conv_dimension_numbers(x.shape, kern_row.shape, ("NCHW", "OIHW", "NCHW"))
    x = jax.lax.conv_general_dilated(
        x, kern_row, window_strides=(factor, 1), padding=((pad, pad), (0, 0)),
        dimension_numbers=dn)
    x = jax.lax.conv_general_dilated(
        x, kern_col, window_strides=(1, factor), padding=((0, 0), (pad, pad)),
        dimension_numbers=dn)
    return x.reshape(batch_shape + x.shape[-2:])


def _lanczos_matrix_np(in_n: int, out_n: int, a: int = 3,
                       scale: float | None = None,
                       offset: float = -0.5):
    """Dense 1-D Lanczos resampling matrix [out_n, in_n] for ARBITRARY
    (non-integer) ratios. For downscale the kernel is stretched by the
    scale factor (standard anti-aliasing, support a·scale per side);
    border rows renormalize over the in-range taps (PIL convention).

    `scale`/`offset` override the in_n/out_n ratio and the -0.5
    half-pixel convention: the two-stage big-window path resamples an
    integer-decimated intermediate whose array may be PADDED past the
    window extent (scale != shape ratio) and whose pixel k sits at
    full-res k*f, not k*f + (f-1)/2 (offset = -0.5/f).
    """
    if scale is None:
        scale = in_n / out_n
    stretch = max(scale, 1.0)
    centers = (np.arange(out_n, dtype=np.float64) + 0.5) * scale + offset
    t = (np.arange(in_n, dtype=np.float64)[None, :] - centers[:, None]) / stretch
    with np.errstate(invalid="ignore", divide="ignore"):
        w = np.sinc(t) * np.sinc(t / a)
    w[np.abs(t) >= a] = 0.0
    w /= w.sum(axis=1, keepdims=True)
    return w.astype(np.float32)


@functools.partial(jax.jit, static_argnames=("out_size", "a"))
def lanczos_resample(img, out_size, a: int = 3):
    """Resample [..., H, W] to [..., oh, ow] with Lanczos-a at ANY ratio
    (integer or not), each axis independent.

    Replaces GDAL's read_as + ResampleAlg::Lanczos to an arbitrary
    out_size (reference: geotiff_extractor mod.rs:332-343). TPU-native
    shape: the tap weights depend only on the static (in, out) sizes, so
    each axis is one dense [out, in] matmul — the whole resample runs on
    the MXU instead of a gather/conv lowering.
    """
    oh, ow = out_size
    x = jnp.asarray(img, jnp.float32)
    h, w = x.shape[-2:]
    if (h, w) == (oh, ow):
        return x
    y = x
    if h != oh:
        Wr = jnp.asarray(_lanczos_matrix_np(h, oh, a))
        y = jnp.einsum("ij,...jk->...ik", Wr, y)
    if w != ow:
        Wc = jnp.asarray(_lanczos_matrix_np(w, ow, a))
        y = jnp.einsum("...ij,kj->...ik", y, Wc)
    return y


@functools.partial(jax.jit,
                   static_argnames=("out_size", "scale_yx", "offset_yx", "a"))
def lanczos_resample_scaled(img, out_size, scale_yx,
                            offset_yx=(-0.5, -0.5), a: int = 3):
    """lanczos_resample with EXPLICIT per-axis geometric scales (input
    px per output px) and center offsets, independent of the array-shape
    ratio — used by the two-stage big-window path where the input array
    is an integer-decimated (and possibly padded) intermediate."""
    oh, ow = out_size
    sy, sx = scale_yx
    offy, offx = offset_yx
    x = jnp.asarray(img, jnp.float32)
    h, w = x.shape[-2:]
    y = jnp.einsum(
        "ij,...jk->...ik",
        jnp.asarray(_lanczos_matrix_np(h, oh, a, scale=sy, offset=offy)), x)
    return jnp.einsum(
        "...ij,kj->...ik", y,
        jnp.asarray(_lanczos_matrix_np(w, ow, a, scale=sx, offset=offx)))


def _gaussian_kernel_np(sigma: float, radius: int | None = None):
    if radius is None:
        radius = max(int(math.ceil(3.0 * sigma)), 1)
    xs = np.arange(-radius, radius + 1, dtype=np.float64)
    w = np.exp(-0.5 * (xs / sigma) ** 2)
    w /= w.sum()
    return w.astype(np.float32)


def _shift_filter(x, kernel: np.ndarray, axis: int, pad_mode: str):
    """Apply a 1-D filter along `axis` as a shift-and-add sum.

    XLA TPU lowers 1-wide convolutions to pathologically slow kernels
    (T(1,128) layouts); for the small/sparse taps used throughout the
    scale space (Gaussian ≤9 taps, Scharr-family 3 nonzero taps at
    {−s, 0, +s}) an explicit Σ wₖ·shiftₖ(x) compiles to one fused VPU
    elementwise op instead — ~50× faster in practice.
    """
    kernel = np.asarray(kernel, np.float32)
    r = len(kernel) // 2
    n = x.shape[axis]
    pad_widths = [(0, 0)] * x.ndim
    pad_widths[axis] = (r, r)
    xp = jnp.pad(x, pad_widths, mode=pad_mode)
    out = None
    for k, w in enumerate(kernel):
        if w == 0.0:
            continue
        sl = [slice(None)] * x.ndim
        sl[axis] = slice(k, k + n)
        term = xp[tuple(sl)] * jnp.float32(w)
        out = term if out is None else out + term
    return out if out is not None else jnp.zeros_like(x)


def gaussian_blur(img, sigma: float, radius: int | None = None):
    """Separable Gaussian blur on [..., H, W] with replicate-edge padding.

    Edge handling matches OpenCV BORDER_REPLICATE used throughout KAZE's
    scale space construction.
    """
    if sigma <= 0:
        return jnp.asarray(img, jnp.float32)
    w = _gaussian_kernel_np(sigma, radius)
    x = jnp.asarray(img, jnp.float32)
    x = _shift_filter(x, w, x.ndim - 2, "edge")
    x = _shift_filter(x, w, x.ndim - 1, "edge")
    return x


def _up2_axis(x, axis: int, out_n: int):
    """Bilinear 2× upsample along `axis`, inverse-aligned with
    half_sample's 2×2-mean grid (coarse center i ↔ fine 2i+0.5):
    fine[2i] = 0.25·C[i−1] + 0.75·C[i], fine[2i+1] = 0.75·C[i] + 0.25·C[i+1]
    (edge-clamped). Crops/edge-pads to out_n."""
    n = x.shape[axis]

    def sh(delta):
        pads = [(0, 0)] * x.ndim
        pads[axis] = (max(-delta, 0), max(delta, 0))
        xp = jnp.pad(x, pads, mode="edge")
        sl = [slice(None)] * x.ndim
        sl[axis] = slice(max(delta, 0), max(delta, 0) + n)
        return xp[tuple(sl)]

    even = 0.25 * sh(-1) + 0.75 * x
    odd = 0.75 * x + 0.25 * sh(1)
    out = jnp.stack([even, odd], axis=axis + 1)
    new_shape = list(x.shape)
    new_shape[axis] = 2 * n
    out = out.reshape(new_shape)
    if out.shape[axis] > out_n:
        sl = [slice(None)] * out.ndim
        sl[axis] = slice(0, out_n)
        out = out[tuple(sl)]
    elif out.shape[axis] < out_n:
        pads = [(0, 0)] * out.ndim
        pads[axis] = (0, out_n - out.shape[axis])
        out = jnp.pad(out, pads, mode="edge")
    return out


def gaussian_blur_ms(img, sigma: float, coarse_sigma_max: float = 2.5):
    """Multiscale approximate Gaussian blur: large-σ blurs run at reduced
    resolution (half-sample → blur → bilinear upsample), cutting the
    shift-add cost from O(σ·H·W) to O(H·W).

    Variance bookkeeping (per 2× round trip at current factor f, in
    original-image px²): the 2×2 mean contributes 0.25·f² per axis and the
    bilinear upsample 0.75·f², so each descent consumes 1.0·f² of the σ²
    budget. The composite kernel is box⊗gaussian⊗tent — within ~1% of a
    true Gaussian by the time two convolutions have mixed (CLT), which is
    ample for the fast-descriptor blur-matched pyramids (an anti-aliased
    cell-mean approximation to begin with; end-task parity is measured by
    the fast-vs-exact study, see PERF.md)."""
    x = jnp.asarray(img, jnp.float32)
    var = float(sigma) * float(sigma)
    f = 1
    sizes = []  # shapes to restore on the way back up
    while (math.sqrt(var) / f > coarse_sigma_max
           and var - f * f >= (1.6 * f * 2) ** 2 * 0.25):
        sizes.append(x.shape[-2:])
        var -= 1.0 * f * f
        if x.shape[-2] % 2 or x.shape[-1] % 2:
            pads = [(0, 0)] * (x.ndim - 2) + [(0, x.shape[-2] % 2),
                                              (0, x.shape[-1] % 2)]
            x = jnp.pad(x, pads, mode="edge")
        x = half_sample(x)
        f *= 2
    x = gaussian_blur(x, math.sqrt(var) / f)
    for (h, w) in reversed(sizes):
        x = _up2_axis(x, x.ndim - 2, h)
        x = _up2_axis(x, x.ndim - 1, w)
    return x


def half_sample(img):
    """Downsample by 2 with 2×2 averaging (KAZE's halfsample_image uses
    area interpolation, which for factor 2 is exactly the 2×2 mean)."""
    x = jnp.asarray(img, jnp.float32)
    h, w = x.shape[-2:]
    h2, w2 = h // 2, w // 2
    x = x[..., : h2 * 2, : w2 * 2]
    x = x.reshape(x.shape[:-2] + (h2, 2, w2, 2))
    return x.mean(axis=(-3, -1))


def separable_conv2d(img, row_kernel, col_kernel, pad_mode: str = "edge"):
    """General separable filter on [..., H, W] (used by Scharr derivs).

    Correlation convention (matches cv::filter2D / Scharr): no kernel
    flip. Implemented as shift-and-add (see _shift_filter) — the kernels
    here are small or sparse, and XLA fuses the whole stencil.
    """
    x = jnp.asarray(img, jnp.float32)
    kr = np.asarray(row_kernel, np.float32)
    kc = np.asarray(col_kernel, np.float32)
    x = _shift_filter(x, kr, x.ndim - 2, pad_mode)
    x = _shift_filter(x, kc, x.ndim - 1, pad_mode)
    return x
