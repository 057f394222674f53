"""Batched image ops: normalization, gamma, band merge, grayscale, tiling.

TPU-native replacements for the reference's per-pixel Rust loops and GDAL
band handling:
  * ``gamma_correction`` (γ = 1/2.2) — geotiff_extractor mod.rs:402-408
  * ``f32_to_u8`` min-max normalize → gamma → u8 — mod.rs:410-422
  * ``band_merger`` per-pixel merge with all-NaN → alpha 0 — mod.rs:346-378
    (the reference's hot CPU loop; here a fused elementwise XLA op)
  * tile/window extraction for the LoD grid — preprocessor main.rs:212-272

All functions are shape-polymorphic over leading batch dims and jit-safe.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from cubesat_apds_tpu.core.config import GAMMA_VALUE


def gamma_correction(x, gamma: float = GAMMA_VALUE):
    """x**γ on [0,1] values (reference: geotiff mod.rs:402-408, γ=1/2.2)."""
    return jnp.power(jnp.clip(x, 0.0, 1.0), gamma)


def normalize_band(band, band_min, band_max):
    """Min-max normalize a band to [0,1] (reference: f32_to_u8 mod.rs:410-422)."""
    scale = jnp.where(band_max > band_min, 1.0 / (band_max - band_min), 0.0)
    return jnp.clip((band - band_min) * scale, 0.0, 1.0)


def f32_to_u8(band, band_min, band_max, gamma: float = GAMMA_VALUE):
    """Normalize → gamma → u8, matching the reference's scalar pipeline
    (geotiff mod.rs:410-422)."""
    g = gamma_correction(normalize_band(band, band_min, band_max), gamma)
    return jnp.round(g * 255.0).astype(jnp.uint8)


def band_merge_rgba(bands, band_mins, band_maxs, gamma: float = GAMMA_VALUE):
    """Merge float bands → RGBA8 with NaN handling.

    bands: [..., 3, H, W] float32 (may contain NaN nodata).
    Per reference band_merger (geotiff mod.rs:346-378): a pixel whose bands
    are all NaN gets alpha 0; individual NaN bands contribute 0.
    """
    nan_mask = jnp.isnan(bands)
    all_nan = jnp.all(nan_mask, axis=-3)
    safe = jnp.where(nan_mask, 0.0, bands)
    mins = jnp.asarray(band_mins, jnp.float32).reshape((-1,) + (1, 1))
    maxs = jnp.asarray(band_maxs, jnp.float32).reshape((-1,) + (1, 1))
    u8 = f32_to_u8(safe, mins, maxs, gamma)
    u8 = jnp.where(nan_mask, jnp.uint8(0), u8)
    alpha = jnp.where(all_nan, jnp.uint8(0), jnp.uint8(255))
    rgba = jnp.concatenate([jnp.moveaxis(u8, -3, -1), alpha[..., None]], axis=-1)
    return rgba


# ITU-R BT.601 luma weights — matches OpenCV's default RGB→GRAY used
# implicitly when AKAZE consumes a color Mat.
_LUMA = jnp.array([0.299, 0.587, 0.114], jnp.float32)


def rgb_to_gray(rgb):
    """[..., H, W, 3] uint8/float → [..., H, W] float32 in [0,1]."""
    x = jnp.asarray(rgb, jnp.float32)
    if rgb.dtype == jnp.uint8:
        x = x / 255.0
    return jnp.einsum("...c,c->...", x, _LUMA)


def bgr_to_gray(bgr):
    x = jnp.asarray(bgr, jnp.float32)
    if bgr.dtype == jnp.uint8:
        x = x / 255.0
    return jnp.einsum("...c,c->...", x, _LUMA[::-1])


def extract_tiles(img, tile: int, stride: int | None = None):
    """[H, W] → [rows*cols, tile, tile] static tiling (drops ragged edge).

    The device-side analogue of the preprocessor's LoD tile grid
    (preprocessor main.rs:212-245): one batched array instead of rayon tasks.
    """
    stride = stride or tile
    h, w = img.shape[-2:]
    rows = (h - tile) // stride + 1
    cols = (w - tile) // stride + 1
    idx_r = jnp.arange(rows) * stride
    idx_c = jnp.arange(cols) * stride

    def take(r, c):
        return jax.lax.dynamic_slice(img, (r, c), (tile, tile))

    tiles = jax.vmap(lambda r: jax.vmap(lambda c: take(r, c))(idx_c))(idx_r)
    return tiles.reshape((rows * cols, tile, tile)), (rows, cols)


# --- LoD math (reference: preprocessor/src/level_of_detail.rs) -------------

def calculate_amount_of_levels(resolution: int, minimum: int = 500) -> int:
    """Number of LoD levels: halve the (sqrt of) resolution until < minimum.

    Reference semantics (level_of_detail.rs:7-14): walk_lod computes
    log2(sqrt(resolution)/sqrt(minimum)) + 1, i.e. levels while the tile
    edge stays ≥ sqrt(minimum·area ratio).
    """
    import math

    if resolution <= minimum:
        return 1
    return int(math.floor(math.log2(math.sqrt(resolution / minimum)))) + 1


def lod_tile_grid(width: int, height: int, amount_lod: int):
    """Per-LoD (tile_size, columns, rows) like downscale_from_lod
    (preprocessor main.rs:197-246): tile_size = min_dim / 2^(L−1), grid
    counts per level with 2^lod downsampling."""
    out = []
    resolution = min(width, height)
    tile_size = resolution // (2 ** (amount_lod - 1))
    for lod in range(amount_lod):
        step = tile_size * (2 ** lod)
        cols = max(width // step, 1)
        rows = max(height // step, 1)
        out.append((tile_size, step, cols, rows))
    return out
