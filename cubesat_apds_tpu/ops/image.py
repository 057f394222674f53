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

def walk_lod(pixel_coverage: int, tile_resolution: int) -> int:
    """Levels to walk from `tile_resolution` down to `pixel_coverage`
    (both AREAS, x·y): ceil(log2(√tile/√coverage)), floored at 0
    (level_of_detail.rs:12-14; negative logs saturate like the u64 cast).
    """
    import math

    return max(int(math.ceil(math.log2(
        math.sqrt(tile_resolution) / math.sqrt(pixel_coverage)))), 0)


def calculate_amount_of_levels(reference_image_resolution: int,
                               tile_resolution: int = 500 * 500) -> int:
    """Number of LoD levels (level_of_detail.rs:7-9): walk_lod + 1.

    Both arguments are pixel AREAS (x·y). The default tile resolution is
    MINIMUM_RESOLUTION² (print_resolution halves both edges while each
    stays ≥ 500, level_of_detail.rs:40-52). Reference golden:
    calculate_amount_of_levels(1000·1000, 250·250) == 3
    (level_of_detail.rs:54-61).
    """
    return walk_lod(tile_resolution, reference_image_resolution) + 1


def lod_tile_grid(width: int, height: int, amount_lod: int):
    """Per-LoD rectangular tile grid like downscale_from_lod
    (preprocessor main.rs:197-246): per-AXIS tile size dim/2^(L−1)
    (main.rs:212-216 computes tile_size.x and tile_size.y separately),
    window step = tile·2^lod, grid counts per level.

    Ragged right/bottom remainders get one extra tile whose window is
    shifted back to end at the mosaic edge (static shapes; the
    reference's integer grid drops the remainder — fixed, not
    replicated). Returns per level:
    (tile_w, tile_h, step_x, step_y, off_x list, off_y list,
     bounds_x, bounds_y) — tile (c, r) OWNS mosaic coordinates
    [bounds_x[c], bounds_x[c+1]) × [bounds_y[r], bounds_y[r+1])
    (boundaries at the midpoints of the ACTUAL window overlaps), so
    consumers can drop duplicate detections from the edge-shifted
    overlap bands instead of storing near-twin keypoints (whose twin
    descriptors would make the Lowe d0 < ratio·d1 gate reject every
    match over the band).
    """

    def _bounds(offsets, step, total):
        b = [0.0]
        for i in range(len(offsets) - 1):
            b.append((offsets[i + 1] + offsets[i] + step) / 2.0)
        b.append(float(total))
        return b

    out = []
    tile_w = max(width // (2 ** (amount_lod - 1)), 1)
    tile_h = max(height // (2 ** (amount_lod - 1)), 1)
    for lod in range(amount_lod):
        step_x = tile_w * (2 ** lod)
        step_y = tile_h * (2 ** lod)
        cols = max(width // step_x, 1)
        rows = max(height // step_y, 1)
        if cols * step_x < width:
            cols += 1
        if rows * step_y < height:
            rows += 1
        off_x = [min(c * step_x, max(width - step_x, 0)) for c in range(cols)]
        off_y = [min(r * step_y, max(height - step_y, 0)) for r in range(rows)]
        out.append((tile_w, tile_h, step_x, step_y, off_x, off_y,
                    _bounds(off_x, step_x, width),
                    _bounds(off_y, step_y, height)))
    return out
