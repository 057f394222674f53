"""Image op goldens — mirrors the reference's pure unit tests
(geotiff_extractor mod.rs:516-677: gamma, normalize, band_merger, options)."""

import jax.numpy as jnp
import numpy as np
import pytest

from cubesat_apds_tpu.ops import image as I


def test_gamma_correction_golden():
    # Reference golden: gamma_correction(0.5) == 0.7297401 (mod.rs:516-525).
    out = float(I.gamma_correction(jnp.float32(0.5)))
    assert out == pytest.approx(0.7297401, abs=1e-6)


def test_gamma_correction_bounds():
    assert float(I.gamma_correction(jnp.float32(0.0))) == 0.0
    assert float(I.gamma_correction(jnp.float32(1.0))) == pytest.approx(1.0)


def test_normalize_band():
    band = jnp.array([0.0, 5.0, 10.0])
    out = np.asarray(I.normalize_band(band, 0.0, 10.0))
    np.testing.assert_allclose(out, [0.0, 0.5, 1.0])


def test_f32_to_u8_monotone():
    band = jnp.linspace(0.0, 1.0, 11)
    out = np.asarray(I.f32_to_u8(band, 0.0, 1.0))
    assert out.dtype == np.uint8
    assert out[0] == 0 and out[-1] == 255
    assert (np.diff(out.astype(int)) >= 0).all()


def test_band_merge_rgba_all_nan_alpha_zero():
    # Reference band_merger: all-NaN pixel → alpha 0 (mod.rs:346-378).
    bands = jnp.full((3, 2, 2), jnp.nan, jnp.float32)
    bands = bands.at[:, 0, 0].set(jnp.array([0.5, 0.5, 0.5]))
    rgba = np.asarray(I.band_merge_rgba(bands, [0.0] * 3, [1.0] * 3))
    assert rgba.shape == (2, 2, 4)
    assert rgba[0, 0, 3] == 255
    assert rgba[0, 1, 3] == 0 and rgba[1, 1, 3] == 0
    # NaN bands contribute 0 in the value channels.
    assert (rgba[0, 1, :3] == 0).all()


def test_extract_tiles_shapes():
    img = jnp.arange(16 * 16, dtype=jnp.float32).reshape(16, 16)
    tiles, (rows, cols) = I.extract_tiles(img, 8)
    assert tiles.shape == (4, 8, 8) and rows == 2 and cols == 2
    np.testing.assert_array_equal(np.asarray(tiles[0]), np.asarray(img[:8, :8]))
    np.testing.assert_array_equal(np.asarray(tiles[3]), np.asarray(img[8:, 8:]))


def test_rgb_to_gray_range():
    rgb = jnp.full((4, 4, 3), 255, jnp.uint8)
    g = np.asarray(I.rgb_to_gray(rgb))
    np.testing.assert_allclose(g, 1.0, atol=1e-6)


# --- LoD math (reference: preprocessor/src/level_of_detail.rs:54-91) -------

def test_calculate_amount_of_levels():
    # resolution <= minimum → 1 level
    assert I.calculate_amount_of_levels(400) == 1
    assert I.calculate_amount_of_levels(500) == 1
    # 4x the minimum → one halving of the edge → 2 levels
    assert I.calculate_amount_of_levels(2000) == 2
    assert I.calculate_amount_of_levels(8000) == 3


def test_lod_tile_grid():
    grid = I.lod_tile_grid(4096, 4096, 3)
    # tile_size = 4096 / 2^2 = 1024 at every level; step doubles per level.
    assert grid[0] == (1024, 1024, 4, 4)
    assert grid[1] == (1024, 2048, 2, 2)
    assert grid[2] == (1024, 4096, 1, 1)
