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
    bands = bands.at[:, 0, 0].set(jnp.array([0.5, 0.5, 0.5], jnp.float32))
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
    # Reference golden (level_of_detail.rs:54-61): areas, not edges.
    assert I.calculate_amount_of_levels(1000 * 1000, 250 * 250) == 3
    # Default tile resolution = MINIMUM_RESOLUTION² = 500².
    assert I.calculate_amount_of_levels(400 * 400) == 1
    assert I.calculate_amount_of_levels(500 * 500) == 1
    # print_resolution halves both edges while ≥500: 2000→1000→500 = 3.
    assert I.calculate_amount_of_levels(2000 * 2000) == 3
    assert I.calculate_amount_of_levels(8000 * 8000) == 5
    assert I.walk_lod(250 * 250, 1000 * 1000) == 2


def test_lod_tile_grid():
    grid = I.lod_tile_grid(4096, 4096, 3)
    # tile_size = 4096 / 2^2 = 1024 at every level; step doubles per level.
    assert grid[0][:4] == (1024, 1024, 1024, 1024)
    assert (len(grid[0][4]), len(grid[0][5])) == (4, 4)
    assert grid[1][:4] == (1024, 1024, 2048, 2048)
    assert (len(grid[1][4]), len(grid[1][5])) == (2, 2)
    assert grid[2][:4] == (1024, 1024, 4096, 4096)
    assert (len(grid[2][4]), len(grid[2][5])) == (1, 1)


def test_lod_tile_grid_rectangular_ragged():
    # Non-square mosaic (main.rs:212-216 computes per-axis tile sizes):
    # 3000×1000, 2 LoDs → tile 1500×500.
    grid = I.lod_tile_grid(3000, 1000, 2)
    tile_w, tile_h, step_x, step_y, off_x, off_y = grid[0][:6]
    assert (tile_w, tile_h, step_x, step_y) == (1500, 500, 1500, 500)
    assert off_x == [0, 1500] and off_y == [0, 500]
    # Ragged: 3100×1050 at LoD 0 needs edge-shifted extra tiles.
    grid = I.lod_tile_grid(3100, 1050, 2)
    tile_w, tile_h, step_x, step_y, off_x, off_y = grid[0][:6]
    assert (tile_w, tile_h) == (1550, 525)
    assert off_x == [0, 1550] and off_y == [0, 525]
    tile_w, tile_h, step_x, step_y, off_x, off_y = grid[1][:6]
    assert (step_x, step_y) == (3100, 1050)
    assert off_x == [0] and off_y == [0]
    # True remainder case: 1000×700 with 1 LoD tile of 300.
    grid = I.lod_tile_grid(1000, 700, 1)
    tile_w, tile_h, step_x, step_y, off_x, off_y = grid[0][:6]
    assert (tile_w, tile_h) == (1000, 700)
    # Coverage: every pixel column/row falls inside some tile window.
    grid = I.lod_tile_grid(1030, 520, 2)
    tile_w, tile_h, step_x, step_y, off_x, off_y = grid[0][:6]
    assert off_x[-1] + step_x >= 1030 and off_y[-1] + step_y >= 520


def test_lod_tile_grid_ownership_partition():
    # Ownership bounds partition the mosaic exactly: boundaries at the
    # midpoints of the ACTUAL overlaps, every coordinate owned once.
    grid = I.lod_tile_grid(1001, 700, 2)
    tile_w, tile_h, step_x, step_y, off_x, off_y, bx, by = grid[0]
    assert off_x == [0, 500, 501]          # edge-shifted third tile
    assert bx[0] == 0.0 and bx[-1] == 1001.0
    assert bx == sorted(bx)
    # The 499-px overlap between tiles at x=500 and x=501 splits at its
    # midpoint: (501 + 500 + 500)/2 = 750.5.
    assert bx[2] == (501 + 500 + 500) / 2.0
    # Every tile's owned interval lies inside its window.
    for c in range(len(off_x)):
        assert bx[c] >= off_x[c] - 1e-9
        assert bx[c + 1] <= off_x[c] + step_x + 1e-9 or c == len(off_x) - 1


# --- Lanczos resampling parity vs PIL (extract_band, mod.rs:332-343) --------

def test_lanczos_resample_arbitrary_ratio_matches_pil():
    from PIL import Image

    from cubesat_apds_tpu.ops.resample import lanczos_resample

    rng = np.random.default_rng(5)
    img = rng.random((223, 179)).astype(np.float32)
    for out in [(97, 83), (150, 60), (223, 179)]:
        ours = np.asarray(lanczos_resample(jnp.asarray(img), out))
        pil = np.asarray(Image.fromarray(img, mode="F").resize(
            (out[1], out[0]), Image.LANCZOS), np.float32)
        # Interior agreement (borders differ by clamp-vs-renormalize).
        d = np.abs(ours - pil)[2:-2, 2:-2]
        assert d.max() < 5e-3, f"{out}: max diff {d.max():.5f}"


def test_lanczos_resample_upsample_matches_pil():
    from PIL import Image

    from cubesat_apds_tpu.ops.resample import lanczos_resample

    rng = np.random.default_rng(6)
    img = rng.random((64, 80)).astype(np.float32)
    ours = np.asarray(lanczos_resample(jnp.asarray(img), (150, 97)))
    pil = np.asarray(Image.fromarray(img, mode="F").resize(
        (97, 150), Image.LANCZOS), np.float32)
    d = np.abs(ours - pil)[4:-4, 4:-4]
    assert d.max() < 5e-3, f"max diff {d.max():.5f}"


def test_to_rgb_arbitrary_out_size(tmp_path):
    """MosaicDataset.to_rgb accepts non-integer downsample ratios
    (reference extract_band resamples any window to any out_size)."""
    from cubesat_apds_tpu.io.mosaic import MosaicDataset
    from cubesat_apds_tpu.io.tiff import GeoRaster

    rng = np.random.default_rng(7)
    bands = rng.random((3, 120, 150)).astype(np.float32)
    raster = GeoRaster(bands=bands, geotransform=(0, 1, 0, 0, 0, -1),
                       epsg=4326, nodata=None, path="synthetic")
    ds = MosaicDataset([raster])
    rgba = ds.to_rgb((10, 10), (100, 100), (37, 41))
    assert rgba.shape == (41, 37, 4)
    assert rgba.dtype == np.uint8
    assert (rgba[..., 3] == 255).all()


def test_gaussian_blur_ms_matches_direct():
    """Multiscale (down-blur-up) Gaussian ≈ direct Gaussian. Kept as a
    utility for large-σ blurs on big rasters; the AKAZE fast path uses
    direct blurs (faster on TPU — see PERF.md round 2)."""
    from cubesat_apds_tpu.ops.resample import gaussian_blur, gaussian_blur_ms

    rng = np.random.default_rng(1)
    img = np.asarray(gaussian_blur(jnp.asarray(
        rng.random((256, 256)).astype(np.float32)), 2.0))
    for sigma in [2.9, 5.8, 11.5]:
        a = np.asarray(gaussian_blur(jnp.asarray(img), sigma))
        b = np.asarray(gaussian_blur_ms(jnp.asarray(img), sigma))
        d = np.abs(a - b)[20:-20, 20:-20]
        sig = a[20:-20, 20:-20].std()
        assert d.mean() < 0.08 * sig, f"σ={sigma}: mean err {d.mean():.5f}"
