"""Mosaic dataset: the VRT/COG layer rebuilt as an explicit tile index.

Replaces geotiff_extractor's GDAL pipeline (reference: mod.rs:130-422):
`import_datasets` → folder scan; `to_mosaic_dataset` → VRT + COG copy;
`to_rgb` → windowed 3-band read with Lanczos downsample, min-max
normalize, gamma, nodata→alpha. Here the "VRT" is a host-side placement
index over member rasters; the "COG" materialization is a persisted
binary mosaic (memory-mapped npy + manifest) that gives the reference's
resume-from-mosaic restart semantics (preprocessor main.rs:54-66,102-105).

Device work (Lanczos resample, normalize+gamma+merge) stays in
ops/resample + ops/image; this module only assembles host windows.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import List, Optional, Sequence, Tuple

import numpy as np

from cubesat_apds_tpu.io.tiff import GeoRaster, list_rasters, read_geotiff


@dataclasses.dataclass
class BandsMinMax:
    """Cached per-band min/max (datasets_min_max, geotiff mod.rs:200-229)."""

    mins: np.ndarray
    maxs: np.ndarray


class MosaicDataset:
    """A mosaic of GeoTIFF members on a shared north-up world grid."""

    def __init__(self, members: List[GeoRaster]):
        if not members:
            raise ValueError("mosaic needs at least one raster")
        self.members = members
        ref_gt = members[0].geotransform
        self.px_w = float(ref_gt[1])
        self.px_h = float(ref_gt[5])          # negative for north-up
        xmin = min(m.bounds()[0] for m in members)
        ymax = max(m.bounds()[3] for m in members)
        xmax = max(m.bounds()[2] for m in members)
        ymin = min(m.bounds()[1] for m in members)
        self.geotransform = np.array(
            [xmin, self.px_w, 0.0, ymax, 0.0, self.px_h], np.float64)
        self.width = int(round((xmax - xmin) / self.px_w))
        self.height = int(round((ymin - ymax) / self.px_h))
        self.n_bands = max(m.n_bands for m in members)
        # Member placement in mosaic pixels.
        self._placement: List[Tuple[int, int]] = []
        for m in members:
            mx, my = m.pixel_to_world(0, 0)
            px = int(round((mx - xmin) / self.px_w))
            py = int(round((my - ymax) / self.px_h))
            self._placement.append((px, py))
        self._minmax: Optional[BandsMinMax] = None
        self.elevation: Optional[GeoRaster] = None

    # ---- construction (Datasets trait, mod.rs:85-89) -------------------

    @classmethod
    def from_folder(cls, folder: str, lazy: bool = True) -> "MosaicDataset":
        """import_datasets (mod.rs:130-138): open every TIFF in a folder.

        lazy=True (default) opens members header-only with windowed
        on-demand decode (LazyGeoRaster) where the native decoder
        supports the file — mosaics larger than RAM never fully
        materialize, matching the reference's GDAL-streamed COG access.
        Unsupported layouts silently fall back to an eager PIL read.
        """
        paths = list_rasters(folder)
        if not paths:
            raise FileNotFoundError(f"no rasters in {folder}")
        if lazy:
            from cubesat_apds_tpu.io.tiff import read_geotiff_lazy

            return cls([read_geotiff_lazy(p) for p in paths])
        return cls([read_geotiff(p) for p in paths])

    def get_dimensions(self) -> Tuple[int, int]:
        """(width, height) like get_dimensions (mod.rs:231-235)."""
        return self.width, self.height

    # ---- reads ---------------------------------------------------------

    def read_window(self, x: int, y: int, w: int, h: int,
                    bands: Sequence[int] = (1, 2, 3)) -> np.ndarray:
        """Raw window read → [len(bands), h, w] float32, NaN where empty.

        `bands` are 1-based (GDAL convention, DatasetOptions mod.rs:66-73).
        """
        out = np.full((len(bands), h, w), np.nan, np.float32)
        for m, (px, py) in zip(self.members, self._placement):
            # Intersection of [x, x+w) with the member's extent.
            x0 = max(x, px)
            y0 = max(y, py)
            x1 = min(x + w, px + m.width)
            y1 = min(y + h, py + m.height)
            if x0 >= x1 or y0 >= y1:
                continue
            # One windowed decode serves every requested band (lazy
            # members otherwise inflate the same strips per band).
            in_range = [b for b in bands if b - 1 < m.n_bands]
            if not in_range:
                continue
            src_all = m.read_bands_window(
                [b - 1 for b in in_range], y0 - py, y1 - py,
                x0 - px, x1 - px)
            for bi, b in enumerate(bands):
                if b - 1 >= m.n_bands:
                    continue
                src = src_all[in_range.index(b)]
                dst = out[bi, y0 - y:y1 - y, x0 - x:x1 - x]
                # Later members only fill holes (VRT first-wins layering).
                hole = np.isnan(dst)
                dst[hole] = src[hole]
        return out

    def datasets_min_max(self) -> BandsMinMax:
        """Per-band global min/max, cached (mod.rs:200-229)."""
        if self._minmax is None:
            mins = np.full(self.n_bands, np.inf, np.float32)
            maxs = np.full(self.n_bands, -np.inf, np.float32)
            for m in self.members:
                for b in range(min(self.n_bands, m.n_bands)):
                    mm = m.band_min_max(b)
                    if mm is None:
                        continue
                    mins[b] = min(mins[b], mm[0])
                    maxs[b] = max(maxs[b], mm[1])
            self._minmax = BandsMinMax(mins=mins, maxs=maxs)
        return self._minmax

    def to_rgb(self, window_xy: Tuple[int, int], window_size: Tuple[int, int],
               out_size: Tuple[int, int],
               bands: Sequence[int] = (1, 2, 3),
               max_pixels: int = 1 << 24) -> np.ndarray:
        """Windowed RGBA8 read (to_rgb, mod.rs:241-269): read bands,
        Lanczos-downsample to out_size, min-max normalize + gamma, NaN→
        alpha 0. Resample + merge run on device (jit).

        Windows above `max_pixels` (top-LoD tiles can span the WHOLE
        mosaic) are processed in overlapping out-tile chunks so peak
        memory stays O(max_pixels) — the out-of-RAM path; chunk interiors
        are bit-identical to the monolithic resample (the sub-windows are
        offset by exact multiples of the stride, and the Lanczos margin
        is cropped)."""
        x, y = window_xy
        w, h = window_size
        ow, oh = out_size
        if w * h > max_pixels:
            if (w % ow == 0 and h % oh == 0 and w // ow == h // oh
                    and w // ow > 1):
                return self._to_rgb_chunked(x, y, w, h, ow, oh, bands,
                                            max_pixels)
            if min(w // max(ow, 1), h // max(oh, 1)) >= 2:
                # Non-integer ratio, still over budget: two-stage —
                # chunked integer Lanczos pre-decimation, then the
                # dense-matrix resample on the small intermediate.
                return self._to_rgb_big_noninteger(
                    x, y, w, h, ow, oh, bands, max_pixels)
            # Ratio < 2: the OUTPUT itself is comparable to the window —
            # memory is inherent to the request; monolithic path below.
        raw = self.read_window(x, y, w, h, bands)
        return self._resample_merge(raw, ow, oh, bands)

    def _resample_merge(self, raw, ow, oh, bands) -> np.ndarray:
        """NaN-safe resample to (oh, ow) + min-max/gamma band merge —
        the monolithic to_rgb tail, shared with the chunked path."""
        import jax.numpy as jnp

        from cubesat_apds_tpu.ops.image import band_merge_rgba
        from cubesat_apds_tpu.ops.resample import (
            lanczos_downsample, lanczos_resample)

        h, w = raw.shape[1], raw.shape[2]
        mm = self.datasets_min_max()
        data = jnp.asarray(raw)
        if (w, h) != (ow, oh):
            # NaN-safe resample: filter validity alongside values. The
            # integer-factor path keeps the shift-add separable conv;
            # arbitrary ratios use the dense-matrix Lanczos
            # (extract_band resamples any window to any out_size,
            # reference mod.rs:332-343).
            nanmask = jnp.isnan(data)
            filled = jnp.where(nanmask, 0.0, data)
            vmask = 1.0 - nanmask.astype(jnp.float32)
            if w % ow == 0 and h % oh == 0 and w // ow == h // oh:
                factor = w // ow
                wsum = lanczos_downsample(vmask, factor)
                vals = lanczos_downsample(filled, factor)
            else:
                wsum = lanczos_resample(vmask, (oh, ow))
                vals = lanczos_resample(filled, (oh, ow))
            data = jnp.where(wsum > 0.5, vals / jnp.maximum(wsum, 1e-6),
                             jnp.nan)
        sel = [b - 1 for b in bands]
        rgba = band_merge_rgba(data, mm.mins[sel], mm.maxs[sel])
        return np.asarray(rgba)

    def _to_rgb_chunked(self, x, y, w, h, ow, oh, bands, max_pixels):
        """Bounded-memory to_rgb for integer factors: overlapping out
        tiles with a Lanczos-support margin (cropped after resampling)."""
        factor = w // ow
        margin = 4  # out px; ≥ ceil(ceil(3·factor)/factor) for Lanczos-3
        # Budget is window PIXELS per chunk; divide by band count so the
        # decoded f32 block stays ~max_pixels·4 bytes total.
        per_band = max(max_pixels // max(len(bands), 1), 1 << 20)
        t_out = max(int(per_band ** 0.5) // factor - 2 * margin, 32)
        out = np.empty((oh, ow, 4), np.uint8)
        for oy0 in range(0, oh, t_out):
            oy1 = min(oy0 + t_out, oh)
            for ox0 in range(0, ow, t_out):
                ox1 = min(ox0 + t_out, ow)
                px0 = (ox0 - margin) * factor
                py0 = (oy0 - margin) * factor
                pw = (ox1 - ox0 + 2 * margin) * factor
                ph = (oy1 - oy0 + 2 * margin) * factor
                raw = self.read_window(x + px0, y + py0, pw, ph, bands)
                # NaN-out everything OUTSIDE the requested [x,x+w)×
                # [y,y+h) window: for an INTERIOR window of a larger
                # mosaic the margin reads return REAL pixels that must
                # not feed the retained output (the monolithic path
                # never sees them; its conv zero-pad ≡ NaN with zero
                # weight). read_window already NaNs out-of-EXTENT areas.
                cols = np.arange(px0, px0 + pw)
                rows = np.arange(py0, py0 + ph)
                raw[:, (rows < 0) | (rows >= h), :] = np.nan
                raw[:, :, (cols < 0) | (cols >= w)] = np.nan
                tile = self._resample_merge(
                    raw, ox1 - ox0 + 2 * margin, oy1 - oy0 + 2 * margin,
                    bands)
                out[oy0:oy1, ox0:ox1] = tile[margin:margin + (oy1 - oy0),
                                             margin:margin + (ox1 - ox0)]
        return out

    def _to_rgb_big_noninteger(self, x, y, w, h, ow, oh, bands,
                               max_pixels):
        """Bounded-memory to_rgb for over-budget NON-integer ratios.

        Stage 1: row-chunked NaN-safe integer Lanczos decimation by
        f = min(w//ow, h//oh) into an f32 (vals, wsum) intermediate
        (window padded to a multiple of f with out-of-extent NaN reads;
        the padded cells carry correct PARTIAL sums since vals and wsum
        decimate with the same kernel). Stage 2: the dense-matrix
        Lanczos with the EXPLICIT full-res geometric scale s/f —
        (j+0.5)·s − 0.5 in full-res coords is (j+0.5)·(s/f) − 0.5 in
        intermediate coords, so alignment is exact.
        """
        import jax.numpy as jnp

        from cubesat_apds_tpu.ops.image import band_merge_rgba
        from cubesat_apds_tpu.ops.resample import (
            lanczos_downsample, lanczos_resample_scaled)

        f = min(w // ow, h // oh)
        w_pad = -(-w // f) * f
        h_pad = -(-h // f) * f
        iw, ih = w_pad // f, h_pad // f
        vals = np.empty((len(bands), ih, iw), np.float32)
        wsum = np.empty_like(vals)
        # Row-chunked stage 1 with a Lanczos margin (cropped after).
        margin = 4  # intermediate rows; ≥ ceil(ceil(3f)/f)
        rows_budget = max(
            (max_pixels // max(len(bands), 1)) // w_pad // f, 8)
        for oy0 in range(0, ih, rows_budget):
            oy1 = min(oy0 + rows_budget, ih)
            ry0 = (oy0 - margin) * f
            rh = (oy1 - oy0 + 2 * margin) * f
            raw = self.read_window(x, y + ry0, w_pad, rh, bands)
            # NaN-out everything OUTSIDE the requested window: for
            # interior windows of a larger mosaic, the margin/padding
            # reads return REAL pixels which must not enter the sums
            # (the monolithic path never sees them; its conv zero-pad ≡
            # our NaN-with-zero-weight).
            rows_full = np.arange(ry0, ry0 + rh)
            raw[:, (rows_full < 0) | (rows_full >= h), :] = np.nan
            if w_pad > w:
                raw[:, :, w:] = np.nan
            nanmask = np.isnan(raw)
            filled = jnp.asarray(np.where(nanmask, 0.0, raw))
            vmask = jnp.asarray(1.0 - nanmask.astype(np.float32))
            v_ds = np.asarray(lanczos_downsample(filled, f))
            m_ds = np.asarray(lanczos_downsample(vmask, f))
            vals[:, oy0:oy1] = v_ds[:, margin:margin + (oy1 - oy0), :iw]
            wsum[:, oy0:oy1] = m_ds[:, margin:margin + (oy1 - oy0), :iw]

        sy = (h / oh) / f
        sx = (w / ow) / f
        # Intermediate pixel k sits at full-res k·f (conv stride-f
        # convention), hence the −0.5/f center offset.
        off = (-0.5 / f, -0.5 / f)
        v2 = lanczos_resample_scaled(jnp.asarray(vals), (oh, ow), (sy, sx),
                                     off)
        m2 = lanczos_resample_scaled(jnp.asarray(wsum), (oh, ow), (sy, sx),
                                     off)
        data = jnp.where(m2 > 0.5, v2 / jnp.maximum(m2, 1e-6), jnp.nan)
        mm = self.datasets_min_max()
        sel = [b - 1 for b in bands]
        rgba = band_merge_rgba(data, mm.mins[sel], mm.maxs[sel])
        return np.asarray(rgba)

    def get_world_coordinates(self, px: float, py: float):
        """pixel → (lon, lat, height) using the attached elevation raster
        (get_world_coordinates, mod.rs:311-329)."""
        gt = self.geotransform
        wx = gt[0] + px * gt[1] + py * gt[2]
        wy = gt[3] + px * gt[4] + py * gt[5]
        height = 0.0
        if self.elevation is not None:
            e = self.elevation
            inv_sx = 1.0 / e.geotransform[1]
            inv_sy = 1.0 / e.geotransform[5]
            ex = int((wx - e.geotransform[0]) * inv_sx)
            ey = int((wy - e.geotransform[3]) * inv_sy)
            ex = int(np.clip(ex, 0, e.width - 1))
            ey = int(np.clip(ey, 0, e.height - 1))
            if isinstance(e, MosaicDataset):
                # Lazy elevation mosaic: 1-px windowed read — exactly the
                # reference's single-pixel elevation read (mod.rs:311-329).
                v = e.read_window(ex, ey, 1, 1, (1,))[0, 0, 0]
            else:
                v = e.bands[0, ey, ex]
            height = float(np.nan_to_num(v))
        return wx, wy, height

    def set_elevation_dataset(self, path_or_raster):
        """Attach the elevation raster (set_elevation_dataset,
        mod.rs:294-309)."""
        if isinstance(path_or_raster, (GeoRaster, MosaicDataset)):
            self.elevation = path_or_raster
        elif os.path.isdir(path_or_raster):
            # LAZY: keep the elevation mosaic as windowed members — a
            # continent-scale DEM folder must not be materialized just to
            # attach it (get_world_coordinates reads 1 px at a time, and
            # preprocess streams it into the store chunked).
            self.elevation = MosaicDataset.from_folder(path_or_raster,
                                                       lazy=True)
        else:
            self.elevation = read_geotiff(path_or_raster)

    # ---- nodata utilities ------------------------------------------------
    # The reference declares but never implements these
    # (todo!() stubs at geotiff mod.rs:271-277; SURVEY.md flags them).

    def detect_nodata(self, band: int = 1,
                      border_fraction_threshold: float = 0.5):
        """Detect a nodata value from the raster border.

        Return contract (disjoint cases):
          * float value — the most common finite border value, when it
            covers ≥ `border_fraction_threshold` of the border;
          * float('nan') — non-finite pixels cover more than the
            threshold fraction of the border (nodata IS NaN);
          * None — no dominant border value found.

        Reads only the four 1-px edge strips (O(perimeter)), never the
        full mosaic — the out-of-RAM ingestion guarantee holds here too.
        """
        w, h = self.width, self.height
        strips = [
            self.read_window(0, 0, w, 1, (band,))[0, 0, :],       # top
            self.read_window(0, h - 1, w, 1, (band,))[0, 0, :],   # bottom
            self.read_window(0, 0, 1, h, (band,))[0, :, 0],       # left
            self.read_window(w - 1, 0, 1, h, (band,))[0, :, 0],   # right
        ]
        border = np.concatenate(strips)
        finite = border[np.isfinite(border)]
        n_nonfinite = len(border) - len(finite)
        if n_nonfinite > border_fraction_threshold * len(border):
            return float("nan")  # dominant border "value" is NaN itself
        if len(finite) == 0:
            return None
        vals, counts = np.unique(finite, return_counts=True)
        top = counts.argmax()
        if counts[top] >= border_fraction_threshold * len(border):
            return float(vals[top])
        return None

    @staticmethod
    def fill_nodata(band: np.ndarray, iterations: int = 16) -> np.ndarray:
        """Fill NaN pixels by iterative 3×3 valid-neighbour averaging
        (inward diffusion from the valid boundary)."""
        out = np.array(band, np.float32, copy=True)
        for _ in range(iterations):
            nan_mask = np.isnan(out)
            if not nan_mask.any():
                break
            filled = np.where(nan_mask, 0.0, out)
            valid = (~nan_mask).astype(np.float32)
            ksum = np.zeros_like(filled)
            kcnt = np.zeros_like(valid)
            for dy in (-1, 0, 1):
                for dx in (-1, 0, 1):
                    ksum += np.roll(np.roll(filled, dy, 0), dx, 1)
                    kcnt += np.roll(np.roll(valid, dy, 0), dx, 1)
            grow = nan_mask & (kcnt > 0)
            out[grow] = (ksum / np.maximum(kcnt, 1))[grow]
        return out

    # ---- materialization (COG equivalent, mod.rs:141-164) --------------

    class _CogSource:
        """Raster-access adapter streaming mosaic windows to write_cog."""

        def __init__(self, ds: "MosaicDataset"):
            self._ds = ds
            self.width, self.height = ds.width, ds.height
            self.n_bands = ds.n_bands

        def read_bands_window(self, band_idxs, y0, y1, x0, x1):
            return self._ds.read_window(
                x0, y0, x1 - x0, y1 - y0,
                bands=[b + 1 for b in band_idxs])

    def materialize(self, path: str, chunk_rows: int = 1024,
                    format: str = "npy"):
        """Persist the full mosaic as a restartable artifact — the
        resume point that DatasetPath::Mosaic reopens (main.rs:54-66).

        format="npy" (default): memory-mapped mosaic.npy + manifest.
        format="cog": an INTEROPERABLE cloud-optimized GeoTIFF
        (mosaic.tif — tiled, deflate+predictor, overviews, geo tags;
        io/cog.py), the artifact the reference materializes via GDAL's
        COG driver (mod.rs:141-164, creation opts mod.rs:380-400). Any
        GDAL/QGIS install can open it; from_materialized reopens it
        with windowed native decode.

        Both stream row/tile chunks — peak memory is O(chunk·width·
        bands), never the whole mosaic (out-of-RAM ingestion)."""
        if format not in ("npy", "cog"):
            raise ValueError(f"unknown materialize format {format!r}")
        os.makedirs(path, exist_ok=True)
        if format == "cog":
            from cubesat_apds_tpu.io.cog import write_cog

            mm = self.datasets_min_max()
            write_cog(os.path.join(path, "mosaic.tif"),
                      self._CogSource(self), self.geotransform,
                      nodata="nan",
                      epsg=getattr(self.members[0], "epsg", None))
            manifest = {
                "version": 1,
                "format": "cog",
                "width": self.width,
                "height": self.height,
                "n_bands": self.n_bands,
                "geotransform": self.geotransform.tolist(),
                "mins": mm.mins.tolist(),
                "maxs": mm.maxs.tolist(),
            }
            with open(os.path.join(path, "manifest.json"), "w") as f:
                json.dump(manifest, f)
            return
        out = np.lib.format.open_memmap(
            os.path.join(path, "mosaic.npy"), mode="w+", dtype=np.float32,
            shape=(self.n_bands, self.height, self.width))
        bands = tuple(range(1, self.n_bands + 1))
        for y0 in range(0, self.height, chunk_rows):
            h = min(chunk_rows, self.height - y0)
            out[:, y0:y0 + h, :] = self.read_window(
                0, y0, self.width, h, bands=bands)
        out.flush()
        del out
        mm = self.datasets_min_max()
        manifest = {
            "version": 1,
            "width": self.width,
            "height": self.height,
            "n_bands": self.n_bands,
            "geotransform": self.geotransform.tolist(),
            "mins": mm.mins.tolist(),
            "maxs": mm.maxs.tolist(),
        }
        with open(os.path.join(path, "manifest.json"), "w") as f:
            json.dump(manifest, f)

    @classmethod
    def from_materialized(cls, path: str) -> "MosaicDataset":
        """import_mosaic_dataset (mod.rs:279-288): reopen a materialized
        mosaic without re-reading the member rasters.

        Accepts the npy artifact, the COG artifact (manifest
        format="cog"), or a BARE GeoTIFF/COG file path — so mosaics
        produced by GDAL itself (the reference's own artifact) drop in.
        """
        if os.path.isfile(path):  # bare .tif from any producer
            from cubesat_apds_tpu.io.tiff import read_geotiff_lazy

            return cls([read_geotiff_lazy(path)])
        with open(os.path.join(path, "manifest.json")) as f:
            manifest = json.load(f)
        mm = BandsMinMax(
            mins=np.asarray(manifest["mins"], np.float32),
            maxs=np.asarray(manifest["maxs"], np.float32))
        if manifest.get("format") == "cog":
            from cubesat_apds_tpu.io.tiff import read_geotiff_lazy

            ds = cls([read_geotiff_lazy(os.path.join(path, "mosaic.tif"))])
            ds._minmax = mm
            return ds
        bands = np.load(os.path.join(path, "mosaic.npy"), mmap_mode="r")
        raster = GeoRaster(
            bands=bands,
            geotransform=np.asarray(manifest["geotransform"], np.float64),
            epsg=None, nodata=None, path=path)
        ds = cls([raster])
        ds._minmax = mm
        return ds
