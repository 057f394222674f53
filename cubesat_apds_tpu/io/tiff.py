"""Host-side GeoTIFF reading (PIL pixels + our own geo-tag parsing).

Replaces the GDAL raster layer (reference: geotiff_extractor/src/
image_extractor/mod.rs — gdal crate FFI). No GDAL/rasterio in this
environment, so geo metadata comes straight from the TIFF IFD:

  * 33550 ModelPixelScaleTag, 33922 ModelTiepointTag → affine geotransform
    (GDAL convention, north-up; full 34264 transform honoured when present)
  * 34735 GeoKeyDirectoryTag → EPSG code (best-effort)
  * 42113 GDAL_NODATA → nodata value

Pixel decode goes through PIL (strips/tiles, LZW/deflate/packbits all
supported there); bands come back as float32 with nodata → NaN, matching
the reference's read_as::<f32> + nodata → alpha behavior
(mod.rs:332-378).
"""

from __future__ import annotations

import dataclasses
import os
from typing import List, Optional

import numpy as np
from PIL import Image

Image.MAX_IMAGE_PIXELS = None  # satellite mosaics exceed PIL's default cap

_TAG_PIXEL_SCALE = 33550
_TAG_TIEPOINT = 33922
_TAG_TRANSFORM = 34264
_TAG_GEO_KEYS = 34735
_TAG_GDAL_NODATA = 42113

VALID_EXTENSIONS = (".tif", ".tiff")


def _read_tags(path: str) -> dict:
    """First-IFD tag dict: PIL's tag_v2 when PIL can identify the file,
    else a minimal pure-Python IFD walk.

    PIL refuses files whose pixel layout has no PIL mode (e.g. the
    multiband float32 COGs io/cog.py writes — no reader has an RGB-float
    mode), but the geo TAGS are still plain TIFF; this fallback keeps
    read_geotiff/LazyGeoRaster self-sufficient for everything the
    native decoder can decode.
    """
    import struct

    try:
        with Image.open(path) as im:
            return dict(im.tag_v2) if hasattr(im, "tag_v2") else {}
    except Exception:
        pass
    tags: dict = {}
    try:
        with open(path, "rb") as f:
            head = f.read(16)
            if len(head) < 8 or head[:2] not in (b"II", b"MM"):
                return tags
            bo = "<" if head[:2] == b"II" else ">"
            version = struct.unpack(bo + "H", head[2:4])[0]
            if version == 42:
                big = False
                ifd = struct.unpack(bo + "I", head[4:8])[0]
            elif version == 43:    # BigTIFF (io/cog.py past 4 GB)
                if len(head) < 16 or \
                        struct.unpack(bo + "H", head[4:6])[0] != 8:
                    return tags
                big = True
                ifd = struct.unpack(bo + "Q", head[8:16])[0]
            else:
                return tags
            entry_sz = 20 if big else 12
            inline = 8 if big else 4
            f.seek(ifd)
            if big:
                n = struct.unpack(bo + "Q", f.read(8))[0]
            else:
                n = struct.unpack(bo + "H", f.read(2))[0]
            entries = f.read(entry_sz * n)
            sizes = {1: 1, 2: 1, 3: 2, 4: 4, 11: 4, 12: 8, 16: 8}
            fmts = {1: "B", 2: "s", 3: "H", 4: "I", 11: "f", 12: "d",
                    16: "Q"}
            for i in range(n):
                e = entries[entry_sz * i:entry_sz * (i + 1)]
                tag, ty = struct.unpack(bo + "HH", e[:4])
                cnt = struct.unpack(bo + ("Q" if big else "I"),
                                    e[4:4 + (8 if big else 4)])[0]
                if ty not in sizes:
                    continue
                total = sizes[ty] * cnt
                raw = e[entry_sz - inline:]
                if total > inline:
                    off = struct.unpack(bo + ("Q" if big else "I"),
                                        raw)[0]
                    f.seek(off)
                    raw = f.read(total)
                if ty == 2:
                    tags[tag] = raw[:cnt].split(b"\0")[0].decode(
                        "ascii", "replace")
                else:
                    tags[tag] = struct.unpack(
                        bo + fmts[ty] * cnt, raw[:total])
    except OSError:
        pass
    return tags


@dataclasses.dataclass
class GeoRaster:
    """One decoded raster: bands [C, H, W] float32 (NaN = nodata) + geo."""

    bands: np.ndarray
    geotransform: np.ndarray       # [6] GDAL order
    epsg: Optional[int]
    nodata: Optional[float]
    path: str

    @property
    def height(self) -> int:
        return self.bands.shape[1]

    @property
    def width(self) -> int:
        return self.bands.shape[2]

    @property
    def n_bands(self) -> int:
        return self.bands.shape[0]

    def read_band_window(self, b: int, y0: int, y1: int,
                         x0: int, x1: int) -> np.ndarray:
        """Band b (0-based) window [y0:y1, x0:x1] as float32/NaN-nodata.

        The raster-access protocol shared with LazyGeoRaster — mosaic
        reads go through this instead of touching .bands directly, so
        members can be streamed from disk."""
        return self.bands[b, y0:y1, x0:x1]

    def read_bands_window(self, band_idxs, y0: int, y1: int,
                          x0: int, x1: int) -> np.ndarray:
        """[len(band_idxs), h, w] — multi-band window (one call)."""
        return self.bands[list(band_idxs), y0:y1, x0:x1]

    def band_min_max(self, b: int):
        band = self.bands[b]
        if np.isnan(band).all():
            return None
        return float(np.nanmin(band)), float(np.nanmax(band))

    def pixel_to_world(self, px, py):
        gt = self.geotransform
        return (gt[0] + px * gt[1] + py * gt[2],
                gt[3] + px * gt[4] + py * gt[5])

    def bounds(self):
        """(xmin, ymin, xmax, ymax) in world coordinates."""
        corners = [(0, 0), (self.width, 0), (0, self.height),
                   (self.width, self.height)]
        pts = [self.pixel_to_world(x, y) for x, y in corners]
        xs = [p[0] for p in pts]
        ys = [p[1] for p in pts]
        return min(xs), min(ys), max(xs), max(ys)


class LazyGeoRaster:
    """A GeoRaster whose pixels stay ON DISK: header-only open (PIL tag
    read + native mmap handle), windowed decode on demand.

    Implements the same raster-access protocol as GeoRaster
    (width/height/n_bands/geotransform/read_band_window/band_min_max/
    pixel_to_world/bounds), so MosaicDataset members can mix eager and
    lazy rasters — the out-of-RAM ingestion path (the reference streams
    COG windows via GDAL, mod.rs:141-164,332-343, for the same reason).
    """

    def __init__(self, path: str, apply_nodata: bool = True,
                 n_threads: int = 8):
        from cubesat_apds_tpu.io.native import NativeTiff

        tags = _read_tags(path)
        self._tif = NativeTiff(path, n_threads)   # raises if unsupported
        self.path = path
        self.geotransform = _geotransform_from_tags(tags)
        self.epsg = _epsg_from_geokeys(tags)
        self.nodata = _nodata_from_tags(tags)
        self.apply_nodata = apply_nodata
        self.width = self._tif.width
        self.height = self._tif.height
        self.n_bands = self._tif.samples
        self._minmax: dict = {}

    def read_bands_window(self, band_idxs, y0: int, y1: int,
                          x0: int, x1: int) -> np.ndarray:
        """[len(band_idxs), h, w] float32 from ONE windowed decode —
        the native decoder inflates each intersecting strip/tile once
        regardless of how many bands the caller wants."""
        win = self._tif.read_window(x0, y0, x1 - x0, y1 - y0)
        if win.ndim == 2:
            win = win[..., None]
        for b in band_idxs:
            if b >= win.shape[-1]:
                raise IndexError(f"band {b} of {win.shape[-1]}-band raster")
        out = np.moveaxis(win[..., list(band_idxs)], -1, 0).astype(np.float32)
        if self.apply_nodata and self.nodata is not None:
            out[out == self.nodata] = np.nan
        return out

    def read_band_window(self, b: int, y0: int, y1: int,
                         x0: int, x1: int) -> np.ndarray:
        return self.read_bands_window((b,), y0, y1, x0, x1)[0]

    def _scan_min_max(self, chunk_rows: int = 1024):
        """Streaming ALL-band min/max in one pass over row chunks (one
        decode per chunk, never whole-raster RAM)."""
        lo = np.full(self.n_bands, np.inf)
        hi = np.full(self.n_bands, -np.inf)
        for y0 in range(0, self.height, chunk_rows):
            y1 = min(y0 + chunk_rows, self.height)
            w = self.read_bands_window(range(self.n_bands), y0, y1,
                                       0, self.width)
            for b in range(self.n_bands):
                if not np.isnan(w[b]).all():
                    lo[b] = min(lo[b], float(np.nanmin(w[b])))
                    hi[b] = max(hi[b], float(np.nanmax(w[b])))
        for b in range(self.n_bands):
            self._minmax[b] = None if lo[b] > hi[b] else \
                (float(lo[b]), float(hi[b]))

    def band_min_max(self, b: int, chunk_rows: int = 1024):
        if b not in self._minmax:
            self._scan_min_max(chunk_rows)
        return self._minmax[b]

    pixel_to_world = GeoRaster.pixel_to_world
    bounds = GeoRaster.bounds

    @property
    def bands(self):
        raise MemoryError(
            f"LazyGeoRaster({self.path}) holds no in-RAM bands; use "
            "read_band_window")

    def close(self):
        self._tif.close()


def read_geotiff_lazy(path: str,
                      apply_nodata: bool = True) -> "GeoRaster | LazyGeoRaster":
    """LazyGeoRaster when the native decoder supports the file, else an
    eager read_geotiff (PIL path)."""
    try:
        return LazyGeoRaster(path, apply_nodata)
    except OSError:
        return read_geotiff(path, apply_nodata)


def _geotransform_from_tags(tags) -> np.ndarray:
    if _TAG_TRANSFORM in tags:
        m = np.asarray(tags[_TAG_TRANSFORM], np.float64)  # 4×4 row-major
        return np.array([m[3], m[0], m[1], m[7], m[4], m[5]], np.float64)
    if _TAG_PIXEL_SCALE in tags and _TAG_TIEPOINT in tags:
        sx, sy = tags[_TAG_PIXEL_SCALE][0], tags[_TAG_PIXEL_SCALE][1]
        tp = tags[_TAG_TIEPOINT]
        # Tiepoint: (i, j, k, X, Y, Z) — pixel (i,j) maps to world (X,Y).
        i, j, X, Y = tp[0], tp[1], tp[3], tp[4]
        return np.array([X - i * sx, sx, 0.0, Y + j * sy, 0.0, -sy],
                        np.float64)
    # No geo info: identity transform.
    return np.array([0.0, 1.0, 0.0, 0.0, 0.0, 1.0], np.float64)


def _epsg_from_geokeys(tags) -> Optional[int]:
    if _TAG_GEO_KEYS not in tags:
        return None
    keys = tags[_TAG_GEO_KEYS]
    # GeoKeyDirectory: header of 4 shorts then (keyID, location, count,
    # value) quadruples. Geographic CS = key 2048, projected CS = key 3072.
    vals = list(keys)
    epsg = None
    for k in range(4, len(vals) - 3, 4):
        key_id, loc, _count, value = vals[k:k + 4]
        if loc == 0 and key_id in (3072, 2048):
            epsg = int(value)
            if key_id == 3072:
                break
    return epsg


def _nodata_from_tags(tags) -> Optional[float]:
    if _TAG_GDAL_NODATA not in tags:
        return None
    raw = tags[_TAG_GDAL_NODATA]
    try:
        return float(str(raw).strip().split()[0])
    except (ValueError, IndexError):
        return None


def read_geotiff(path: str, apply_nodata: bool = True) -> GeoRaster:
    """Decode a GeoTIFF into float32 bands [C, H, W] + geo metadata.

    Pixels go through the native multithreaded decoder
    (io.native.read_tiff_native) when the file's layout is supported;
    geo tags always come from the (lazy, no-decode) PIL header read.
    """
    from cubesat_apds_tpu.io.native import read_tiff_native

    tags = _read_tags(path)
    arr = read_tiff_native(path)
    if arr is None:
        with Image.open(path) as im:
            arr = np.asarray(im)
    if arr.ndim == 2:
        arr = arr[None]
    else:  # H, W, C → C, H, W
        arr = np.moveaxis(arr, -1, 0)
    bands = arr.astype(np.float32)
    nodata = _nodata_from_tags(tags)
    if apply_nodata and nodata is not None:
        bands = np.where(bands == nodata, np.nan, bands)
    return GeoRaster(
        bands=bands,
        geotransform=_geotransform_from_tags(tags),
        epsg=_epsg_from_geokeys(tags),
        nodata=nodata,
        path=path,
    )


def write_geotiff(path: str, bands: np.ndarray, geotransform,
                  nodata: Optional[float] = None):
    """Minimal GeoTIFF writer (fixtures + materialized mosaics).

    Writes pixel data via PIL and the geo tags (pixel scale + tiepoint +
    optional nodata). North-up transforms only.
    """
    bands = np.asarray(bands)
    if bands.ndim == 3:
        if bands.shape[0] in (1, 3, 4) and bands.shape[0] < bands.shape[-1]:
            img_arr = np.moveaxis(bands, 0, -1)
        else:
            img_arr = bands
        if img_arr.shape[-1] == 1:
            img_arr = img_arr[..., 0]
    else:
        img_arr = bands
    im = Image.fromarray(img_arr)
    gt = np.asarray(geotransform, np.float64)
    tiffinfo = {
        _TAG_PIXEL_SCALE: (float(gt[1]), float(-gt[5]), 0.0),
        _TAG_TIEPOINT: (0.0, 0.0, 0.0, float(gt[0]), float(gt[3]), 0.0),
    }
    if nodata is not None:
        tiffinfo[_TAG_GDAL_NODATA] = str(nodata)
    im.save(path, format="TIFF", tiffinfo=tiffinfo)


def list_rasters(folder: str) -> List[str]:
    """All TIFFs in a folder (dataset_from_folder, geotiff mod.rs:178-197)."""
    out = []
    for name in sorted(os.listdir(folder)):
        if os.path.splitext(name)[1].lower() in VALID_EXTENSIONS:
            out.append(os.path.join(folder, name))
    return out
