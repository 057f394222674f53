"""Memory-mapped binary feature store with a native C++ query engine.

The production-scale persistence tier of the feature_database replacement:
columnar .npy files opened with np.memmap (zero-copy) + the C++ scan
kernels in store/native (response-ranked windowed selection with the
reference's ORDER BY response DESC LIMIT 2^18−1 semantics,
keypointdb.rs:12,67-90). Reads never load the full store into RAM — the
role Postgres plays in the reference, without a server.

Write once (from a FeatureStore), read many. Falls back to pure numpy
when no C++ toolchain is available.
"""

from __future__ import annotations

import json
import os
from typing import Dict, Optional, Tuple

import numpy as np

from cubesat_apds_tpu.core.config import DESC_BYTES, MAX_POINTS
from cubesat_apds_tpu.store.feature_store import FeatureStore, ImageRecord
from cubesat_apds_tpu.store.native import get_lib

_COLS = ("x", "y", "size", "angle", "response", "octave", "class_id",
         "image_id")


def write_binary_store(store: FeatureStore, path: str):
    """Persist a FeatureStore as a mmap-friendly binary directory."""
    os.makedirs(path, exist_ok=True)
    n = len(store)
    for c in _COLS:
        np.save(os.path.join(path, f"{c}.npy"),
                np.ascontiguousarray(store._kp[c]))
    np.save(os.path.join(path, "desc.npy"),
            np.ascontiguousarray(store._desc))

    # Denormalized per-keypoint LoD (joins are a luxury of SQL).
    lod_of_image = {r.id: r.level_of_detail for r in store._images.values()}
    lod = np.array([lod_of_image.get(int(i), -1)
                    for i in store._kp["image_id"]], np.int32)
    np.save(os.path.join(path, "lod.npy"), lod)

    # Response-descending permutation (native argsort when available).
    order = np.empty(n, np.int32)
    lib = get_lib()
    resp = np.ascontiguousarray(store._kp["response"], np.float32)
    if lib is not None and n:
        lib.argsort_response_desc(resp, n, order)
    else:
        order[:] = np.argsort(-resp, kind="stable")
    np.save(os.path.join(path, "order.npy"), order)

    manifest = {
        "version": 1,
        "n": n,
        "desc_bytes": DESC_BYTES,
        "next_image_id": store._next_image_id,
        "images": [
            {"id": r.id, "x_start": r.x_start, "y_start": r.y_start,
             "x_end": r.x_end, "y_end": r.y_end,
             "level_of_detail": r.level_of_detail}
            for r in store._images.values()
        ],
        "geotransforms": {str(k): v.tolist()
                          for k, v in store._geotransforms.items()},
        "has_elevation": store._elevation is not None,
    }
    if store._elevation is not None:
        np.save(os.path.join(path, "elevation.npy"), store._elevation)
        np.save(os.path.join(path, "elevation_gt.npy"), store._elevation_gt)
    with open(os.path.join(path, "manifest.json"), "w") as f:
        json.dump(manifest, f)


class BinaryFeatureStore:
    """Read-only, mmap-backed store with reference query semantics."""

    def __init__(self, path: str):
        self.path = path
        with open(os.path.join(path, "manifest.json")) as f:
            self.manifest = json.load(f)
        self.n = self.manifest["n"]
        self.cols: Dict[str, np.ndarray] = {
            c: np.load(os.path.join(path, f"{c}.npy"), mmap_mode="r")
            for c in _COLS
        }
        self.desc = np.load(os.path.join(path, "desc.npy"), mmap_mode="r")
        self.lod = np.load(os.path.join(path, "lod.npy"), mmap_mode="r")
        self.order = np.load(os.path.join(path, "order.npy"), mmap_mode="r")
        self.images = {r["id"]: ImageRecord(**r)
                       for r in self.manifest["images"]}
        self.geotransforms = {
            int(k): np.asarray(v)
            for k, v in self.manifest["geotransforms"].items()}
        self._elevation = (
            np.load(os.path.join(path, "elevation.npy"), mmap_mode="r")
            if self.manifest["has_elevation"] else None)
        self._elevation_gt = (
            np.load(os.path.join(path, "elevation_gt.npy"))
            if self.manifest["has_elevation"] else None)
        self._lib = get_lib()
        # Native kernels need C-contiguous concrete arrays; memmaps
        # satisfy the ndpointer checks but we pin the hot columns.
        if self._lib is not None:
            self._xc = np.ascontiguousarray(self.cols["x"], np.float32)
            self._yc = np.ascontiguousarray(self.cols["y"], np.float32)
            self._lodc = np.ascontiguousarray(self.lod, np.int32)
            self._orderc = np.ascontiguousarray(self.order, np.int32)
            self._imgc = np.ascontiguousarray(self.cols["image_id"],
                                              np.int32)

    def __len__(self):
        return self.n

    # ---- queries (reference semantics) ---------------------------------

    def read_keypoints_from_lod(self, lod: int, limit: int = MAX_POINTS):
        out = np.empty(min(limit, self.n), np.int32)
        if self._lib is not None:
            m = self._lib.query_lod(self._lodc, self._orderc, self.n,
                                    lod, limit, out)
            idx = out[:m]
        else:
            ranked = self.order[np.asarray(self.lod)[self.order] == lod]
            idx = ranked[:limit]
        return self._select(idx)

    def read_keypoints_from_coordinates(self, x_start, x_end, y_start,
                                        y_end, lod: int,
                                        limit: int = MAX_POINTS):
        out = np.empty(min(limit, self.n), np.int32)
        if self._lib is not None:
            m = self._lib.query_window(
                self._xc, self._yc, self._lodc, self._orderc, self.n,
                float(x_start), float(x_end), float(y_start), float(y_end),
                lod, limit, out)
            idx = out[:m]
        else:
            x = np.asarray(self.cols["x"])
            y = np.asarray(self.cols["y"])
            mask = ((np.asarray(self.lod) == lod) & (x >= x_start)
                    & (x <= x_end) & (y >= y_start) & (y <= y_end))
            ranked = self.order[mask[self.order]]
            idx = ranked[:limit]
        return self._select(idx)

    def read_keypoints_from_image_id(self, image_id: int,
                                     limit: int = MAX_POINTS):
        out = np.empty(min(limit, self.n), np.int32)
        if self._lib is not None:
            m = self._lib.query_image(self._imgc, self._orderc, self.n,
                                      image_id, limit, out)
            idx = out[:m]
        else:
            ranked = self.order[
                np.asarray(self.cols["image_id"])[self.order] == image_id]
            idx = ranked[:limit]
        return self._select(idx)

    def _select(self, idx: np.ndarray):
        cols = {c: np.asarray(self.cols[c])[idx] for c in _COLS}
        if self._lib is not None and len(idx):
            desc = np.empty((len(idx), DESC_BYTES), np.uint8)
            self._lib.gather_descriptors(
                np.ascontiguousarray(self.desc), DESC_BYTES,
                np.ascontiguousarray(idx, np.int32), len(idx), desc)
        else:
            desc = np.asarray(self.desc)[idx]
        return cols, desc

    # ---- geo (parity with FeatureStore) ---------------------------------

    @property
    def _geotransforms(self):
        return self.geotransforms

    def world_dataset_id(self) -> Optional[int]:
        """See FeatureStore.world_dataset_id — same convention."""
        from cubesat_apds_tpu.store.feature_store import (
            ELEVATION_DATASET_ID, MOSAIC_DATASET_ID)

        ids = sorted(k for k in self.geotransforms
                     if k != ELEVATION_DATASET_ID)
        if not ids:
            return None
        if ids != [MOSAIC_DATASET_ID]:
            raise ValueError(
                f"ambiguous world mapping: geotransforms registered for "
                f"datasets {ids}; keypoint coordinates are in the mosaic "
                f"(dataset {MOSAIC_DATASET_ID}) reference frame only")
        return MOSAIC_DATASET_ID

    def get_world_coordinates(self, dataset_id: int, px, py) -> np.ndarray:
        """pixel → ECEF (elevationdb.rs:64-104 semantics), vectorized."""
        from cubesat_apds_tpu.core import geodesy as G

        gt = self.geotransforms[dataset_id]
        wx, wy = G.geotransform_apply(gt, np.asarray(px, np.float64),
                                      np.asarray(py, np.float64))
        ex, ey = G.world_to_pixel(self._elevation_gt, wx, wy)
        h, w = self._elevation.shape
        exi = np.clip(np.asarray(np.floor(ex), np.int64), 0, w - 1)
        eyi = np.clip(np.asarray(np.floor(ey), np.int64), 0, h - 1)
        height = np.asarray(self._elevation)[eyi, exi]
        return np.asarray(G.geodetic_to_ecef(wx, wy, height))

    # ---- device export --------------------------------------------------

    def export_device_block(self, lod: Optional[int] = None,
                            pad_multiple: int = 2048):
        if lod is None:
            idx = np.asarray(self.order)[:MAX_POINTS]
            cols, desc = self._select(idx)
        else:
            cols, desc = self.read_keypoints_from_lod(lod)
        n = len(desc)
        m = max(pad_multiple,
                ((n + pad_multiple - 1) // pad_multiple) * pad_multiple)
        desc_p = np.zeros((m, DESC_BYTES), np.uint8)
        desc_p[:n] = desc
        xy = np.zeros((m, 2), np.float32)
        xy[:n, 0] = cols["x"]
        xy[:n, 1] = cols["y"]
        img_id = np.zeros(m, np.int32)
        img_id[:n] = cols["image_id"]
        valid = np.zeros(m, bool)
        valid[:n] = True
        return desc_p, xy, valid, img_id
