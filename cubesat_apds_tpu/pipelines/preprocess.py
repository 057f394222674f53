"""Offline DB build: mosaic → LoD tile grid → AKAZE → store.

The preprocessor binary rebuilt (reference: preprocessor/src/main.rs:70-327).
Where the reference fans out rayon threads per tile with two serializing
mutexes around GDAL and Postgres (SURVEY.md §3.1 "hot loops"), the TPU
pipeline batches tiles: host window reads feed a device batch, AKAZE runs
vmapped over the batch, and store inserts are plain array appends.

LoD math matches level_of_detail.rs: per-AXIS tile size dim/2^(L−1)
(main.rs:212-216 computes tile_size.x and tile_size.y separately),
per-LoD grid of columns×rows, keypoint coordinates upscaled to the
reference frame as x·2^lod + offset (main.rs:296-304). Ragged
right/bottom strips are covered by edge-shifted tiles (fixing the
reference's dropped remainder, SURVEY.md §7).
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Callable, Optional

import jax.numpy as jnp
import numpy as np

from cubesat_apds_tpu.core.config import AkazeConfig, PipelineConfig
from cubesat_apds_tpu.io.mosaic import MosaicDataset
from cubesat_apds_tpu.ops.features.akaze import detect_and_compute_batch
from cubesat_apds_tpu.ops.image import (
    calculate_amount_of_levels, lod_tile_grid, rgb_to_gray)
from cubesat_apds_tpu.store.feature_store import FeatureStore


@dataclasses.dataclass
class PreprocessStats:
    lods: int = 0
    tiles: int = 0
    keypoints: int = 0


class _Checkpointer:
    """Crash-safe partial-store persistence for `preprocess`.

    Two alternating slot directories + an atomically-replaced
    cursor.json. The cursor (which names its slot) is committed only
    AFTER that slot finished writing, so the previous checkpoint stays
    loadable throughout a save — a crash at any instant leaves either
    the old or the new checkpoint intact, never a torn one.
    """

    def __init__(self, root: Optional[str], every: int):
        self.root = root
        self.every = max(int(every), 1)
        self._slot = 0
        self._done = 0

    def _cursor_path(self) -> str:
        return os.path.join(self.root, "cursor.json")

    def read_cursor(self) -> Optional[dict]:
        if self.root is None or not os.path.exists(self._cursor_path()):
            return None
        with open(self._cursor_path()) as f:
            return json.load(f)

    def load_store(self, cursor: dict) -> FeatureStore:
        return FeatureStore.load(os.path.join(self.root, cursor["slot"]))

    def validate(self, cursor: dict, params: dict) -> None:
        got = {k: cursor.get(k) for k in params}
        if got != params:
            raise ValueError(
                f"checkpoint was written by a different run: {got} vs "
                f"this run's {params} — delete {self.root} to start over")
        # Next save goes to the OTHER slot, preserving the one loaded.
        self._slot = {"slot_a": 1, "slot_b": 0}[cursor["slot"]]

    def maybe_save(self, store: FeatureStore, params: dict,
                   lod: int, start: int) -> None:
        """Checkpoint after the (lod, start) batch completed, every
        `every` completed batches."""
        if self.root is None:
            return
        self._done += 1
        if self._done % self.every:
            return
        slot = f"slot_{'ab'[self._slot]}"
        self._slot ^= 1
        store.save(os.path.join(self.root, slot))
        tmp = self._cursor_path() + ".tmp"
        with open(tmp, "w") as f:
            json.dump(dict(params, lod=lod, start=start, slot=slot), f)
        os.replace(tmp, self._cursor_path())

    def cleanup(self) -> None:
        """Remove the checkpoint after a successful full run."""
        if self.root is None or not os.path.isdir(self.root):
            return
        import shutil

        for name in ("slot_a", "slot_b"):
            shutil.rmtree(os.path.join(self.root, name), ignore_errors=True)
        for f_ in ("cursor.json", "cursor.json.tmp"):
            try:
                os.remove(os.path.join(self.root, f_))
            except OSError:
                pass
        try:
            os.rmdir(self.root)
        except OSError:
            pass


def preprocess(
    dataset: MosaicDataset,
    store: Optional[FeatureStore] = None,
    config: PipelineConfig = PipelineConfig(),
    amount_lod: Optional[int] = None,
    tile_batch: int = 8,
    elevation_path: Optional[str] = None,
    progress: Optional[Callable[[str], None]] = None,
    mesh=None,
    checkpoint_dir: Optional[str] = None,
    checkpoint_every: int = 16,
    resume: bool = False,
) -> tuple[FeatureStore, PreprocessStats]:
    """Build a FeatureStore from a mosaic (main.rs:70-124 flow).

    `mesh` (a jax.sharding.Mesh with a "dp" axis) shards each tile batch
    over the mesh's dp devices — the offline analogue of parallel.serve
    and the TPU-native replacement for the reference's rayon per-tile
    fan-out (preprocessor main.rs:227-245). Pure data parallelism: the
    sharded run is element-wise identical to the single-device run.

    `checkpoint_dir` enables mid-run checkpoint/resume — the recovery
    the reference lacks entirely (SURVEY.md §5: "no resume of a
    partially built DB"; its only restart point is the materialized
    mosaic). Every `checkpoint_every` tile batches the partial store is
    saved to an alternating slot and a cursor (last completed batch +
    run parameters) is committed atomically AFTER the save, so a crash
    at any instant leaves a loadable checkpoint. `resume=True` picks up
    from the cursor (a missing cursor just starts fresh); the run
    parameters must match or it refuses. On success the checkpoint is
    removed. Note: a store carrying an elevation raster re-saves it in
    every checkpoint — raise `checkpoint_every` for huge DEMs.
    """
    _ckpt = _Checkpointer(checkpoint_dir, checkpoint_every)
    cursor = _ckpt.read_cursor() if resume else None
    if cursor is not None:
        if store is not None:
            raise ValueError("resume=True loads the store from the "
                             "checkpoint; don't pass `store` too")
        store = _ckpt.load_store(cursor)
    else:
        # A fresh run discards any stale checkpoint — otherwise a later
        # resume could pick up a cursor from a DIFFERENT previous run.
        _ckpt.cleanup()
    store = store or FeatureStore()
    # Stamp descriptor provenance: sampling modes (and hybrid
    # subdivisions) don't mix, so the store records which TAG built it
    # (AkazeConfig.descriptor_tag, checked at serve time).
    tag = config.akaze.descriptor_tag
    if store.descriptor_mode is not None and store.descriptor_mode != tag:
        raise ValueError(
            f"store holds descriptor_mode='{store.descriptor_mode}' "
            f"descriptors but the config produces '{tag}' — "
            "mixed-mode descriptors don't match; use a matching config "
            "or a fresh store")
    store.descriptor_mode = tag
    stats = PreprocessStats()
    log = progress or (lambda s: None)

    if mesh is not None:
        import jax
        from jax.sharding import NamedSharding, PartitionSpec

        dp = mesh.shape["dp"]
        # The static batch width must tile evenly over the dp axis.
        tile_batch = max(dp * ((tile_batch + dp - 1) // dp), dp)
        _place = lambda b: jax.device_put(  # noqa: E731
            b, NamedSharding(mesh, PartitionSpec("dp")))
        # Extraction output REPLICATED over the mesh: on a multi-process
        # (DCN) mesh each process otherwise holds only its dp shard and
        # the host fetch below fails on the non-addressable remainder
        # (every process ingests the full batch into its store copy).
        _extract = jax.jit(
            lambda b: detect_and_compute_batch(b, config.akaze),
            out_shardings=NamedSharding(mesh, PartitionSpec()))
    else:
        _place = lambda b: b  # noqa: E731
        _extract = lambda b: detect_and_compute_batch(b, config.akaze)  # noqa: E731,E501

    width, height = dataset.get_dimensions()
    if amount_lod is None:
        amount_lod = calculate_amount_of_levels(width * height)
    stats.lods = amount_lod

    # The batch iteration order is deterministic in these parameters, so
    # a cursor naming the last completed (lod, start) fully determines
    # the remaining work — but only for the SAME parameters.
    params = {"width": width, "height": height, "amount_lod": amount_lod,
              "tile_batch": tile_batch, "descriptor_mode": tag}
    if cursor is not None:
        _ckpt.validate(cursor, params)
        stats.tiles = len(store._images)
        stats.keypoints = len(store)
        log(f"resuming after LoD {cursor['lod']} batch {cursor['start']}: "
            f"{stats.keypoints} keypoints, {stats.tiles} tiles so far")

    # Mosaic geotransform is dataset id 1; elevation handling mirrors
    # add_elevation (main.rs:128-140): store both geotransforms + raster.
    store.set_geotransform(1, dataset.geotransform)
    if elevation_path is not None:
        dataset.set_elevation_dataset(elevation_path)
    if dataset.elevation is not None:
        e = dataset.elevation
        store.set_geotransform(2, e.geotransform)
        # The store persists the full elevation raster (the reference
        # inserts every pixel, add_elevation_data elevationdb.rs:191-232).
        # A lazily-attached elevation mosaic is streamed in row chunks so
        # only the destination array is ever fully resident.
        if hasattr(e, "read_window"):
            raster = np.empty((e.height, e.width), np.float32)
            for y0 in range(0, e.height, 1024):
                hh = min(1024, e.height - y0)
                raster[y0:y0 + hh] = e.read_window(0, y0, e.width, hh,
                                                   (1,))[0]
                # NaN-fix per chunk, in place: a whole-raster
                # nan_to_num would materialize a second DEM-sized copy,
                # defeating the streaming read above.
                np.nan_to_num(raster[y0:y0 + hh], copy=False)
        else:
            # Eager mosaic: the band is the dataset's own array — don't
            # mutate it; the copy here is bounded by data already in RAM.
            raster = np.nan_to_num(e.bands[0])
        store.set_elevation(raster, e.geotransform)

    grid = lod_tile_grid(width, height, amount_lod)

    for lod in range(amount_lod):
        tile_w, tile_h, step_x, step_y, off_x, off_y, bx, by = grid[lod]
        columns, rows = len(off_x), len(off_y)
        log(f"LoD {lod}: {columns}x{rows} tiles of {step_x}x{step_y} px "
            f"-> {tile_w}x{tile_h}")

        tiles_meta = [(r, c) for r in range(rows) for c in range(columns)]
        for start in range(0, len(tiles_meta), tile_batch):
            if cursor is not None and \
                    (lod, start) <= (cursor["lod"], cursor["start"]):
                continue               # completed before the crash
            batch_meta = tiles_meta[start:start + tile_batch]
            grays = []
            for r, c in batch_meta:
                rgba = dataset.to_rgb((off_x[c], off_y[r]), (step_x, step_y),
                                      (tile_w, tile_h))
                grays.append(rgb_to_gray(jnp.asarray(rgba[..., :3])))
            # Pad ragged final batches to the fixed batch width — a new
            # batch shape would trigger a full AKAZE recompile. Under a
            # mesh the batch must always fill to a dp multiple.
            while len(grays) < tile_batch and (len(tiles_meta) > tile_batch
                                               or mesh is not None):
                grays.append(jnp.zeros_like(grays[0]))
            batch = _place(jnp.stack(grays))
            feats = _extract(batch)

            kp = feats.keypoints
            xy = np.asarray(kp.xy)
            size = np.asarray(kp.size)
            angle = np.asarray(kp.angle)
            response = np.asarray(kp.response)
            octave = np.asarray(kp.octave)
            class_id = np.asarray(kp.class_id)
            valid = np.asarray(kp.valid)
            desc = np.asarray(feats.descriptors)

            for bi, (r, c) in enumerate(batch_meta):
                # Tile record in REFERENCE-frame coordinates
                # (InsertImage, main.rs:280-293).
                iid = store.create_image(
                    off_x[c], off_y[r], off_x[c] + step_x, off_y[r] + step_y,
                    lod)
                v = valid[bi]
                n = int(v.sum())
                if n == 0:
                    stats.tiles += 1
                    continue
                scale = float(2 ** lod)
                # Coordinate upscale x·2^lod + tile offset (main.rs:296-304).
                gx = xy[bi, v, 0] * scale + off_x[c]
                gy = xy[bi, v, 1] * scale + off_y[r]
                # Ownership filter: edge-shifted ragged tiles overlap
                # their neighbours; each keypoint is stored by exactly
                # ONE tile (lod_tile_grid bounds) — duplicate near-twin
                # descriptors would poison the Lowe ratio test at query
                # time (d0 ≈ d1 for the twin pair).
                own = ((gx >= bx[c]) & (gx < bx[c + 1])
                       & (gy >= by[r]) & (gy < by[r + 1]))
                gx, gy = gx[own], gy[own]
                n = int(own.sum())
                if n == 0:
                    stats.tiles += 1
                    continue
                vv = np.where(v)[0][own]
                store.add_keypoints(
                    iid, gx, gy, size[bi, vv], angle[bi, vv],
                    response[bi, vv], octave[bi, vv], class_id[bi, vv],
                    desc[bi, vv])
                stats.tiles += 1
                stats.keypoints += n
            _ckpt.maybe_save(store, params, lod, start)
        log(f"LoD {lod} done: {len(store)} keypoints total")
    _ckpt.cleanup()
    return store, stats
