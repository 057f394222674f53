"""Streaming attitude determination: continuous frame → pose at cadence.

BASELINE.json config 5: "continuous multi-frame pipeline geotiff tiling →
preprocess → detect → match → PnP pose at fixed cadence". The reference
has no streaming path at all (SURVEY.md §2.3 "PP: No"); this is the
TPU-native design:

  * the device step is ONE jitted function reused across frames
    (compile once, steady-state dispatch);
  * host decode / normalization for frame t+1 overlaps device compute
    for frame t (double-buffered prefetch thread);
  * results are fetched asynchronously — device_get only forces the
    PREVIOUS frame's outputs, keeping the device queue full;
  * per-stage wall-clock stats are collected for the cadence report.
"""

from __future__ import annotations

import dataclasses
import queue
import threading
import time
from typing import Callable, Iterable, Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np

from cubesat_apds_tpu.core.config import PipelineConfig
from cubesat_apds_tpu.core.types import CameraModel
from cubesat_apds_tpu.pipelines.localize import DeviceDb, localize_frame_jit
from cubesat_apds_tpu.utils.profiling import StageTimes


@dataclasses.dataclass
class StreamResult:
    frame_id: int
    homography: np.ndarray
    homography_ok: bool
    num_inliers: int
    num_matches: int
    num_keypoints: int
    rvec: Optional[np.ndarray]
    tvec: Optional[np.ndarray]
    pose_ok: Optional[bool]
    latency_s: float


class StreamingLocalizer:
    """Continuous localization against a device-resident DB."""

    def __init__(self, db: DeviceDb, camera: CameraModel,
                 config: PipelineConfig = PipelineConfig(),
                 solve_pose: bool = True, prefetch: int = 2):
        self.db = db
        self.camera = camera
        self.config = config
        self.solve_pose = solve_pose
        self.prefetch = max(prefetch, 1)
        self.times = StageTimes()

    def _device_step(self, frame_dev):
        return localize_frame_jit(frame_dev, self.db, self.camera,
                                  self.config, self.solve_pose)

    def run(self, frames: Iterable[np.ndarray],
            preprocess: Optional[Callable[[np.ndarray], np.ndarray]] = None
            ) -> Iterator[StreamResult]:
        """Yield a StreamResult per input frame, pipelined.

        `preprocess` runs on the host prefetch thread (e.g. decode +
        grayscale); frames must share one shape.
        """
        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        SENTINEL = object()

        def producer():
            for i, f in enumerate(frames):
                t0 = time.perf_counter()
                if preprocess is not None:
                    f = preprocess(f)
                arr = jnp.asarray(np.asarray(f, np.float32))
                # device_put happens lazily at dispatch; timing the host
                # side only here.
                self.times.add("host_preprocess", time.perf_counter() - t0)
                q.put((i, arr, time.perf_counter()))
            q.put(SENTINEL)

        threading.Thread(target=producer, daemon=True).start()

        in_flight = []  # [(frame_id, t_submit, result_pytree)]
        while True:
            item = q.get()
            if item is SENTINEL:
                break
            i, arr, t_enq = item
            t0 = time.perf_counter()
            out = self._device_step(arr)
            self.times.add("dispatch", time.perf_counter() - t0)
            in_flight.append((i, t_enq, out))
            # Keep at most `prefetch` frames in the device queue.
            while len(in_flight) > self.prefetch:
                yield self._finish(*in_flight.pop(0))
        while in_flight:
            yield self._finish(*in_flight.pop(0))

    def _finish(self, frame_id: int, t_enq: float, out) -> StreamResult:
        t0 = time.perf_counter()
        leaves = jax.tree_util.tree_leaves(out)
        jax.block_until_ready(leaves)
        self.times.add("device_wait", time.perf_counter() - t0)
        pose = out.pose
        res = StreamResult(
            frame_id=frame_id,
            homography=np.asarray(out.homography.H),
            homography_ok=bool(out.homography.ok),
            num_inliers=int(out.homography.num_inliers),
            num_matches=int(out.num_matches),
            num_keypoints=int(out.num_keypoints),
            rvec=None if pose is None else np.asarray(pose.rvec),
            tvec=None if pose is None else np.asarray(pose.tvec),
            pose_ok=None if pose is None else bool(pose.ok),
            latency_s=time.perf_counter() - t_enq,
        )
        self.times.add("total_latency", res.latency_s)
        return res


def stream_localize(frames, db: DeviceDb, camera: CameraModel,
                    config: PipelineConfig = PipelineConfig(),
                    solve_pose: bool = True):
    """Convenience: run the streaming localizer over an iterable and
    return (results, stage_times)."""
    s = StreamingLocalizer(db, camera, config, solve_pose)
    results = list(s.run(frames))
    return results, s.times
