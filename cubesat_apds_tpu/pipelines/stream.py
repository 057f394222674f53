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
import functools
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


@functools.partial(jax.jit, static_argnames=("config", "solve_pose"))
def _localize_packed(frame, db, camera, config, solve_pose):
    """Localize and PACK every scalar output into one [22] f32 vector.

    One device array = ONE host fetch per frame; fetching the result
    pytree field-by-field costs a round trip per leaf (which dominates
    sustained throughput on remote-attached TPUs).
    """
    if frame.dtype == jnp.uint8:
        frame = frame.astype(jnp.float32) / 255.0
    r = localize_frame_jit(frame, db, camera, config, solve_pose)
    pose = r.pose
    tail = [
        jnp.asarray([r.homography.ok], jnp.float32),
        jnp.asarray([r.homography.num_inliers], jnp.float32),
        jnp.asarray([r.num_matches], jnp.float32),
        jnp.asarray([r.num_keypoints], jnp.float32),
    ]
    if pose is not None:
        tail += [pose.rvec, pose.tvec,
                 jnp.asarray([pose.ok], jnp.float32),
                 jnp.asarray([pose.num_inliers], jnp.float32)]
    else:
        tail += [jnp.zeros(3), jnp.zeros(3), jnp.zeros(1), jnp.zeros(1)]
    return jnp.concatenate([r.homography.H.reshape(-1).astype(jnp.float32)]
                           + [t.astype(jnp.float32) for t in tail])


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
                 solve_pose: bool = True, prefetch: int = 2,
                 transfer_uint8: bool = True):
        self.db = db
        self.camera = camera
        self.config = config
        self.solve_pose = solve_pose
        self.prefetch = max(prefetch, 1)
        # Camera frames are uint8; shipping them as such quarters the
        # host→device traffic (float conversion happens on device).
        self.transfer_uint8 = transfer_uint8
        self.times = StageTimes()

    def _device_step(self, frame_dev):
        return _localize_packed(frame_dev, self.db, self.camera,
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
        producer_error: list = []

        def producer():
            # The sentinel is ALWAYS enqueued (even on producer failure),
            # so the consumer can't block forever; the exception is
            # stashed and re-raised on the consumer side.
            try:
                for i, f in enumerate(frames):
                    t0 = time.perf_counter()
                    if preprocess is not None:
                        f = preprocess(f)
                    f = np.asarray(f)
                    if self.transfer_uint8 and f.dtype != np.uint8:
                        f = np.clip(f * 255.0, 0, 255).astype(np.uint8)
                    arr = jnp.asarray(f)
                    # device_put happens lazily at dispatch; timing the
                    # host side only here.
                    self.times.add("host_preprocess",
                                   time.perf_counter() - t0)
                    q.put((i, arr, time.perf_counter()))
            except BaseException as e:  # noqa: BLE001 — re-raised below
                producer_error.append(e)
            finally:
                q.put(SENTINEL)

        threading.Thread(target=producer, daemon=True).start()

        in_flight = []  # [(frame_id, t_submit, result_pytree)]
        while True:
            item = q.get()
            if item is SENTINEL:
                if producer_error:
                    raise producer_error[0]
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
        packed = np.asarray(out)            # single D2H fetch
        self.times.add("device_wait", time.perf_counter() - t0)
        res = StreamResult(
            frame_id=frame_id,
            homography=packed[:9].reshape(3, 3),
            homography_ok=bool(packed[9] > 0),
            num_inliers=int(packed[10]),
            num_matches=int(packed[11]),
            num_keypoints=int(packed[12]),
            rvec=(packed[13:16] if self.solve_pose else None),
            tvec=(packed[16:19] if self.solve_pose else None),
            pose_ok=(bool(packed[19] > 0) if self.solve_pose else None),
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
