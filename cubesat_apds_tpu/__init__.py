"""cubesat_apds_tpu — TPU-native attitude determination through image recognition.

A ground-up JAX/XLA/Pallas re-design of the capabilities of
Murmeldyret/cubesat-APDS ("DUNK"): offline GeoTIFF → feature-database
construction, online frame → match → pose localization, and camera
calibration — built TPU-first (static shapes, batched kernels, device
meshes) rather than as a port of the reference's Rust/OpenCV/GDAL stack.

Layer map (mirrors SURVEY.md §7):
  core/       typed pytrees, configs, camera model, geodesy
  ops/        device compute: image ops, AKAZE features, matching, geometry
  ops/pallas/ hand-written TPU kernels for the hot paths
  parallel/   device-mesh sharding (descriptor-DB tensor parallelism, batch DP)
  store/      the feature_database replacement (array-backed, LoD + spatial grid)
  io/         host-side GeoTIFF decode + mosaic index
  pipelines/  preprocess (DB build), localize (frame→pose), calibrate
"""

__version__ = "0.1.0"

from cubesat_apds_tpu.core.types import (  # noqa: F401
    CameraModel,
    Keypoints,
    Matches,
    Correspondences,
    PoseSolution,
    HomographyResult,
)
from cubesat_apds_tpu.core.config import (  # noqa: F401
    AkazeConfig,
    MatchConfig,
    PipelineConfig,
    RansacConfig,
    PnPConfig,
    MosaicConfig,
    MAX_POINTS,
)

# The functional surface, lazily resolved (PEP 562) so `import
# cubesat_apds_tpu` stays cheap — ops/pipeline modules trigger kernel
# definitions and are only pulled when first touched.
_LAZY = {
    "detect_and_compute": "cubesat_apds_tpu.ops.features.akaze",
    "detect_and_compute_batch": "cubesat_apds_tpu.ops.features.akaze",
    "detect_and_compute_tiled": "cubesat_apds_tpu.ops.features.akaze",
    "knn_match": "cubesat_apds_tpu.ops.match",
    "crosscheck_match": "cubesat_apds_tpu.ops.match",
    "find_homography_ransac": "cubesat_apds_tpu.ops.geometry.homography",
    "solve_pnp_ransac": "cubesat_apds_tpu.ops.geometry.pnp",
    "warp_perspective": "cubesat_apds_tpu.ops.warp",
    "FeatureStore": "cubesat_apds_tpu.store.feature_store",
    "BinaryFeatureStore": "cubesat_apds_tpu.store.binary_store",
    "MosaicDataset": "cubesat_apds_tpu.io.mosaic",
    "preprocess": "cubesat_apds_tpu.pipelines.preprocess",
    "Localizer": "cubesat_apds_tpu.pipelines.localize",
    "localize_frame": "cubesat_apds_tpu.pipelines.localize",
    "localize_frame_jit": "cubesat_apds_tpu.pipelines.localize",
    "localize_coarse_to_fine": "cubesat_apds_tpu.pipelines.localize",
    "load_device_db": "cubesat_apds_tpu.pipelines.localize",
    "StreamingLocalizer": "cubesat_apds_tpu.pipelines.stream",
    "calibrate_camera": "cubesat_apds_tpu.pipelines.calibrate",
    "make_mesh": "cubesat_apds_tpu.parallel.mesh",
}


def __getattr__(name):
    target = _LAZY.get(name)
    if target is None:
        raise AttributeError(
            f"module {__name__!r} has no attribute {name!r}")
    import importlib

    value = getattr(importlib.import_module(target), name)
    globals()[name] = value
    return value


def __dir__():
    return sorted(set(globals()) | set(_LAZY))
