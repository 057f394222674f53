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
    Keypoints,
    Matches,
    Correspondences,
    PoseSolution,
    HomographyResult,
)
from cubesat_apds_tpu.core.config import (  # noqa: F401
    AkazeConfig,
    MatchConfig,
    RansacConfig,
    PnPConfig,
    MosaicConfig,
    MAX_POINTS,
)
