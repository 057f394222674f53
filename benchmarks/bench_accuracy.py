"""Ground-truth accuracy harness — THE mission metric.

Renders camera frames with KNOWN pose (K, R, t in ECEF) from a
synthetic mosaic + DEM (utils/synthetic.py), runs the full
preprocess→localize pipeline, and reports the end-task numbers the
reference never measures (its pose solvers stop at rvec/tvec,
homographier mod.rs:320-369; README.md:1-2 states the mission):

  * attitude error (degrees, geodesic angle vs the true camera rotation)
  * position error (meters, ECEF camera-center distance)
  * homography-only ground-footprint error (meters)

across nadir / oblique / rotated / noisy / illumination-shifted
conditions, for the exact (default) and optionally fast/hybrid
descriptor modes, each evaluated self-consistently (DB and frame built
with the same mode).

Run: python benchmarks/bench_accuracy.py [n_scenes_per_cond] [modes...]
  e.g. python benchmarks/bench_accuracy.py 12 exact fast hybrid
Prints a readable table to stderr and ONE JSON line to stdout.
Works on CPU (set JAX_PLATFORMS=cpu) or TPU.
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CONDITIONS = {
    # name: (camera kwargs, render kwargs)
    "nominal": ({}, {}),
    "oblique10": (dict(off_nadir_deg=10.0, azimuth_deg=30.0), {}),
    "oblique20": (dict(off_nadir_deg=20.0, azimuth_deg=-60.0), {}),
    "rot45": (dict(yaw_deg=45.0), {}),
    "noise": ({}, dict(noise_sigma=0.03)),
    "illum": ({}, dict(gain=0.75, gamma=1.3)),
    "combo": (dict(off_nadir_deg=10.0, yaw_deg=20.0),
              dict(noise_sigma=0.02, gain=0.85)),
}

ALTITUDE = 1500.0   # m — frame GSD ≈ mosaic GSD (1 m) at focal 1500 px
MOSAIC = 1024
FRAME = 512


def mode_config(mode: str, capacity: int = 2048):
    from cubesat_apds_tpu.core.config import (
        AkazeConfig, MatchConfig, PipelineConfig, PnPConfig, RansacConfig)

    kw = {
        "exact": dict(descriptor_mode="exact", orientation_mode="exact"),
        "fast": dict(descriptor_mode="fast", orientation_mode="fast"),
        "hybrid": dict(descriptor_mode="hybrid", orientation_mode="exact"),
    }[mode]
    return PipelineConfig(
        akaze=AkazeConfig(capacity=capacity, **kw),
        match=MatchConfig(ratio=0.75),
        ransac=RansacConfig(num_hypotheses=256),
        pnp=PnPConfig(num_hypotheses=64))


def build_world(seed: int = 2026):
    """Mosaic + plane DEM + MosaicDataset (one world for every mode)."""
    from cubesat_apds_tpu.io.mosaic import MosaicDataset
    from cubesat_apds_tpu.utils import synthetic as S

    rng = np.random.default_rng(seed)
    plane = S.PlaneDem(h0=120.0, gu=0.02, gv=-0.01)
    mosaic = S.make_mosaic(rng, size=MOSAIC)
    dem = S.make_dem(plane, MOSAIC)
    ds = MosaicDataset([mosaic])
    ds.set_elevation_dataset(dem)
    return mosaic, plane, ds


def run(n_scenes: int = 12, modes=("exact",), seed: int = 2026,
        progress=lambda s: print(s, file=sys.stderr)):
    import jax.numpy as jnp

    from cubesat_apds_tpu.core.types import CameraModel
    from cubesat_apds_tpu.pipelines.localize import Localizer
    from cubesat_apds_tpu.pipelines.preprocess import preprocess
    from cubesat_apds_tpu.utils import synthetic as S

    mosaic, plane, ds = build_world(seed)
    gray = mosaic.bands[0] / 255.0
    results: dict = {}

    for mode in modes:
        cfg = mode_config(mode)
        progress(f"[{mode}] building DB (preprocess)...")
        store, _stats = preprocess(ds, config=cfg, amount_lod=1)
        results[mode] = {}
        loc = None  # one cached-DB Localizer per mode (built lazily
        # below so the CameraModel exists; K is identical across scenes)

        for cond, (cam_kw, rend_kw) in CONDITIONS.items():
            rng = np.random.default_rng(hash((seed, cond)) % 2**32)
            rows = []
            for si in range(n_scenes):
                # Vary the look-at point so every scene sees a different
                # window; keep the footprint inside the mosaic.
                tx, ty = rng.uniform(360, MOSAIC - 360, 2)
                cam = S.make_camera(
                    mosaic.geotransform, plane, target_px=(tx, ty),
                    altitude_m=ALTITUDE, focal_px=1500.0, frame=FRAME,
                    **cam_kw)
                frame, H_true = S.render_frame(
                    gray, mosaic.geotransform, plane, cam, rng=rng,
                    **rend_kw)
                camera = CameraModel(K=jnp.asarray(cam.K, jnp.float32),
                                     dist=jnp.zeros(5, jnp.float32))
                if loc is None:
                    loc = Localizer(store, camera, cfg)
                res = loc.localize(frame, solve_pose=True)
                ok = bool(res.pose.ok) and bool(res.homography.ok)
                att, pos = S.pose_errors(np.asarray(res.pose.rvec),
                                         np.asarray(res.pose.tvec), cam)
                fp = S.footprint_error_m(
                    np.asarray(res.homography.H, np.float64), H_true, cam)
                rows.append(dict(
                    ok=ok, att=att, pos=pos, fp=fp,
                    inl=int(res.homography.num_inliers),
                    pnp_inl=int(res.pose.num_inliers)))
            att = np.array([r["att"] for r in rows if r["ok"]])
            pos = np.array([r["pos"] for r in rows if r["ok"]])
            fp = np.array([r["fp"] for r in rows if r["ok"]])
            ok_rate = np.mean([r["ok"] for r in rows])
            agg = dict(
                ok_rate=round(float(ok_rate), 4),
                att_med=round(float(np.median(att)), 4) if len(att) else None,
                att_p90=round(float(np.percentile(att, 90)), 4)
                if len(att) else None,
                pos_med=round(float(np.median(pos)), 2) if len(pos) else None,
                pos_p90=round(float(np.percentile(pos, 90)), 2)
                if len(pos) else None,
                fp_med=round(float(np.median(fp)), 2) if len(fp) else None,
                inl_med=int(np.median([r["inl"] for r in rows])),
            )
            results[mode][cond] = agg
            progress(f"[{mode}] {cond:10s} ok={agg['ok_rate']:.2f} "
                     f"att med/p90 = {agg['att_med']}/{agg['att_p90']} deg  "
                     f"pos med/p90 = {agg['pos_med']}/{agg['pos_p90']} m  "
                     f"fp med = {agg['fp_med']} m  inl={agg['inl_med']}")
    return results


def main(argv):
    import os

    import jax

    # The axon plugin ignores the JAX_PLATFORMS env var (CLAUDE.md);
    # honor it explicitly so `JAX_PLATFORMS=cpu python bench_accuracy.py`
    # runs on CPU as documented.
    want = os.environ.get("JAX_PLATFORMS")
    if want:
        jax.config.update("jax_platforms", want.split(",")[0])
    n = int(argv[1]) if len(argv) > 1 else 12
    modes = tuple(argv[2:]) or ("exact",)
    results = run(n, modes)
    out = {"bench": "accuracy", "n_scenes_per_condition": n,
           "altitude_m": ALTITUDE, "results": results}
    print(json.dumps(out))


if __name__ == "__main__":
    main(sys.argv)
