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
with the same mode) — and, with --terrain, over NON-PLANAR fractal
terrain (per-pixel ray–DEM rendering) at several relief magnitudes,
where the homography model degrades with parallax while 2D–3D PnP
holds (the regime the elevation subsystem exists for; reference
feature_database/src/elevationdb.rs:64-104).

Run: python benchmarks/bench_accuracy.py [n_scenes_per_cond] [modes...]
         [--texture rects|natural|both] [--terrain]
  e.g. python benchmarks/bench_accuracy.py 12 exact fast hybrid --terrain
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


def _cond_rng(seed: int, cond: str, extra: int = 0):
    """Process-STABLE per-condition RNG. Python's hash() of strings is
    randomized per process (PYTHONHASHSEED), which silently made every
    bench run sample different scenes — a result could never be
    reproduced for debugging. crc32 is stable everywhere."""
    import zlib

    return np.random.default_rng(
        (zlib.crc32(cond.encode()) ^ (seed * 2654435761) ^ extra)
        % 2**32)


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
        pnp=PnPConfig(num_hypotheses=128))


def build_world(seed: int = 2026, texture: str = "rects"):
    """Mosaic + plane DEM + MosaicDataset (one world for every mode)."""
    from cubesat_apds_tpu.io.mosaic import MosaicDataset
    from cubesat_apds_tpu.utils import synthetic as S

    rng = np.random.default_rng(seed)
    plane = S.PlaneDem(h0=120.0, gu=0.02, gv=-0.01)
    mosaic = S.make_mosaic(rng, size=MOSAIC, texture=texture)
    dem = S.make_dem(plane, MOSAIC)
    ds = MosaicDataset([mosaic])
    ds.set_elevation_dataset(dem)
    return mosaic, plane, ds


def build_terrain_world(seed: int, relief_m: float,
                        texture: str = "rects"):
    """Mosaic + fractal heightfield DEM + MosaicDataset. The store's
    raster DEM samples the same continuous surface at 256² (its floor-
    quantization is part of the measured error budget, exactly as the
    reference's single-pixel elevation reads are)."""
    from cubesat_apds_tpu.io.mosaic import MosaicDataset
    from cubesat_apds_tpu.utils import synthetic as S

    rng = np.random.default_rng(seed)
    mosaic = S.make_mosaic(rng, size=MOSAIC, texture=texture)
    dem = S.make_fractal_dem(rng, MOSAIC, relief_m=relief_m)
    dem_raster = S.make_dem(dem, MOSAIC, dem_size=256)
    ds = MosaicDataset([mosaic])
    ds.set_elevation_dataset(dem_raster)
    return mosaic, dem, ds


def run(n_scenes: int = 12, modes=("exact",), seed: int = 2026,
        texture: str = "rects",
        progress=lambda s: print(s, file=sys.stderr)):
    import jax.numpy as jnp

    from cubesat_apds_tpu.core.types import CameraModel
    from cubesat_apds_tpu.pipelines.localize import Localizer
    from cubesat_apds_tpu.pipelines.preprocess import preprocess
    from cubesat_apds_tpu.utils import synthetic as S

    mosaic, plane, ds = build_world(seed, texture)
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
            rng = _cond_rng(seed, cond)
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


TERRAIN_RELIEFS = (20.0, 60.0, 120.0)
TERRAIN_CONDITIONS = {
    "nadir": {},
    "oblique20": dict(off_nadir_deg=20.0, azimuth_deg=-60.0),
}


def run_terrain(n_scenes: int = 6, modes=("exact",), seed: int = 2026,
                texture: str = "rects", reliefs=TERRAIN_RELIEFS,
                progress=lambda s: print(s, file=sys.stderr)):
    """Relief sweep: PnP attitude/position error over non-planar
    terrain, with the homography ground-footprint error alongside —
    the homography model is WRONG over relief (parallax) and its
    footprint error should grow with relief while PnP holds."""
    import jax.numpy as jnp

    from cubesat_apds_tpu.core.types import CameraModel
    from cubesat_apds_tpu.pipelines.localize import Localizer
    from cubesat_apds_tpu.pipelines.preprocess import preprocess
    from cubesat_apds_tpu.utils import synthetic as S

    out: dict = {}
    for relief in reliefs:
        mosaic, dem, ds = build_terrain_world(seed, relief, texture)
        gray = mosaic.bands[0] / 255.0
        out[f"relief{int(relief)}"] = {}
        for mode in modes:
            cfg = mode_config(mode)
            progress(f"[terrain {relief:.0f} m] [{mode}] preprocess...")
            store, _stats = preprocess(ds, config=cfg, amount_lod=1)
            loc = None
            for cond, cam_kw in TERRAIN_CONDITIONS.items():
                rng = _cond_rng(seed, cond, int(relief))
                rows = []
                for _si in range(n_scenes):
                    tx, ty = rng.uniform(360, MOSAIC - 360, 2)
                    cam = S.make_camera(
                        mosaic.geotransform, dem, target_px=(tx, ty),
                        altitude_m=ALTITUDE, focal_px=1500.0,
                        frame=FRAME, **cam_kw)
                    frame = S.render_frame_terrain(
                        gray, mosaic.geotransform, dem, cam, rng=rng)
                    camera = CameraModel(
                        K=jnp.asarray(cam.K, jnp.float32),
                        dist=jnp.zeros(5, jnp.float32))
                    if loc is None:
                        loc = Localizer(store, camera, cfg)
                    res = loc.localize(frame, solve_pose=True)
                    ok = bool(res.pose.ok)
                    att, pos = S.pose_errors(
                        np.asarray(res.pose.rvec),
                        np.asarray(res.pose.tvec), cam)
                    fp = S.footprint_error_terrain_m(
                        np.asarray(res.homography.H, np.float64), cam,
                        mosaic.geotransform, dem) \
                        if bool(res.homography.ok) else None
                    rows.append(dict(ok=ok, att=att, pos=pos, fp=fp,
                                     inl=int(res.homography.num_inliers),
                                     pnp_inl=int(res.pose.num_inliers)))
                att = np.array([r["att"] for r in rows if r["ok"]])
                pos = np.array([r["pos"] for r in rows if r["ok"]])
                fp = np.array([r["fp"] for r in rows
                               if r["fp"] is not None])
                agg = dict(
                    ok_rate=round(float(np.mean([r["ok"]
                                                 for r in rows])), 4),
                    att_med=round(float(np.median(att)), 4)
                    if len(att) else None,
                    att_p90=round(float(np.percentile(att, 90)), 4)
                    if len(att) else None,
                    pos_med=round(float(np.median(pos)), 2)
                    if len(pos) else None,
                    pos_p90=round(float(np.percentile(pos, 90)), 2)
                    if len(pos) else None,
                    fp_med=round(float(np.median(fp)), 2)
                    if len(fp) else None,
                    pnp_inl_med=int(np.median([r["pnp_inl"]
                                               for r in rows])),
                )
                out[f"relief{int(relief)}"].setdefault(mode, {})[cond] = agg
                progress(f"[terrain {relief:.0f} m] [{mode}] {cond:10s} "
                         f"ok={agg['ok_rate']:.2f} att med/p90 = "
                         f"{agg['att_med']}/{agg['att_p90']} deg  pos "
                         f"med/p90 = {agg['pos_med']}/{agg['pos_p90']} m  "
                         f"homography fp med = {agg['fp_med']} m")
    return out


def main(argv):
    import os

    import jax

    # The axon plugin ignores the JAX_PLATFORMS env var (CLAUDE.md);
    # honor it explicitly so `JAX_PLATFORMS=cpu python bench_accuracy.py`
    # runs on CPU as documented.
    want = os.environ.get("JAX_PLATFORMS")
    if want:
        jax.config.update("jax_platforms", want.split(",")[0])
    args = list(argv[1:])
    texture = "rects"
    terrain = False
    if "--terrain" in args:
        terrain = True
        args.remove("--terrain")
    if "--texture" in args:
        i = args.index("--texture")
        texture = args[i + 1]
        del args[i:i + 2]
    n = int(args[0]) if args else 12
    modes = tuple(args[1:]) or ("exact",)
    textures = ("rects", "natural") if texture == "both" else (texture,)
    results = {}
    for tex in textures:
        r = run(n, modes, texture=tex)
        results[tex] = r
    out = {"bench": "accuracy", "n_scenes_per_condition": n,
           "altitude_m": ALTITUDE,
           "results": results[textures[0]] if len(textures) == 1
           else results,
           "textures": list(textures)}
    if terrain:
        out["terrain"] = run_terrain(max(n // 2, 3), modes,
                                     texture=texture
                                     if texture != "both" else "rects")
    print(json.dumps(out))


if __name__ == "__main__":
    main(sys.argv)
