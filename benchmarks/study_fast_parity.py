"""End-task parity study: fast descriptor/orientation modes vs exact.

VERDICT r1 weak #2: promoting `descriptor_mode="fast"` to default
requires evidence at the END TASK — localization quality, not just
descriptor-bit counts. This study runs N synthetic scenes through the
full localize step (AKAZE → kNN ratio match → RANSAC homography → PnP)
in both configurations and reports:

  * homography success rate + corner reprojection error vs ground truth
    (each scene's frame is a true perspective warp of the DB scene);
  * inlier-set Jaccard agreement between fast and exact;
  * PnP pose agreement (rotation angle / translation) vs ground truth.

Run: python benchmarks/study_fast_parity.py [N]  (default 120 scenes)
Prints one JSON line with the aggregates (and a readable summary to
stderr). Works on CPU (one compile per config, then N executions) or
TPU.
"""

from __future__ import annotations

import json
import sys

import numpy as np


def main(n_scenes: int = 120, modes=("exact", "fast")):
    import jax
    import jax.numpy as jnp

    from cubesat_apds_tpu.core.config import (
        AkazeConfig, MatchConfig, PipelineConfig, PnPConfig, RansacConfig)
    from cubesat_apds_tpu.core.types import CameraModel
    from cubesat_apds_tpu.ops.features.akaze import detect_and_compute
    from cubesat_apds_tpu.ops.warp import apply_homography, warp_perspective
    from cubesat_apds_tpu.pipelines.localize import DeviceDb, localize_frame_jit

    rng = np.random.default_rng(2024)
    N = 512
    camera = CameraModel.ideal(500.0, 500.0, 256.0, 256.0)

    def make_scene():
        img = np.zeros((N, N), np.float32)
        for _ in range(120):
            cy, cx = rng.integers(10, N - 50, 2)
            s = int(rng.integers(8, 40))
            img[cy:cy + s, cx:cx + s] = rng.uniform(0.2, 1.0)
        return img

    def rand_homography():
        # Mild perspective: rotation + scale + translation + projective.
        ang = rng.uniform(-0.15, 0.15)
        s = rng.uniform(0.9, 1.1)
        tx, ty = rng.uniform(-20, 20, 2)
        p = rng.uniform(-2e-5, 2e-5, 2)
        c, si = np.cos(ang) * s, np.sin(ang) * s
        H = np.array([[c, -si, tx], [si, c, ty], [p[0], p[1], 1.0]])
        # Keep the warp centered.
        C = np.array([[1, 0, -N / 2], [0, 1, -N / 2], [0, 0, 1.0]])
        return np.linalg.inv(C) @ H @ C

    def config(mode):
        # EXPLICIT modes on both sides — the package default is the
        # fast descriptor, so "exact" must opt out of it.
        kw = {
            "exact": {"descriptor_mode": "exact",
                      "orientation_mode": "exact"},
            "fast": {"descriptor_mode": "fast", "orientation_mode": "fast"},
            "fastdesc": {"descriptor_mode": "fast",
                         "orientation_mode": "exact"},
            "hybrid": {"descriptor_mode": "hybrid",
                       "orientation_mode": "exact"},
            "hybrid3": {"descriptor_mode": "hybrid",
                        "orientation_mode": "exact",
                        "hybrid_subcells": 3},
            "hybridfast": {"descriptor_mode": "hybrid",
                           "orientation_mode": "fast"},
        }[mode]
        return PipelineConfig(
            akaze=AkazeConfig(capacity=2048, **kw),
            match=MatchConfig(ratio=0.75),
            ransac=RansacConfig(num_hypotheses=256),
            pnp=PnPConfig(num_hypotheses=64))

    cfgs = {m: config(m) for m in modes}
    # Each mode is evaluated SELF-CONSISTENTLY: the DB is extracted with
    # the same config as the frame (deployment builds both sides with
    # one mode; fast-mode cell-mean bits deviate from exact consistently,
    # so cross-mode matching would unfairly penalize fast).

    corners = np.array([[40.0, 40], [N - 40, 40], [40, N - 40],
                        [N - 40, N - 40]], np.float64)

    stats = {m: dict(ok=0, corner_err=[], rot_err=[], t_err=[], pose_ok=0)
             for m in cfgs}
    jaccards = []
    per_scene = []

    for si in range(n_scenes):
        scene = make_scene()
        H_true = rand_homography()
        # frame(x) = scene(H_true^-1 x): warp DB scene into the frame.
        frame = np.asarray(warp_perspective(
            jnp.asarray(scene), jnp.asarray(np.linalg.inv(H_true),
                                            jnp.float32), (N, N)))
        frame = frame + rng.normal(0, 0.01, frame.shape).astype(np.float32)

        inlier_sets = {}
        row = {}
        for mode, cfg in cfgs.items():
            feats = detect_and_compute(jnp.asarray(scene), cfg.akaze)
            desc = np.asarray(feats.descriptors)
            xy = np.asarray(feats.keypoints.xy)
            valid = np.asarray(feats.keypoints.valid)
            # Planar world: DB pixel grid on z=0, 0.1 m/px.
            obj = np.concatenate([xy * 0.1, np.zeros((len(xy), 1))], 1)
            db = DeviceDb(
                descriptors=jnp.asarray(desc), xy=jnp.asarray(xy),
                valid=jnp.asarray(valid),
                obj_points=jnp.asarray(obj.astype(np.float32)),
                has_world=True)
            res = localize_frame_jit(jnp.asarray(frame), db, camera, cfg,
                                     solve_pose=True)
            ok = bool(res.homography.ok)
            H = np.asarray(res.homography.H, np.float64)
            # Recovered H maps frame→DB; ground truth frame→DB = H_true?
            # frame = warp(scene, inv(H_true)) ⇒ scene coords = H_true·frame.
            proj = np.asarray(apply_homography(
                jnp.asarray(H), jnp.asarray(corners.astype(np.float32))))
            proj_t = np.asarray(apply_homography(
                jnp.asarray(H_true), jnp.asarray(corners.astype(np.float32))))
            err = float(np.linalg.norm(proj - proj_t, axis=1).mean())
            stats[mode]["ok"] += int(ok and err < 2.0)
            stats[mode]["corner_err"].append(err)
            inlier_sets[mode] = np.asarray(res.homography.inliers)
            row[mode + "_err"] = err
            if res.pose is not None and bool(res.pose.ok):
                stats[mode]["pose_ok"] += 1
                from cubesat_apds_tpu.ops.geometry.rodrigues import (
                    rodrigues_to_matrix)
                R = np.asarray(rodrigues_to_matrix(res.pose.rvec))
                t = np.asarray(res.pose.tvec)
                # Ground-truth pose: project a few DB world points through
                # H_true into the frame and measure reprojection.
                w_pts = obj[valid][:50]
                db_px = xy[valid][:50]
                f_px = np.asarray(apply_homography(
                    jnp.asarray(np.linalg.inv(H_true)),
                    jnp.asarray(db_px.astype(np.float32))))
                cam_pts = w_pts @ R.T + t
                uvh = cam_pts[:, :2] / cam_pts[:, 2:3]
                K = np.asarray(camera.K)
                px = uvh * [K[0, 0], K[1, 1]] + [K[0, 2], K[1, 2]]
                stats[mode]["t_err"].append(
                    float(np.linalg.norm(px - f_px, axis=1).mean()))
        a, b = inlier_sets[modes[0]], inlier_sets[modes[1]]
        union = (a | b).sum()
        jaccards.append(float((a & b).sum() / union) if union else 1.0)
        per_scene.append(row)

    out = {"n_scenes": n_scenes, "inlier_jaccard_median": float(np.median(jaccards)),
           "inlier_jaccard_p10": float(np.percentile(jaccards, 10))}
    for m in cfgs:
        s = stats[m]
        out[f"{m}_success_rate"] = s["ok"] / n_scenes
        out[f"{m}_corner_err_median_px"] = float(np.median(s["corner_err"]))
        out[f"{m}_corner_err_p90_px"] = float(np.percentile(s["corner_err"], 90))
        out[f"{m}_pose_ok_rate"] = s["pose_ok"] / n_scenes
        if s["t_err"]:
            out[f"{m}_pose_reproj_median_px"] = float(np.median(s["t_err"]))
    print(json.dumps(out))
    m0, m1 = modes
    print(f"{m0}: success {out[m0 + '_success_rate']:.3f} "
          f"corner_med {out[m0 + '_corner_err_median_px']:.3f}px | "
          f"{m1}: success {out[m1 + '_success_rate']:.3f} "
          f"corner_med {out[m1 + '_corner_err_median_px']:.3f}px | "
          f"jaccard_med {out['inlier_jaccard_median']:.3f}", file=sys.stderr)


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 120
    modes = tuple(sys.argv[2].split(",")) if len(sys.argv) > 2 else ("exact", "fast")
    main(n, modes)
