"""CLI end-to-end tests (the clap-binary surface, preprocessor
main.rs:22-66 + calibrator main.rs:12-25 + the new localize command)."""

import json
import os

import numpy as np
import pytest

from cubesat_apds_tpu.cli import main
from cubesat_apds_tpu.io.tiff import write_geotiff


@pytest.fixture
def scene(tmp_path, rng):
    img = np.zeros((128, 128), np.float32)
    for _ in range(25):
        cy, cx = rng.integers(5, 100, 2)
        s = int(rng.integers(8, 20))
        img[cy:cy + s, cx:cx + s] = rng.uniform(0.3, 1.0)
    rgb8 = (np.stack([img] * 3, -1) * 255).astype(np.uint8)
    d = tmp_path / "tiles"
    d.mkdir()
    write_geotiff(str(d / "t.tif"), rgb8, [10.0, 0.001, 0, 56.0, 0, -0.001])
    return tmp_path, d, img


def test_cli_preprocess_and_localize(scene, capsys):
    tmp_path, tiles, img = scene
    store_dir = str(tmp_path / "store")
    rc = main(["preprocess", "--dataset", str(tiles), "--store", store_dir,
               "--lod", "1"])
    assert rc == 0
    assert os.path.exists(os.path.join(store_dir, "manifest.json"))

    from PIL import Image

    frame_path = str(tmp_path / "frame.png")
    Image.fromarray((img * 255).astype(np.uint8)).save(frame_path)
    rc = main(["localize", "--store", store_dir, "--frame", frame_path])
    assert rc == 0
    captured = capsys.readouterr().out
    out = json.loads(captured[captured.index("{"):])
    assert out["keypoints"] > 0


def test_cli_preprocess_binary_and_localize(scene, capsys):
    tmp_path, tiles, img = scene
    store_dir = str(tmp_path / "bstore")
    rc = main(["preprocess", "--dataset", str(tiles), "--store", store_dir,
               "--lod", "1", "--binary"])
    assert rc == 0
    assert os.path.exists(os.path.join(store_dir, "order.npy"))

    from PIL import Image

    frame_path = str(tmp_path / "frame.png")
    Image.fromarray((img * 255).astype(np.uint8)).save(frame_path)
    rc = main(["localize", "--store", store_dir, "--frame", frame_path])
    assert rc == 0
    captured = capsys.readouterr().out
    start = captured.index("{")
    out = json.loads(captured[start:])
    assert out["matches"] >= 0 and "homography" in out


def test_cli_calculate_lod(scene, capsys):
    tmp_path, tiles, _ = scene
    rc = main(["preprocess", "--dataset", str(tiles),
               "--store", str(tmp_path / "s"), "--calculate-lod"])
    assert rc == 0
    assert "LoD levels" in capsys.readouterr().out


def test_cli_calibrate(tmp_path, capsys):
    from PIL import Image

    nx, ny, cell = 7, 6, 24
    img = np.full((240, 320), 0.9, np.float32)
    for r in range(ny + 1):
        for c in range(nx + 1):
            shade = 0.1 if (r + c) % 2 == 0 else 0.9
            img[6 + r * cell:6 + (r + 1) * cell,
                16 + c * cell:16 + (c + 1) * cell] = shade
    d = tmp_path / "boards"
    d.mkdir()
    for i in range(10):
        Image.fromarray((img * 255).astype(np.uint8)).save(
            str(d / f"b{i}.png"))
    out_json = str(tmp_path / "cam.json")
    rc = main(["calibrate", str(d), "7x6", "-o", out_json])
    assert rc == 0
    cap = capsys.readouterr().out
    assert "Camera matrix" in cap and "RMS" in cap
    with open(out_json) as f:
        cam = json.load(f)
    assert len(cam["K"]) == 3


def test_cli_localize_multi_frame(scene, capsys):
    """Multiple --frame args share one cached device DB (Localizer);
    output is a JSON list with one record per frame."""
    tmp_path, tiles, img = scene
    store_dir = str(tmp_path / "mstore")
    rc = main(["preprocess", "--dataset", str(tiles), "--store", store_dir,
               "--lod", "1"])
    assert rc == 0

    from PIL import Image

    f1 = str(tmp_path / "f1.png")
    f2 = str(tmp_path / "f2.png")
    Image.fromarray((img * 255).astype(np.uint8)).save(f1)
    Image.fromarray((np.roll(img, 3, axis=1) * 255).astype(np.uint8)).save(f2)
    rc = main(["localize", "--store", store_dir, "--frame", f1, f2])
    assert rc == 0
    captured = capsys.readouterr().out
    out = json.loads(captured[captured.index("["):])
    assert isinstance(out, list) and len(out) == 2
    assert out[0]["frame"] == f1 and out[1]["frame"] == f2
    assert out[0]["keypoints"] > 0


def test_cli_preprocess_append_segment(scene, capsys, rng):
    """--binary --append lands a second tile folder as a new segment of
    the existing store; localize sees the union."""
    tmp_path, tiles, img = scene
    store_dir = str(tmp_path / "storeap")
    rc = main(["preprocess", "--dataset", str(tiles), "--store", store_dir,
               "--lod", "1", "--binary"])
    assert rc == 0

    # A second capture of the SAME mosaic frame (same geotransform,
    # fresh content) — the supported append case.
    img2 = np.roll(img, 31, axis=1)
    rgb8 = (np.stack([img2] * 3, -1) * 255).astype(np.uint8)
    d2 = tmp_path / "tiles2"
    d2.mkdir()
    write_geotiff(str(d2 / "t.tif"), rgb8, [10.0, 0.001, 0, 56.0, 0, -0.001])
    rc = main(["preprocess", "--dataset", str(d2), "--store", store_dir,
               "--lod", "1", "--binary", "--append"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "appended to" in out

    from cubesat_apds_tpu.store.binary_store import BinaryFeatureStore

    b = BinaryFeatureStore(store_dir)
    assert len(b.manifest["segments"]) == 2
    assert len(b.images) == 2
    # Both segments' keypoints are reachable, response-ordered.
    c, d = b.read_keypoints_from_lod(0)
    assert set(np.unique(c["image_id"])) == {1, 2}
    assert (np.diff(c["response"]) <= 0).all()

    # --append without --binary refuses; --append on a missing store too.
    with pytest.raises(SystemExit):
        main(["preprocess", "--dataset", str(d2),
              "--store", store_dir, "--lod", "1", "--append"])
    with pytest.raises(SystemExit):
        main(["preprocess", "--dataset", str(d2),
              "--store", str(tmp_path / "nope"), "--lod", "1",
              "--binary", "--append"])
    # Pre-flight: an append whose explicit mode conflicts with the
    # store's recorded provenance refuses BEFORE extracting anything
    # (previously every precondition was checked only at save time,
    # after the full run).
    with pytest.raises(SystemExit, match="descriptor_mode"):
        main(["preprocess", "--dataset", str(d2), "--store", store_dir,
              "--lod", "1", "--binary", "--append",
              "--descriptor-mode", "fast"])


def test_cli_missing_store_usage_error(tmp_path):
    """localize/stream/store against a nonexistent store path exit with
    a usage message, not a raw FileNotFoundError traceback."""
    nope = str(tmp_path / "nope")
    dummy = str(tmp_path / "x.png")     # must exist: stream checks frame
    open(dummy, "w").close()            # paths before the store
    for argv in (["localize", "--store", nope, "--frame", dummy],
                 ["stream", "--store", nope, "--frames", dummy],
                 ["store", "info", nope]):
        with pytest.raises(SystemExit, match="no feature store"):
            main(argv)


def test_cli_descriptor_tag_grammar():
    """Malformed --descriptor-mode tags exit with a usage message, not a
    raw traceback — including hybridN with N < 2, which used to escape
    as AkazeConfig's ValueError."""
    from cubesat_apds_tpu.cli import _akaze_from_tag

    for bad in ("hybridx", "fastt", "hybrid1", "hybrid0"):
        with pytest.raises(SystemExit):
            _akaze_from_tag(bad)
    assert _akaze_from_tag("hybrid3").hybrid_subcells == 3


def test_cli_stream(scene, capsys):
    """`stream` runs the micro-batched StreamingLocalizer over a frame
    directory and prints one JSONL record per frame plus a summary."""
    tmp_path, tiles, img = scene
    store_dir = str(tmp_path / "sstore")
    rc = main(["preprocess", "--dataset", str(tiles), "--store", store_dir,
               "--lod", "1"])
    assert rc == 0

    from PIL import Image

    frames_dir = tmp_path / "frames"
    frames_dir.mkdir()
    names = []
    for i in range(3):
        p = str(frames_dir / f"f{i}.png")
        Image.fromarray(
            (np.roll(img, i * 2, axis=1) * 255).astype(np.uint8)).save(p)
        names.append(p)
    rc = main(["stream", "--store", store_dir, "--frames", str(frames_dir),
               "--batch", "2"])
    assert rc == 0
    lines = [json.loads(l) for l in
             capsys.readouterr().out.strip().splitlines() if l.startswith("{")]
    recs = [l for l in lines if "frame" in l]
    assert [r["frame"] for r in recs] == names     # sorted order preserved
    assert all(r["keypoints"] > 0 for r in recs)
    summary = lines[-1]["summary"]
    assert summary["frames"] == 3 and summary["batch"] == 2
    assert summary["sustained_fps"] > 0

    # Mismatched frame shapes refuse cleanly (one compiled step).
    bad = str(frames_dir / "zz_bad.png")
    Image.fromarray((img[:64, :64] * 255).astype(np.uint8)).save(bad)
    with pytest.raises(SystemExit):
        main(["stream", "--store", store_dir, "--frames", str(frames_dir)])

    # No frames found refuses cleanly.
    with pytest.raises(SystemExit):
        main(["stream", "--store", store_dir,
              "--frames", str(tmp_path / "empty_glob_*.png")])


def test_cli_localize_coarse_to_fine(scene, capsys):
    """--coarse-to-fine runs the two-stage LoD path through the CLI:
    coarse fix at the top of the pyramid, windowed LoD-0 fine match."""
    tmp_path, tiles, img = scene
    store_dir = str(tmp_path / "c2fstore")
    rc = main(["preprocess", "--dataset", str(tiles), "--store", store_dir,
               "--lod", "2"])
    assert rc == 0

    from PIL import Image

    frame_path = str(tmp_path / "frame.png")
    Image.fromarray((img * 255).astype(np.uint8)).save(frame_path)
    rc = main(["localize", "--store", store_dir, "--frame", frame_path,
               "--coarse-to-fine"])
    assert rc == 0
    captured = capsys.readouterr().out
    out = json.loads(captured[captured.index("{"):])
    assert "coarse_ok" in out and "window" in out
    assert out["keypoints"] > 0
    if out["coarse_ok"]:
        assert out["window"] is not None and len(out["window"]) == 4


def test_cli_localize_pruned(scene, capsys):
    """--pruned serves through the device-side CSR spatial window
    (keypointdb.rs:67-90 at serving scale) and agrees with the plain
    full-DB localize."""
    tmp_path, tiles, img = scene
    store_dir = str(tmp_path / "prstore")
    rc = main(["preprocess", "--dataset", str(tiles), "--store", store_dir,
               "--lod", "2"])
    assert rc == 0

    from PIL import Image

    frame_path = str(tmp_path / "frame.png")
    Image.fromarray((img * 255).astype(np.uint8)).save(frame_path)
    rc = main(["localize", "--store", store_dir, "--frame", frame_path])
    full = json.loads(_last_json(capsys))
    rc = main(["localize", "--store", store_dir, "--frame", frame_path,
               "--pruned"])
    assert rc == 0
    out = json.loads(_last_json(capsys))
    assert out["pruned"]["coarse_ok"]
    assert len(out["pruned"]["window"]) == 4
    assert out["keypoints"] == full["keypoints"]
    if full["homography_ok"] and out["homography_ok"]:
        np.testing.assert_allclose(out["homography"], full["homography"],
                                   atol=0.5)
    # The two pruning strategies are exclusive.
    with pytest.raises(SystemExit):
        main(["localize", "--store", store_dir, "--frame", frame_path,
              "--pruned", "--coarse-to-fine"])


def _last_json(capsys):
    captured = capsys.readouterr().out
    return captured[captured.index("{"):]


def test_cli_stream_pruned(scene, capsys):
    """`stream --pruned` composes the pruned step with micro-batching;
    summary reports the fallback count; --mesh is refused."""
    tmp_path, tiles, img = scene
    store_dir = str(tmp_path / "prsstore")
    rc = main(["preprocess", "--dataset", str(tiles), "--store", store_dir,
               "--lod", "2"])
    assert rc == 0

    from PIL import Image

    frames_dir = tmp_path / "prframes"
    frames_dir.mkdir()
    names = []
    for i in range(3):
        p = str(frames_dir / f"f{i}.png")
        Image.fromarray(
            (np.roll(img, i * 2, axis=1) * 255).astype(np.uint8)).save(p)
        names.append(p)
    rc = main(["stream", "--store", store_dir, "--frames", str(frames_dir),
               "--batch", "2", "--pruned"])
    assert rc == 0
    lines = [json.loads(l) for l in
             capsys.readouterr().out.strip().splitlines()
             if l.startswith("{")]
    recs = [l for l in lines if "frame" in l]
    assert [r["frame"] for r in recs] == names
    assert all(r["keypoints"] > 0 for r in recs)
    summary = lines[-1]["summary"]
    assert summary["frames"] == 3 and summary["pruned"] is True
    assert "fallback_frames" in summary

    with pytest.raises(SystemExit):
        main(["stream", "--store", store_dir, "--frames", str(frames_dir),
              "--pruned", "--mesh", "1x2"])


def test_cli_preprocess_devices_mesh(scene, capsys):
    """`-c/--devices N` (the reference preprocessor's --cpu-num
    analogue) shards each tile batch over a dp mesh; the store must be
    identical to the single-device build."""
    tmp_path, tiles, img = scene
    single = str(tmp_path / "dstore1")
    rc = main(["preprocess", "--dataset", str(tiles), "--store", single,
               "--lod", "2", "--tile-batch", "4"])
    assert rc == 0
    sharded = str(tmp_path / "dstore4")
    rc = main(["preprocess", "--dataset", str(tiles), "--store", sharded,
               "--lod", "2", "--tile-batch", "4", "-c", "4"])
    assert rc == 0

    from cubesat_apds_tpu.store.feature_store import FeatureStore

    s1 = FeatureStore.load(single)
    s4 = FeatureStore.load(sharded)
    assert len(s1) == len(s4)
    np.testing.assert_array_equal(s1._desc, s4._desc)


def test_cli_stream_mesh(scene, capsys):
    """`stream --mesh DPxTP` composes the stream with the mesh-parallel
    serving step; records match the single-device stream."""
    tmp_path, tiles, img = scene
    store_dir = str(tmp_path / "smstore")
    rc = main(["preprocess", "--dataset", str(tiles), "--store", store_dir,
               "--lod", "1"])
    assert rc == 0

    from PIL import Image

    frames_dir = tmp_path / "mframes"
    frames_dir.mkdir()
    names = []
    for i in range(4):
        p = str(frames_dir / f"f{i}.png")
        Image.fromarray(
            (np.roll(img, i * 2, axis=1) * 255).astype(np.uint8)).save(p)
        names.append(p)

    def run(argv):
        rc = main(argv)
        assert rc == 0
        lines = [json.loads(l) for l in
                 capsys.readouterr().out.strip().splitlines()
                 if l.startswith("{")]
        return [l for l in lines if "frame" in l], lines[-1]["summary"]

    ref, _ = run(["stream", "--store", store_dir,
                  "--frames", str(frames_dir), "--batch", "2"])
    mesh, summary = run(["stream", "--store", store_dir,
                         "--frames", str(frames_dir), "--batch", "2",
                         "--mesh", "2x4"])
    assert summary["frames"] == 4
    assert [r["frame"] for r in mesh] == names
    for a, b in zip(ref, mesh):
        assert a["keypoints"] == b["keypoints"]
        assert a["matches"] == b["matches"]
        assert a["inliers"] == b["inliers"]

    # Submesh (dp*tp < device count) and default batch=1 both work:
    # batch rounds up to dp and the batched mesh step is used.
    sub, _ = run(["stream", "--store", store_dir,
                  "--frames", str(frames_dir), "--mesh", "2x2"])
    for a, b in zip(ref, sub):
        assert a["inliers"] == b["inliers"]

    # Malformed mesh spec refuses cleanly.
    with pytest.raises(SystemExit):
        main(["stream", "--store", store_dir, "--frames", str(frames_dir),
              "--mesh", "nonsense"])
    # Oversubscribed mesh refuses cleanly.
    with pytest.raises(SystemExit):
        main(["stream", "--store", store_dir, "--frames", str(frames_dir),
              "--mesh", "8x8"])


def test_cli_localize_viz(scene, capsys):
    """--viz writes a keypoint/match/inlier overlay PNG (the CLI
    analogue of the reference's export_matches) and reports the path;
    multi-frame runs get per-frame suffixes."""
    tmp_path, tiles, img = scene
    store_dir = str(tmp_path / "vstore")
    rc = main(["preprocess", "--dataset", str(tiles), "--store", store_dir,
               "--lod", "1"])
    assert rc == 0

    from PIL import Image

    f1 = str(tmp_path / "vf1.png")
    f2 = str(tmp_path / "vf2.png")
    Image.fromarray((img * 255).astype(np.uint8)).save(f1)
    Image.fromarray((np.roll(img, 3, axis=1) * 255).astype(np.uint8)).save(f2)

    viz = str(tmp_path / "viz.png")
    rc = main(["localize", "--store", store_dir, "--frame", f1,
               "--viz", viz])
    assert rc == 0
    out = json.loads((lambda c: c[c.index("{"):])(capsys.readouterr().out))
    assert out["viz"] == viz
    with Image.open(viz) as im:
        assert im.size == (img.shape[1], img.shape[0])

    rc = main(["localize", "--store", store_dir, "--frame", f1, f2,
               "--viz", viz])
    assert rc == 0
    outs = json.loads((lambda c: c[c.index("["):])(capsys.readouterr().out))
    assert [o["viz"] for o in outs] == [str(tmp_path / "viz_0.png"),
                                        str(tmp_path / "viz_1.png")]
    assert all(os.path.exists(o["viz"]) for o in outs)


def test_cli_match(scene, capsys, tmp_path):
    """`match` runs two images through kNN-ratio (and crosscheck)
    matching and can export the side-by-side visualization — the CLI
    form of the reference's get_knn_matches/get_bruteforce_matches/
    export_matches (feature_extraction/src/lib.rs:94-155)."""
    _, _, img = scene
    from PIL import Image

    f1 = str(tmp_path / "m1.png")
    f2 = str(tmp_path / "m2.png")
    Image.fromarray((img * 255).astype(np.uint8)).save(f1)
    Image.fromarray((np.roll(img, 4, axis=1) * 255).astype(np.uint8)).save(f2)
    viz = str(tmp_path / "matches.png")

    rc = main(["match", f1, f2, "--ratio", "0.7", "-o", viz])
    assert rc == 0
    out = json.loads(capsys.readouterr().out)
    assert out["matches"] > 0 and out["keypoints"][0] > 0
    with Image.open(viz) as im:
        assert im.size == (2 * img.shape[1], img.shape[0])

    rc = main(["match", f1, f2, "--crosscheck"])
    assert rc == 0
    out2 = json.loads(capsys.readouterr().out)
    assert out2["mode"] == "crosscheck" and out2["matches"] > 0


def test_cli_descriptor_mode_adoption(scene, capsys):
    """A store built with --descriptor-mode fast is usable from the CLI
    with NO flag (localize adopts the store's recorded provenance) and
    an explicit conflicting override is refused by check_descriptor_mode
    — before this flag existed, fast/hybrid stores were unusable at the
    CLI surface entirely."""
    tmp_path, tiles, img = scene
    store_dir = str(tmp_path / "fstore")
    rc = main(["preprocess", "--dataset", str(tiles), "--store", store_dir,
               "--lod", "1", "--binary", "--descriptor-mode", "fast"])
    assert rc == 0
    with open(os.path.join(store_dir, "manifest.json")) as f:
        assert json.load(f)["descriptor_mode"] == "fast"

    from PIL import Image

    frame_path = str(tmp_path / "frame.png")
    Image.fromarray((img * 255).astype(np.uint8)).save(frame_path)
    # No flag: adopt 'fast' from the store.
    rc = main(["localize", "--store", store_dir, "--frame", frame_path])
    assert rc == 0
    captured = capsys.readouterr().out
    out = json.loads(captured[captured.index("{"):])
    assert out["keypoints"] > 0
    # Explicit matching override also works.
    rc = main(["localize", "--store", store_dir, "--frame", frame_path,
               "--descriptor-mode", "fast"])
    assert rc == 0
    capsys.readouterr()
    # A conflicting override must be refused, not silently mismatched.
    with pytest.raises(ValueError, match="descriptor_mode"):
        main(["localize", "--store", store_dir, "--frame", frame_path,
              "--descriptor-mode", "exact"])
    # --append with no flag ADOPTS the store's recorded 'fast' mode
    # (pre-flight), instead of defaulting to exact and failing at save.
    rc = main(["preprocess", "--dataset", str(tiles), "--store", store_dir,
               "--lod", "1", "--binary", "--append"])
    assert rc == 0
    capsys.readouterr()
    with open(os.path.join(store_dir, "manifest.json")) as f:
        m = json.load(f)
    assert m["descriptor_mode"] == "fast" and len(m["segments"]) == 2


def test_cli_store_info_delete(tmp_path, rng, capsys):
    """`store info` summarizes both backends; `store delete` is the
    cascaded image delete (imagedb.rs:66-72) at the CLI surface —
    in-place on a binary store, re-saved for npz."""
    from cubesat_apds_tpu.store.binary_store import write_binary_store
    from cubesat_apds_tpu.store.feature_store import FeatureStore

    s = FeatureStore()
    for t in range(3):
        iid = s.create_image(t * 100, 0, t * 100 + 100, 100, 0)
        k = 50 + t * 10
        s.add_keypoints(iid, rng.uniform(0, 100, k), rng.uniform(0, 100, k),
                        np.full(k, 4.8, np.float32),
                        np.zeros(k, np.float32),
                        rng.uniform(0, 1, k).astype(np.float32),
                        np.zeros(k, np.int32), np.zeros(k, np.int32),
                        rng.integers(0, 256, (k, 61), dtype=np.uint8))
    s.descriptor_mode = "exact"
    npz_dir = str(tmp_path / "npz")
    bin_dir = str(tmp_path / "bin")
    s.save(npz_dir)
    write_binary_store(s, bin_dir)

    for path, backend in ((npz_dir, "npz"), (bin_dir, "binary")):
        assert main(["store", "info", path]) == 0
        out = capsys.readouterr().out
        info = json.loads(out)
        assert info["backend"] == backend
        assert info["tiles"] == 3
        assert info["keypoints_live"] == 180
        assert info["descriptor_mode"] == "exact"
        assert info["lods"] == [0]

        assert main(["store", "delete", path, "--image-id", "2"]) == 0
        res = json.loads(capsys.readouterr().out)
        assert res["keypoints_removed"] == 60
        assert res["keypoints_live"] == 120

        assert main(["store", "info", path]) == 0
        info = json.loads(capsys.readouterr().out)
        assert info["tiles"] == 2 and info["keypoints_live"] == 120

        # compact: reclaims the binary store's tombstones; npz is a
        # no-op (rewritten whole on save already).
        assert main(["store", "compact", path]) == 0
        res = json.loads(capsys.readouterr().out)
        if backend == "binary":
            assert res == {"store": path, "kept": 120, "dropped": 60,
                           "compacted": True}
            assert main(["store", "info", path]) == 0
            info = json.loads(capsys.readouterr().out)
            assert info["keypoints_total"] == 120  # dead rows gone
            assert info["keypoints_live"] == 120
        else:
            assert res["compacted"] is False

    # Error paths: unknown id, and delete without ids.
    with pytest.raises(SystemExit, match="unknown image id"):
        main(["store", "delete", bin_dir, "--image-id", "99"])
    with pytest.raises(SystemExit, match="at least one"):
        main(["store", "delete", bin_dir])


def test_cli_localize_pose_and_attitude(scene, capsys):
    """With elevation attached at preprocess time, localize solves PnP
    and the JSON carries the attitude deliverables the project is named
    for: camera_position (−Rᵀt, world frame), a unit quaternion and
    ZYX Euler angles of the camera→world rotation — the reference stops
    at raw rvec/tvec (PNPRANSACSolution, homographier mod.rs:46-51)."""
    tmp_path, tiles, img = scene
    elev = np.full((32, 32), 100, np.uint8)
    edir = tmp_path / "elev"
    edir.mkdir()
    write_geotiff(str(edir / "e.tif"), elev,
                  [10.0, 0.004, 0, 56.0, 0, -0.004])
    store_dir = str(tmp_path / "pstore")
    rc = main(["preprocess", "--dataset", str(tiles), "--store", store_dir,
               "--lod", "1", "-e", str(edir / "e.tif")])
    assert rc == 0
    capsys.readouterr()

    from PIL import Image

    frame_path = str(tmp_path / "pframe.png")
    Image.fromarray((img * 255).astype(np.uint8)).save(frame_path)
    rc = main(["localize", "--store", store_dir, "--frame", frame_path])
    assert rc == 0
    captured = capsys.readouterr().out
    out = json.loads(captured[captured.index("{"):])
    assert out["pose_ok"] is True
    q = np.asarray(out["attitude_quat_wxyz"])
    assert q.shape == (4,) and abs(np.linalg.norm(q) - 1.0) < 1e-6
    assert len(out["camera_position"]) == 3
    assert len(out["attitude_euler_zyx_deg"]) == 3
    # The position must be the camera center −Rᵀt of the reported pose.
    from cubesat_apds_tpu.core.attitude import pose_to_attitude

    att = pose_to_attitude(np.asarray(out["rvec"], np.float32),
                           np.asarray(out["tvec"], np.float32))
    np.testing.assert_allclose(out["camera_position"], att["position"],
                               rtol=1e-6)


def test_cli_stream_follow(scene, capsys):
    """--follow service mode: frames dropped into the watched directory
    AFTER the stream starts are discovered (write-then-rename producer)
    and processed; --max-frames terminates the service."""
    import threading
    import time as _time

    tmp_path, tiles, img = scene
    store_dir = str(tmp_path / "folstore")
    rc = main(["preprocess", "--dataset", str(tiles), "--store", store_dir,
               "--lod", "1"])
    assert rc == 0
    capsys.readouterr()

    from PIL import Image

    spool = tmp_path / "spool"
    spool.mkdir()

    def write_frame(i):
        tmpf = spool / f"_tmp{i}"      # invisible: no image extension
        Image.fromarray(
            (np.roll(img, i, axis=1) * 255).astype(np.uint8)
        ).save(str(tmpf), format="PNG")
        os.replace(tmpf, spool / f"f{i}.png")   # atomic appearance

    write_frame(0)
    write_frame(1)

    def producer():
        _time.sleep(1.5)
        write_frame(2)
        _time.sleep(0.7)
        write_frame(3)

    t = threading.Thread(target=producer)
    t.start()
    try:
        rc = main(["stream", "--store", store_dir, "--frames", str(spool),
                   "--follow", "--poll-interval", "0.2",
                   "--max-frames", "4", "--idle-timeout", "120"])
    finally:
        t.join()
    assert rc == 0
    lines = [json.loads(ln)
             for ln in capsys.readouterr().out.strip().splitlines()]
    recs = [ln for ln in lines if "summary" not in ln]
    assert len(recs) == 4
    assert {os.path.basename(r["frame"]) for r in recs} == {
        "f0.png", "f1.png", "f2.png", "f3.png"}
    assert lines[-1]["summary"]["frames"] == 4


def test_compile_cache_gate(tmp_path, monkeypatch):
    """The persistent compile cache must stay OFF when CPU is the
    leading platform (the axon-site CPU serializer crash, see
    conftest) or when disabled, and point at APDS_COMPILE_CACHE
    otherwise."""
    import jax

    from cubesat_apds_tpu.cli import _enable_compile_cache

    before = jax.config.jax_compilation_cache_dir
    # Suite runs with jax_platforms forced to "cpu" -> gate must no-op.
    _enable_compile_cache(False)
    assert jax.config.jax_compilation_cache_dir == before

    # Leading non-cpu platform -> enabled at the env-var path. (No jax
    # computation may run inside this block: the suite's real platform
    # is the conftest-forced CPU, restored in the finally.)
    cache_dir = tmp_path / "xla"
    monkeypatch.setenv("APDS_COMPILE_CACHE", str(cache_dir))
    jax.config.update("jax_platforms", "axon,cpu")
    try:
        _enable_compile_cache(False)
        assert jax.config.jax_compilation_cache_dir == str(cache_dir)
        assert cache_dir.is_dir()

        # Explicit disable (flag and =0 env) -> untouched.
        jax.config.update("jax_compilation_cache_dir", None)
        _enable_compile_cache(True)
        assert jax.config.jax_compilation_cache_dir is None
        monkeypatch.setenv("APDS_COMPILE_CACHE", "0")
        _enable_compile_cache(False)
        assert jax.config.jax_compilation_cache_dir is None
    finally:
        jax.config.update("jax_compilation_cache_dir", before)
        jax.config.update("jax_platforms", "cpu")
