"""Fixture tests for the capture-format converters (process_data parity)."""

import csv
import json
from pathlib import Path

import numpy as np
import pytest

from gfnerf_tpu.process_data.converters import (
    hloc_to_json,
    insta360_to_images,
    metashape_to_json,
    polycam_to_json,
    realitycapture_to_json,
    record3d_to_json,
)


def test_polycam(tmp_path):
    cams = tmp_path / "cameras"
    cams.mkdir()
    imgs = []
    for i in range(3):
        img = tmp_path / f"frame_{i}.jpg"
        img.touch()
        imgs.append(img)
        j = {"fx": 600.0, "fy": 600.0, "cx": 360.0, "cy": 480.0,
             "width": 720, "height": 960,
             "blur_score": 5.0 if i == 1 else 100.0}
        for r in range(3):
            for c in range(4):
                j[f"t_{r}{c}"] = float(r * 4 + c)
        (cams / f"frame_{i}.json").write_text(json.dumps(j))
    out = tmp_path / "out"
    summary = polycam_to_json(imgs, cams, out, min_blur_score=25,
                              crop_border_pixels=15)
    data = json.loads((out / "transforms.json").read_text())
    assert len(data["frames"]) == 2          # blur-filtered frame dropped
    f = data["frames"][0]
    assert f["w"] == 720 - 30 and f["cx"] == 360.0 - 15
    # axis permutation: first row of the output is the stored t_2* row
    assert f["transform_matrix"][0] == [8.0, 9.0, 10.0, 11.0]
    assert any("Skipped 1" in s for s in summary)


def test_record3d(tmp_path):
    n = 4
    poses = []
    for i in range(n):
        poses.append([0.0, 0.0, 0.0, 1.0, i * 0.1, 0.0, 1.0])  # identity rot
    K = np.array([[500.0, 0, 0], [0, 500, 0], [320, 240, 1]])  # column-major
    meta = {"poses": poses, "K": K.reshape(-1).tolist(), "w": 640, "h": 480}
    mp = tmp_path / "metadata.json"
    mp.write_text(json.dumps(meta))
    imgs = [Path(f"images/frame_{i:05d}.jpg") for i in range(n)]
    cnt = record3d_to_json(imgs, mp, tmp_path, np.arange(n))
    assert cnt == n
    data = json.loads((tmp_path / "transforms.json").read_text())
    assert data["fl_x"] == 500.0
    t = np.asarray(data["frames"][2]["transform_matrix"])
    np.testing.assert_allclose(t[:3, :3], np.eye(3), atol=1e-12)
    assert t[0, 3] == pytest.approx(0.2)


def test_metashape(tmp_path):
    xml = """<?xml version="1.0"?>
<document><chunk>
  <sensors>
    <sensor id="0" type="frame">
      <resolution width="100" height="80"/>
      <calibration><f>90.5</f><cx>1.5</cx><k1>0.01</k1></calibration>
    </sensor>
  </sensors>
  <cameras>
    <camera label="img0" sensor_id="0">
      <transform>1 0 0 2 0 1 0 3 0 0 1 4 0 0 0 1</transform>
    </camera>
    <camera label="img1" sensor_id="0"/>
  </cameras>
</chunk></document>"""
    xp = tmp_path / "cameras.xml"
    xp.write_text(xml)
    fmap = {"img0": Path("images/img0.jpg"), "img1": Path("images/img1.jpg")}
    summary = metashape_to_json(fmap, xp, tmp_path)
    data = json.loads((tmp_path / "transforms.json").read_text())
    assert len(data["frames"]) == 1          # img1 has no transform
    f = data["frames"][0]
    assert f["fl_x"] == 90.5
    assert f["cx"] == 1.5 + 50.0
    assert f["k1"] == 0.01
    t = np.asarray(f["transform_matrix"])
    # rows permuted [2,0,1,3], columns 1:3 negated
    assert t[0, 3] == 4.0 and t[1, 3] == 2.0 and t[2, 3] == 3.0
    assert any("1 images skipped" in s for s in summary)


def test_realitycapture(tmp_path):
    cp = tmp_path / "poses.csv"
    with open(cp, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=[
            "#name", "x", "y", "alt", "heading", "pitch", "roll", "f",
            "px", "py", "k1", "k2", "k3", "k4", "t1", "t2"])
        w.writeheader()
        w.writerow({"#name": "a.jpg", "x": 1, "y": 2, "alt": 3,
                    "heading": 0, "pitch": 0, "roll": 0, "f": 36,
                    "px": 0, "py": 0, "k1": 0, "k2": 0, "k3": 0, "k4": 0,
                    "t1": 0, "t2": 0})
        w.writerow({"#name": "missing.jpg", "x": 0, "y": 0, "alt": 0,
                    "heading": 0, "pitch": 0, "roll": 0, "f": 36,
                    "px": 0, "py": 0, "k1": 0, "k2": 0, "k3": 0, "k4": 0,
                    "t1": 0, "t2": 0})
    fmap = {"a": Path("images/a.jpg")}
    summary = realitycapture_to_json(fmap, cp, tmp_path,
                                     image_sizes={"a": (72, 54)})
    data = json.loads((tmp_path / "transforms.json").read_text())
    assert len(data["frames"]) == 1
    f = data["frames"][0]
    assert f["fl_x"] == pytest.approx(36 * 72 / 36)   # 35mm-equivalent
    t = np.asarray(f["transform_matrix"])
    np.testing.assert_allclose(t[:3, 3], [1, 2, 3])
    np.testing.assert_allclose(t[:3, :3], np.eye(3), atol=1e-12)
    assert any("Missing image data for 1" in s for s in summary)


def test_tool_dependent_paths_gated(tmp_path):
    """The tool-dependent entry points raise with instructions when the
    external tool is absent (hloc package) or the input is undecodable."""
    with pytest.raises(RuntimeError, match="hloc"):
        hloc_to_json(tmp_path, tmp_path / "out")
    with pytest.raises(RuntimeError, match="frames|ffmpeg"):
        insta360_to_images(tmp_path / "a.insv", tmp_path / "b.insv",
                           tmp_path / "images", 10)


def test_insta360_video_roundtrip(tmp_path):
    """Full video path: cv2-encoded front/back videos decode in-image (no
    ffmpeg) and run through the native crop/rotate/numbering pipeline."""
    import numpy as np

    cv2 = pytest.importorskip("cv2")

    rng = np.random.default_rng(3)
    vids = {}
    frames = {}
    for name in ("front", "back"):
        path = str(tmp_path / f"{name}.mp4")
        w = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 5,
                            (96, 80))
        assert w.isOpened(), "cv2 VideoWriter lacks mp4v support"
        fs = []
        for _ in range(6):
            # smooth low-frequency content survives lossy encoding
            base = rng.integers(40, 200, (1, 1, 3))
            f = np.tile(base, (80, 96, 1)).astype(np.uint8)
            w.write(f)
            fs.append(f)
        w.release()
        vids[name] = path
        frames[name] = fs

    out = tmp_path / "images"
    log = insta360_to_images(vids["front"], vids["back"], out,
                             num_frames_target=6)
    files = sorted(out.glob("frame_*.png"))
    assert len(files) == 6
    assert "We extracted 6 images" in log[-1]

    from PIL import Image

    # frame 1 = front frame 0: cropped to 70% then rotated 90 CCW ->
    # (67, 56); lossy codec -> compare means
    got = np.asarray(Image.open(files[0]))
    assert got.shape == (67, 56, 3)
    want = frames["front"][0][..., ::-1]  # BGR -> RGB
    assert abs(got.mean() - want.mean()) < 8.0


def _write_png(path, arr):
    from PIL import Image

    Image.fromarray(arr.astype("uint8")).save(path)


def test_insta360_two_file_frames(tmp_path):
    """Native numpy equivalent of convert_insta360_to_images
    (insta360_utils.py:54-124): spacing selection, 70% center crop,
    transpose=2 (front, 90 CCW) / transpose=1 (back, 90 CW), back frames
    numbered after the front."""
    import numpy as np

    from gfnerf_tpu.process_data.converters import insta360_frames_to_images

    rng = np.random.default_rng(0)
    front_dir = tmp_path / "front"
    back_dir = tmp_path / "back"
    front_dir.mkdir()
    back_dir.mkdir()
    fronts, backs = [], []
    for i in range(8):
        f = rng.integers(0, 255, (80, 100, 3))
        b = rng.integers(0, 255, (80, 100, 3))
        _write_png(front_dir / f"f_{i:03d}.png", f)
        _write_png(back_dir / f"b_{i:03d}.png", b)
        fronts.append(f)
        backs.append(b)

    out = tmp_path / "images"
    # target 8 -> 4 per lens -> spacing 2 -> frames 0,2,4,6 of each
    log = insta360_frames_to_images(
        sorted(front_dir.iterdir()), sorted(back_dir.iterdir()), out,
        num_frames_target=8)
    files = sorted(out.glob("frame_*.png"))
    assert [f.name for f in files] == [f"frame_{i:05d}.png"
                                       for i in range(1, 9)]
    assert "We extracted 8 images" in log[-1]

    from PIL import Image

    # crop: 80*0.7=56 rows, 100*0.7=70 cols at offsets (12, 15); rotation
    # makes the saved image (70, 56)
    def crop(a):
        return a[12:12 + 56, 15:15 + 70]

    got_front0 = np.asarray(Image.open(files[0]))
    np.testing.assert_array_equal(got_front0, np.rot90(crop(fronts[0]), 1))
    got_back0 = np.asarray(Image.open(files[4]))
    np.testing.assert_array_equal(got_back0, np.rot90(crop(backs[0]), -1))
    got_back6 = np.asarray(Image.open(files[7]))
    np.testing.assert_array_equal(got_back6, np.rot90(crop(backs[6]), -1))


def test_insta360_single_file_frames(tmp_path):
    """convert_insta360_single_file_to_images semantics
    (insta360_utils.py:127-194): both lenses side by side in one frame,
    ih*p squares at x = ih*p/4 (back) and x = iw/2 + ih*p/4 (front), no
    rotation, front numbered first."""
    import numpy as np

    from gfnerf_tpu.process_data.converters import (
        insta360_single_frames_to_images)

    rng = np.random.default_rng(1)
    src = tmp_path / "frames"
    src.mkdir()
    frames = []
    for i in range(3):
        a = rng.integers(0, 255, (200, 400, 3))
        _write_png(src / f"d_{i:03d}.png", a)
        frames.append(a)

    out = tmp_path / "images"
    insta360_single_frames_to_images(sorted(src.iterdir()), out,
                                     num_frames_target=6)
    files = sorted(out.glob("frame_*.png"))
    assert len(files) == 6  # 3 front + 3 back

    from PIL import Image

    s, y0 = 140, 35  # ih*0.7, ih*0.7/4
    front0 = np.asarray(Image.open(files[0]))
    np.testing.assert_array_equal(
        front0, frames[0][y0:y0 + s, 200 + y0:200 + y0 + s])
    back0 = np.asarray(Image.open(files[3]))
    np.testing.assert_array_equal(back0, frames[0][y0:y0 + s, y0:y0 + s])


def test_hloc_gated_without_package(tmp_path):
    """Without the hloc package installed the driver raises with install
    instructions (reference hloc_utils.py:29-50 _HAS_HLOC gate)."""
    import pytest

    from gfnerf_tpu.process_data.converters import hloc_to_json

    with pytest.raises(RuntimeError, match="hloc is not available"):
        hloc_to_json(tmp_path, tmp_path / "out")
