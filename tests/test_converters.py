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


def test_tool_dependent_stubs_raise():
    with pytest.raises(RuntimeError, match="hloc"):
        hloc_to_json()
    with pytest.raises(RuntimeError, match="ffmpeg"):
        insta360_to_images()
