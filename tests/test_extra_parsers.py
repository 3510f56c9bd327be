"""Tiny-fixture tests for the 9 additional dataparsers (VERDICT r1 item 7).

Each test writes the dataset format to disk from scratch, parses it, and
checks cameras/filenames/splits/metadata semantics.
"""

import json
import math
from pathlib import Path

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from gfnerf_tpu.data.dataparsers import build_dataparser, registry


def _write_png(path, w=8, h=6):
    path.parent.mkdir(parents=True, exist_ok=True)
    img = (np.random.default_rng(0).random((h, w, 3)) * 255).astype(np.uint8)
    cv2.imwrite(str(path), img)


def _pose(i, n=8, radius=4.0):
    a = 2 * np.pi * i / n
    c = np.array([radius * np.cos(a), radius * np.sin(a), 1.5])
    z = c / np.linalg.norm(c)           # camera looks at origin (-z fwd)
    x = np.cross(np.array([0, 0, 1.0]), z)
    x /= np.linalg.norm(x) + 1e-9
    y = np.cross(z, x)
    m = np.eye(4)
    m[:3, 0], m[:3, 1], m[:3, 2], m[:3, 3] = x, y, z, c
    return m


def test_registry_complete():
    names = set(registry())
    assert names >= {
        "nerfstudio", "blender", "minimal", "instant-ngp", "dnerf",
        "scannet", "sdfstudio", "phototourism", "sitcoms3d", "arkitscenes",
        "nuscenes", "dycheck"}
    assert len(names) >= 12


def test_instant_ngp(tmp_path):
    frames = []
    for i in range(8):
        fp = f"images/im_{i}.png"
        _write_png(tmp_path / fp)
        frames.append({"file_path": fp,
                       "transform_matrix": _pose(i).tolist()})
    meta = {"camera_angle_x": 0.8, "aabb_scale": 4, "w": 8, "h": 6,
            "k1": 0.01, "frames": frames}
    (tmp_path / "transforms.json").write_text(json.dumps(meta))
    out = build_dataparser("instant-ngp", tmp_path).get_dataparser_outputs(
        "train")
    assert len(out.image_filenames) == math.ceil(8 * 0.9)
    assert out.cameras.camera_to_worlds.shape == (8, 3, 4)[0:1] + (3, 4)
    np.testing.assert_allclose(out.scene_box.aabb, [[-2] * 3, [2] * 3])
    assert out.cameras.distortion_params[0, 0] == pytest.approx(0.01)
    ev = build_dataparser("instant-ngp", tmp_path).get_dataparser_outputs(
        "val")
    # ceil(8*0.9)=8 -> empty eval set falls back to the first train image
    assert len(ev.image_filenames) == 1


def test_dnerf(tmp_path):
    for split in ("train", "val"):
        frames = []
        for i in range(4):
            name = f"{split}_{i}"
            _write_png(tmp_path / f"{name}.png")
            frames.append({"file_path": f"./{name}",
                           "transform_matrix": _pose(i, 4).tolist(),
                           "time": i / 3.0})
        (tmp_path / f"transforms_{split}.json").write_text(
            json.dumps({"camera_angle_x": 0.7, "frames": frames}))
    out = build_dataparser("dnerf", tmp_path).get_dataparser_outputs("train")
    assert len(out.image_filenames) == 4
    times = out.metadata["times"]
    np.testing.assert_allclose(times, [0, 1 / 3, 2 / 3, 1.0], atol=1e-6)


def test_scannet(tmp_path):
    for i in range(6):
        _write_png(tmp_path / "color" / f"{i}.jpg")
        _write_png(tmp_path / "depth" / f"{i}.png")
        np.savetxt(tmp_path / "pose" / f"{i}.txt", _pose(i, 6)) if (
            tmp_path / "pose").exists() else None
    (tmp_path / "pose").mkdir(exist_ok=True)
    for i in range(6):
        np.savetxt(tmp_path / "pose" / f"{i}.txt", _pose(i, 6))
    # one invalid pose must be skipped
    np.savetxt(tmp_path / "pose" / "5.txt", np.full((4, 4), np.inf))
    (tmp_path / "intrinsic").mkdir()
    K = np.array([[500.0, 0, 4], [0, 500, 3], [0, 0, 1]])
    np.savetxt(tmp_path / "intrinsic" / "intrinsic_color.txt", K)
    out = build_dataparser("scannet", tmp_path).get_dataparser_outputs(
        "train")
    assert len(out.image_filenames) == math.ceil(5 * 0.9)
    assert np.isfinite(out.cameras.camera_to_worlds).all()
    # auto-scaled into the unit box
    assert np.abs(out.cameras.camera_to_worlds[:, :3, 3]).max() <= 1.0 + 1e-5
    assert out.metadata["depth_filenames"] is not None


def test_sdfstudio(tmp_path):
    frames = []
    for i in range(5):
        _write_png(tmp_path / f"{i:06d}_rgb.png")
        frames.append({
            "rgb_path": f"{i:06d}_rgb.png",
            "intrinsics": [[400.0, 0, 4, 0], [0, 400, 3, 0],
                           [0, 0, 1, 0], [0, 0, 0, 1]],
            "camtoworld": _pose(i, 5).tolist(),
        })
    meta = {"frames": frames, "height": 6, "width": 8,
            "has_mono_prior": False,
            "scene_box": {"aabb": [[-1, -1, -1], [1, 1, 1]]}}
    (tmp_path / "meta_data.json").write_text(json.dumps(meta))
    out = build_dataparser("sdfstudio", tmp_path).get_dataparser_outputs(
        "train")
    assert len(out.image_filenames) == 5
    np.testing.assert_allclose(out.scene_box.aabb,
                               [[-1, -1, -1], [1, 1, 1]])
    assert float(out.cameras.fx[0]) == 400.0


def test_phototourism(tmp_path):
    import struct

    sparse = tmp_path / "dense" / "sparse"
    sparse.mkdir(parents=True)
    n = 5
    with open(sparse / "cameras.bin", "wb") as f:
        f.write(struct.pack("<Q", n))
        for cid in range(1, n + 1):
            f.write(struct.pack("<iiQQ", cid, 1, 8, 6))  # PINHOLE
            f.write(struct.pack("<4d", 400.0, 410.0, 4.0, 3.0))
    with open(sparse / "images.bin", "wb") as f:
        f.write(struct.pack("<Q", n))
        for iid in range(1, n + 1):
            f.write(struct.pack("<i", iid))
            q = np.array([1.0, 0, 0, 0])
            f.write(struct.pack("<4d", *q))
            f.write(struct.pack("<3d", 0.1 * iid, 0.0, 1.0))
            f.write(struct.pack("<i", iid))
            f.write(f"im_{iid}.jpg".encode() + b"\x00")
            f.write(struct.pack("<Q", 0))
    for iid in range(1, n + 1):
        _write_png(tmp_path / "dense" / "images" / f"im_{iid}.jpg")
    out = build_dataparser("phototourism", tmp_path).get_dataparser_outputs(
        "train")
    assert len(out.image_filenames) == math.ceil(n * 0.9)
    assert np.isfinite(out.cameras.camera_to_worlds).all()
    assert float(out.cameras.fy[0]) == 410.0


def test_sitcoms3d(tmp_path):
    frames = []
    for i in range(4):
        name = f"f{i}.jpg"
        _write_png(tmp_path / "images_4" / name)
        frames.append({"image_name": name,
                       "intrinsics": [[320.0, 0, 4], [0, 320, 3], [0, 0, 1]],
                       "camtoworld": _pose(i, 4).tolist()})
    (tmp_path / "cameras.json").write_text(json.dumps(
        {"frames": frames, "bbox": [[-2, -2, -1], [2, 2, 3]]}))
    out = build_dataparser("sitcoms3d", tmp_path).get_dataparser_outputs(
        "train")
    assert len(out.image_filenames) == 4
    # longest bbox dim normalized to scene_scale
    lengths = out.scene_box.aabb[1] - out.scene_box.aabb[0]
    assert float(lengths.max()) == pytest.approx(2.0)
    # cameras follow the box normalization
    assert np.abs(out.cameras.camera_to_worlds[:, :3, 3]).max() < 10


def test_arkitscenes(tmp_path):
    tmp_path = tmp_path / "40753679"   # numeric video id like the dataset
    vid = tmp_path.name
    frames_dir = tmp_path / f"{vid}_frames"
    n = 4
    ts = [1.001 + 0.1 * i for i in range(n)]
    lines = []
    for i, t in enumerate(ts):
        _write_png(frames_dir / "lowres_wide" / f"{vid}_{t:.3f}.png")
        _write_png(frames_dir / "lowres_depth" / f"{vid}_{t:.3f}.png")
        (frames_dir / "lowres_wide_intrinsics").mkdir(parents=True,
                                                      exist_ok=True)
        np.savetxt(frames_dir / "lowres_wide_intrinsics" /
                   f"{vid}_{t:.3f}.pincam",
                   np.array([8.0, 6.0, 300.0, 300.0, 4.0, 3.0])[None])
        pose = _pose(i, n)
        w2c = np.linalg.inv(pose)
        # axis-angle of rotation
        R = w2c[:3, :3]
        theta = np.arccos(np.clip((np.trace(R) - 1) / 2, -1, 1))
        if theta < 1e-8:
            rvec = np.zeros(3)
        else:
            rvec = theta / (2 * np.sin(theta)) * np.array(
                [R[2, 1] - R[1, 2], R[0, 2] - R[2, 0], R[1, 0] - R[0, 1]])
        lines.append(" ".join(map(str, [t, *rvec, *w2c[:3, 3]])))
    (frames_dir / "lowres_wide.traj").write_text("\n".join(lines) + "\n")
    out = build_dataparser("arkitscenes", tmp_path).get_dataparser_outputs(
        "train")
    assert len(out.image_filenames) == math.ceil(n * 0.9)
    assert np.isfinite(out.cameras.camera_to_worlds).all()
    assert out.metadata["depth_filenames"] is not None


def test_nuscenes(tmp_path):
    from gfnerf_tpu.data.dataparsers.extra_parsers import (
        NuScenesDataParser, NuScenesDataParserConfig)

    root = tmp_path
    v = root / "v1.0-mini"
    v.mkdir()
    n = 4
    scene = [{"token": "sc0", "name": "scene-0001"}]
    samples = [{"token": f"sa{i}", "scene_token": "sc0", "timestamp": i}
               for i in range(n)]
    sensor = [{"token": "se0", "channel": "CAM_FRONT"}]
    calib = [{"token": "cs0", "sensor_token": "se0",
              "rotation": [1, 0, 0, 0], "translation": [0.5, 0, 1.6],
              "camera_intrinsic": [[800.0, 0, 4], [0, 800, 3], [0, 0, 1]]}]
    egos, sds = [], []
    for i in range(n):
        egos.append({"token": f"ep{i}", "rotation": [1, 0, 0, 0],
                     "translation": [i * 1.0, 0, 0]})
        fn = f"samples/CAM_FRONT/img_{i}.jpg"
        _write_png(root / fn)
        sds.append({"token": f"sd{i}", "sample_token": f"sa{i}",
                    "calibrated_sensor_token": "cs0",
                    "ego_pose_token": f"ep{i}", "is_key_frame": True,
                    "filename": fn})
    for name, rows in (("scene", scene), ("sample", samples),
                       ("sample_data", sds), ("calibrated_sensor", calib),
                       ("ego_pose", egos), ("sensor", sensor)):
        (v / f"{name}.json").write_text(json.dumps(rows))
    cfg = NuScenesDataParserConfig(data=Path("scene-0001"), data_dir=root)
    out = NuScenesDataParser(cfg).get_dataparser_outputs("train")
    assert len(out.image_filenames) == math.ceil(n * 0.9)
    # poses centered + normalized
    t = out.cameras.camera_to_worlds[:, :3, 3]
    assert np.abs(t).max() <= 1.0 + 1e-5


def test_dycheck(tmp_path):
    n = 3
    (tmp_path / "extra.json").write_text(json.dumps(
        {"factor": 1, "fps": 30, "bbox": [[-1] * 3, [1] * 3],
         "lookat": [0, 0, 0], "up": [0, 1, 0]}))
    (tmp_path / "scene.json").write_text(json.dumps(
        {"center": [0.0, 0.0, 0.0], "scale": 0.5, "near": 0.1, "far": 2.0}))
    (tmp_path / "splits").mkdir()
    (tmp_path / "splits" / "train.json").write_text(json.dumps(
        {"frame_names": [f"0_{i:05d}" for i in range(n)],
         "time_ids": list(range(n))}))
    (tmp_path / "camera").mkdir()
    for i in range(n):
        pose = _pose(i, n)
        cam = {"orientation": pose[:3, :3].T.tolist(),
               "position": pose[:3, 3].tolist(),
               "focal_length": 350.0, "principal_point": [4.0, 3.0],
               "image_size": [8, 6], "pixel_aspect_ratio": 1.0}
        (tmp_path / "camera" / f"0_{i:05d}.json").write_text(json.dumps(cam))
        _write_png(tmp_path / "rgb" / "1x" / f"0_{i:05d}.png")
    out = build_dataparser("dycheck", tmp_path).get_dataparser_outputs(
        "train")
    assert len(out.image_filenames) == n
    np.testing.assert_allclose(out.metadata["times"], [0, 0.5, 1.0])
    assert np.isfinite(out.cameras.camera_to_worlds).all()
