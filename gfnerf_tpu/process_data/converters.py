"""Capture-format converters -> nerfstudio ``transforms.json``.

Host-side numpy/JSON/XML/CSV reimplementations of the reference's
``nerfstudio/process_data/{polycam,record3d,metashape,realitycapture}_utils``
(each cited per function).  The reference's hloc path shells out to the hloc
toolbox binary and insta360 shells out to ffmpeg dual-fisheye stitching;
neither external tool exists in this environment, so those entry points
raise with instructions instead of silently degrading (the COLMAP-parse and
video-frame paths live in ``colmap_utils.py`` / ``scripts/process_data.py``).
"""

from __future__ import annotations

import csv
import json
import xml.etree.ElementTree as ET
from pathlib import Path
from typing import Dict, List, Optional

import numpy as np


def _write_transforms(output_dir: Path, data: dict):
    output_dir = Path(output_dir)
    output_dir.mkdir(parents=True, exist_ok=True)
    with open(output_dir / "transforms.json", "w", encoding="utf-8") as f:
        json.dump(data, f, indent=4)


# ------------------------------------------------------------------ polycam ----


def polycam_to_json(image_filenames: List[Path], cameras_dir: Path,
                    output_dir: Path, min_blur_score: float = 25.0,
                    crop_border_pixels: int = 15,
                    depth_filenames: Optional[List[Path]] = None) -> List[str]:
    """Polycam per-frame camera JSONs -> transforms.json
    (polycam_utils.py:28-96): blur-score filtering, border crop applied to
    intrinsics, and the polycam->nerfstudio axis permutation (rows t_2, t_0,
    t_1 of the stored matrix)."""
    frames = []
    skipped = 0
    for i, image_filename in enumerate(image_filenames):
        j = json.loads(
            (Path(cameras_dir) / f"{image_filename.stem}.json").read_text())
        if "blur_score" in j and j["blur_score"] < min_blur_score:
            skipped += 1
            continue
        frame = {
            "fl_x": j["fx"], "fl_y": j["fy"],
            "cx": j["cx"] - crop_border_pixels,
            "cy": j["cy"] - crop_border_pixels,
            "w": j["width"] - crop_border_pixels * 2,
            "h": j["height"] - crop_border_pixels * 2,
            "file_path": f"./images/frame_{i+1:05d}{image_filename.suffix}",
            "transform_matrix": [
                [j["t_20"], j["t_21"], j["t_22"], j["t_23"]],
                [j["t_00"], j["t_01"], j["t_02"], j["t_03"]],
                [j["t_10"], j["t_11"], j["t_12"], j["t_13"]],
                [0.0, 0.0, 0.0, 1.0],
            ],
        }
        if depth_filenames:
            frame["depth_file_path"] = (
                f"./depth/frame_{i+1:05d}{depth_filenames[i].suffix}")
        frames.append(frame)
    if not frames:
        raise RuntimeError("no polycam frames survived blur filtering")
    _write_transforms(output_dir, {"camera_model": "OPENCV",
                                   "frames": frames})
    out = [f"Final dataset is {len(frames)} frames."]
    if skipped:
        out.insert(0, f"Skipped {skipped} frames due to low blur score.")
    return out


# ----------------------------------------------------------------- record3d ----


def _quat_xyzw_to_rotmat(q):
    x, y, z, w = [float(v) for v in q]
    n = (w * w + x * x + y * y + z * z) ** 0.5 or 1.0
    w, x, y, z = w / n, x / n, y / n, z / n
    return np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - z * w), 2 * (x * z + y * w)],
        [2 * (x * y + z * w), 1 - 2 * (x * x + z * z), 2 * (y * z - x * w)],
        [2 * (x * z - y * w), 2 * (y * z + x * w), 1 - 2 * (x * x + y * y)],
    ])


def record3d_to_json(images_paths: List[Path], metadata_path: Path,
                     output_dir: Path, indices: np.ndarray) -> int:
    """Record3D metadata.json -> transforms.json (record3d_utils.py:28-93):
    scalar-last quaternion poses, column-major K, centered principal
    point."""
    meta = json.loads(Path(metadata_path).read_text())
    poses = np.asarray(meta["poses"])              # (N, 7) quat xyzw + t
    indices = np.asarray(indices)
    assert len(images_paths) == len(indices)
    frames = []
    for im_path, idx in zip(images_paths, indices):
        p = poses[idx]
        c2w = np.eye(4)
        c2w[:3, :3] = _quat_xyzw_to_rotmat(p[:4])
        c2w[:3, 3] = p[4:7]
        frames.append({"file_path": Path(im_path).as_posix(),
                       "transform_matrix": c2w.tolist()})
    K = np.asarray(meta["K"]).reshape(3, 3).T      # stored column-major
    H, W = meta["h"], meta["w"]
    _write_transforms(output_dir, {
        "fl_x": float(K[0, 0]), "fl_y": float(K[0, 0]),
        "cx": W / 2.0, "cy": H / 2.0, "w": W, "h": H,
        "camera_model": "OPENCV", "frames": frames,
    })
    return len(frames)


# ---------------------------------------------------------------- metashape ----


def metashape_to_json(image_filename_map: Dict[str, Path],
                      xml_filename: Path, output_dir: Path) -> List[str]:
    """Metashape cameras.xml -> transforms.json (metashape_utils.py:36-200):
    per-sensor intrinsics (f, cx/cy offsets from center, k1..k4/p1/p2),
    optional chunk-component transforms, and the metashape->nerfstudio axis
    permutation (rows [2,0,1] with y/z negation)."""
    root = ET.parse(str(xml_filename)).getroot()
    chunk = root[0]
    sensors = chunk.find("sensors")
    if sensors is None:
        raise ValueError("No sensors found")
    calibrated = [s for s in sensors
                  if s.get("type") == "spherical" or s.find("calibration")]
    if not calibrated:
        raise ValueError("No calibrated sensor found in Metashape XML")
    stypes = [s.get("type") for s in calibrated]
    if stypes.count(stypes[0]) != len(stypes):
        raise ValueError("mixed Metashape sensor types are unsupported")
    model = {"frame": "OPENCV", "fisheye": "OPENCV_FISHEYE",
             "spherical": "EQUIRECTANGULAR"}.get(stypes[0])
    if model is None:
        raise ValueError(f"unsupported Metashape sensor type {stypes[0]!r}")

    def find_param(calib, name):
        el = calib.find(name)
        return float(el.text) if el is not None else 0.0

    sensor_dict = {}
    for sensor in calibrated:
        res = sensor.find("resolution")
        s = {"w": int(res.get("width")), "h": int(res.get("height"))}
        calib = sensor.find("calibration")
        if calib is None:
            s["fl_x"] = s["w"] / 2.0
            s["fl_y"] = s["h"]
            s["cx"] = s["w"] / 2.0
            s["cy"] = s["h"] / 2.0
        else:
            f = calib.find("f")
            assert f is not None, "no focal length in Metashape xml"
            s["fl_x"] = s["fl_y"] = float(f.text)
            s["cx"] = find_param(calib, "cx") + s["w"] / 2.0
            s["cy"] = find_param(calib, "cy") + s["h"] / 2.0
            for k in ("k1", "k2", "k3", "k4", "p1", "p2"):
                s[k] = find_param(calib, k)
        sensor_dict[sensor.get("id")] = s

    component_dict = {}
    components = chunk.find("components")
    if components is not None:
        for comp in components:
            tr = comp.find("transform")
            if tr is None:
                continue
            rot = tr.find("rotation")
            r = (np.asarray([float(x) for x in rot.text.split()]).reshape(3, 3)
                 if rot is not None else np.eye(3))
            trans = tr.find("translation")
            t = (np.asarray([float(x) for x in trans.text.split()])
                 if trans is not None else np.zeros(3))
            sc = tr.find("scale")
            scale = float(sc.text) if sc is not None else 1.0
            m = np.eye(4)
            m[:3, :3] = r
            m[:3, 3] = t / scale
            component_dict[comp.get("id")] = m

    frames, skipped = [], 0
    cameras = chunk.find("cameras")
    assert cameras is not None, "no cameras in Metashape xml"
    for camera in cameras:
        label = camera.get("label")
        if label not in image_filename_map:
            label = label.split(".")[0]
            if label not in image_filename_map:
                continue
        sensor_id = camera.get("sensor_id")
        if sensor_id not in sensor_dict or camera.find("transform") is None:
            skipped += 1
            continue
        frame = {"file_path": image_filename_map[label].as_posix()}
        frame.update(sensor_dict[sensor_id])
        t = np.asarray([float(x) for x in
                        camera.find("transform").text.split()]).reshape(4, 4)
        cid = camera.get("component_id")
        if cid in component_dict:
            t = component_dict[cid] @ t
        t = t[[2, 0, 1, 3], :]
        t[:, 1:3] *= -1
        frame["transform_matrix"] = t.tolist()
        frames.append(frame)

    _write_transforms(output_dir, {"camera_model": model, "frames": frames})
    out = [f"Final dataset is {len(frames)} frames."]
    if skipped:
        out.insert(0, f"{skipped} images skipped (missing pose/calibration).")
    return out


# ------------------------------------------------------------ realitycapture ----


def _rc_rotation(yaw, pitch, roll):
    # realitycapture_utils.py:110-127 (z @ x @ y euler composition, degrees)
    sy, cy = np.sin(np.deg2rad(yaw)), np.cos(np.deg2rad(yaw))
    sp, cp = np.sin(np.deg2rad(pitch)), np.cos(np.deg2rad(pitch))
    sr, cr = np.sin(np.deg2rad(roll)), np.cos(np.deg2rad(roll))
    rot_x = np.array([[1, 0, 0], [0, cp, -sp], [0, sp, cp]])
    rot_y = np.array([[cr, 0, sr], [0, 1, 0], [-sr, 0, cr]])
    rot_z = np.array([[cy, -sy, 0], [sy, cy, 0], [0, 0, 1]])
    return rot_z @ rot_x @ rot_y


def realitycapture_to_json(image_filename_map: Dict[str, Path],
                           csv_filename: Path, output_dir: Path,
                           image_sizes: Optional[Dict[str, tuple]] = None
                           ) -> List[str]:
    """RealityCapture CSV export -> transforms.json
    (realitycapture_utils.py:45-107): 35mm-equivalent focal scaling,
    principal-point offsets, heading/pitch/roll euler poses.

    ``image_sizes``: optional {basename: (w, h)} to avoid re-reading images;
    falls back to cv2 when absent.
    """
    with open(csv_filename, encoding="utf-8") as f:
        rows = list(csv.DictReader(f))
    frames, missing = [], 0
    for row in rows:
        basename = row["#name"].rpartition(".")[0]
        if basename not in image_filename_map:
            missing += 1
            continue
        if image_sizes and basename in image_sizes:
            w, h = image_sizes[basename]
        else:
            import cv2

            img = cv2.imread(str(Path(output_dir)
                                 / image_filename_map[basename]))
            h, w = img.shape[:2]
        frame = {
            "file_path": image_filename_map[basename].as_posix(),
            "w": int(w), "h": int(h),
            "fl_x": float(row["f"]) * max(w, h) / 36,
            "fl_y": float(row["f"]) * max(w, h) / 36,
            "cx": float(row["px"]) / 36.0 + w / 2.0,
            "cy": float(row["py"]) / 36.0 + h / 2.0,
            "k1": row["k1"], "k2": row["k2"], "k3": row["k3"],
            "k4": row["k4"], "p1": row["t1"], "p2": row["t2"],
        }
        t = np.eye(4)
        t[:3, :3] = _rc_rotation(-float(row["heading"]),
                                 float(row["pitch"]), float(row["roll"]))
        t[:3, 3] = [float(row["x"]), float(row["y"]), float(row["alt"])]
        frame["transform_matrix"] = t.tolist()
        frames.append(frame)
    _write_transforms(output_dir, {"camera_model": "OPENCV",
                                   "orientation_override": "none",
                                   "frames": frames})
    out = [f"Final dataset is {len(frames)} frames."]
    if missing:
        out.insert(0, f"Missing image data for {missing} cameras.")
    return out


# ----------------------------------------------------- tool-dependent stubs ----


def hloc_to_json(*_, **__):
    """The reference's hloc path (hloc_utils.py) runs the external hloc
    toolbox (SuperPoint+SuperGlue matching); hloc is not installed in this
    environment."""
    raise RuntimeError(
        "hloc is not available in this environment; use the COLMAP path "
        "(scripts/process_data.py images-colmap) or install "
        "github.com/cvg/Hierarchical-Localization and re-run.")


def insta360_to_images(*_, **__):
    """The reference's insta360 path (insta360_utils.py) shells out to
    ffmpeg for dual-fisheye stitching; ffmpeg is not installed here."""
    raise RuntimeError(
        "insta360 conversion needs ffmpeg (dual-fisheye stitch), which is "
        "not available in this environment.")
