#!/usr/bin/env python
"""Render a camera trajectory from a trained checkpoint.

Equivalent of the reference ``scripts/render.py`` (RenderTrajectory,
:47-365): camera-path json / interpolated / spiral trajectories, optional
per-frame appearance ``embedding_indices`` override (:112-115), output as an
image directory or an mp4 (via imageio/cv2 instead of mediapy).
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def cameras_from_camera_path(path_json: dict):
    """nerfstudio camera_path.json -> CamerasHost."""
    from gfnerf_tpu.data.dataparsers.base import CamerasHost

    frames = path_json["camera_path"]
    h = int(path_json["render_height"])
    w = int(path_json["render_width"])
    c2ws, fovs = [], []
    for fr in frames:
        m = np.array(fr["camera_to_world"], dtype=np.float32).reshape(4, 4)
        c2ws.append(m[:3, :4])
        fovs.append(float(fr["fov"]))
    c2w = np.stack(c2ws)
    n = len(c2w)
    fov = np.asarray(fovs, np.float32)
    focal = h / 2.0 / np.tan(np.deg2rad(fov) / 2.0)
    return CamerasHost(
        camera_to_worlds=c2w,
        fx=focal, fy=focal,
        cx=np.full(n, w / 2.0, np.float32),
        cy=np.full(n, h / 2.0, np.float32),
        width=np.full(n, w, np.int32),
        height=np.full(n, h, np.int32),
    )


def spiral_cameras(cams, steps: int = 30, radius: float = 0.1,
                   rots: int = 2, zrate: float = 0.5):
    """Spiral trajectory around the first eval camera (reference
    nerfstudio/cameras/camera_paths.py:150-215): local circular offsets with
    a z oscillation, each looking at a point `focal` units down the start
    camera's -z axis, composed with the start camera's pose."""
    import numpy as np

    from gfnerf_tpu.data.dataparsers.base import CamerasHost

    def viewmatrix(lookdir, up, position):
        vec2 = lookdir / np.linalg.norm(lookdir)
        vec0 = np.cross(up, vec2)
        vec0 = vec0 / np.linalg.norm(vec0)
        vec1 = np.cross(vec2, vec0)
        vec1 = vec1 / np.linalg.norm(vec1)
        return np.stack([vec0, vec1, vec2, position], axis=1)

    c2w0 = np.asarray(cams.camera_to_worlds[0])
    up = c2w0[:3, 2]
    focal = float(min(cams.fx[0], cams.fy[0]))
    target = np.array([0.0, 0.0, -focal])
    c2wh0 = np.concatenate([c2w0, [[0, 0, 0, 1]]], axis=0)
    poses = []
    for theta in np.linspace(0.0, 2 * np.pi * rots, steps + 1)[:-1]:
        center = np.array([np.cos(theta), -np.sin(theta),
                           -np.sin(theta * zrate)]) * radius
        lookat = center - target
        local = viewmatrix(lookat, up, center)
        localh = np.concatenate([local, [[0, 0, 0, 1]]], axis=0)
        poses.append((c2wh0 @ localh)[:3, :4])
    n = len(poses)
    rep = lambda v: np.full(n, v)
    return CamerasHost(
        camera_to_worlds=np.stack(poses).astype(np.float32),
        fx=rep(float(cams.fx[0])), fy=rep(float(cams.fy[0])),
        cx=rep(float(cams.cx[0])), cy=rep(float(cams.cy[0])),
        width=np.full(n, int(cams.width[0]), np.int32),
        height=np.full(n, int(cams.height[0]), np.int32),
    )


def interpolate_cameras(cams, steps_per_transition: int = 10):
    """Interpolated trajectory through the eval cameras (render.py traj
    'interpolate')."""
    import dataclasses

    from scipy.spatial.transform import Rotation, Slerp

    n = len(cams)
    c2w = cams.camera_to_worlds
    out = []
    for i in range(n - 1):
        r = Rotation.from_matrix(np.stack([c2w[i, :3, :3], c2w[i + 1, :3, :3]]))
        slerp = Slerp([0, 1], r)
        for t in np.linspace(0, 1, steps_per_transition, endpoint=False):
            rot = slerp(t).as_matrix()
            pos = (1 - t) * c2w[i, :3, 3] + t * c2w[i + 1, :3, 3]
            out.append(np.concatenate([rot, pos[:, None]], axis=-1))
    m = len(out)
    rep = lambda a: np.repeat(a[:1], m, axis=0)
    return dataclasses.replace(
        cams[np.zeros(m, np.int64)],
        camera_to_worlds=np.stack(out).astype(np.float32),
    )


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--load-config", type=Path, required=True)
    parser.add_argument("--traj", default="spiral",
                        choices=["spiral", "interpolate", "filename"])
    parser.add_argument("--spiral-steps", type=int, default=30)
    parser.add_argument("--spiral-radius", type=float, default=0.1)
    parser.add_argument("--camera-path-filename", type=Path, default=None)
    parser.add_argument("--output-path", type=Path, default=Path("renders"))
    parser.add_argument("--output-format", default="images",
                        choices=["images", "video"])
    parser.add_argument("--downscale-factor", type=int, default=1)
    parser.add_argument("--embedding-indices", type=int, nargs="*",
                        default=None)
    parser.add_argument("--dataparser", default=None)
    parser.add_argument("--early-term", action="store_true",
                        help="two-phase early-termination rendering "
                             "(models/render_early.py): saturated rays skip "
                             "their tail samples; exact to --et-eps")
    parser.add_argument("--et-eps", type=float, default=None,
                        help="termination transmittance threshold "
                             "(default: pipeline config's 5e-3)")
    args = parser.parse_args(argv)

    from gfnerf_tpu.utils.eval_utils import eval_setup

    config, trainer = eval_setup(args.load_config, args.dataparser)
    pipeline = trainer.pipeline
    if args.early_term and hasattr(pipeline, "enable_early_term"):
        pipeline.enable_early_term(eps=args.et_eps)
    step = int(pipeline.state.step)

    if args.traj == "filename":
        assert args.camera_path_filename is not None
        path_json = json.loads(args.camera_path_filename.read_text())
        cams = cameras_from_camera_path(path_json)
    else:
        eval_cams = pipeline.datamanager.eval_dataparser_outputs.cameras
        if args.traj == "interpolate":
            cams = interpolate_cameras(eval_cams)
        else:
            cams = spiral_cameras(eval_cams, steps=args.spiral_steps,
                                  radius=args.spiral_radius)

    import imageio.v2 as imageio

    frames = []
    args.output_path.mkdir(parents=True, exist_ok=True)
    for i in range(len(cams)):
        rel = (args.embedding_indices[i % len(args.embedding_indices)]
               if args.embedding_indices else None)
        out = pipeline.render_camera(cams, i, step,
                                     downscale=args.downscale_factor,
                                     rel_camera_index=rel)
        rgb = (np.clip(out["rgb"], 0, 1) * 255).astype(np.uint8)
        if args.output_format == "images":
            imageio.imwrite(args.output_path / f"{i:05d}.png", rgb)
        else:
            frames.append(rgb)
        print(f"rendered frame {i + 1}/{len(cams)}")
    if args.output_format == "video":
        import cv2

        video_path = args.output_path / "render.mp4"
        h, w = frames[0].shape[:2]
        vw = cv2.VideoWriter(str(video_path),
                             cv2.VideoWriter_fourcc(*"mp4v"), 24, (w, h))
        for f in frames:
            vw.write(cv2.cvtColor(f, cv2.COLOR_RGB2BGR))
        vw.release()
        print(f"wrote {video_path}")


if __name__ == "__main__":
    main()
