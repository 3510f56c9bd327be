#!/usr/bin/env python
"""Convert captured data into a trainable nerfstudio-format dataset.

Equivalent of the reference's ``scripts/process_data.py`` /
``nerfstudio/process_data/``: supports an existing COLMAP
reconstruction (``images-colmap``), video frame extraction (``video``, via
cv2), and the polycam / record3d / metashape / realitycapture capture
formats (gfnerf_tpu/process_data/converters.py).  Running COLMAP itself is
out of scope for this environment (no COLMAP binary); point
``--colmap-model-dir`` at a sparse model.  insta360 captures convert
natively from pre-decoded frames (``insta360-images``); hloc runs when the
hloc package is installed and raises with instructions otherwise.
"""

from __future__ import annotations

import argparse
import shutil
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("mode", choices=["images-colmap", "video",
                                         "polycam", "record3d", "metashape",
                                         "realitycapture", "insta360-images",
                                         "insta360-video", "hloc"])
    parser.add_argument("--data", type=Path, required=True,
                        help="image dir (images-colmap) or video file")
    parser.add_argument("--output-dir", type=Path, required=True)
    parser.add_argument("--colmap-model-dir", type=Path, default=None,
                        help="COLMAP sparse model dir (cameras/images .bin|.txt)")
    parser.add_argument("--num-frames-target", type=int, default=300)
    parser.add_argument("--metadata", type=Path, default=None,
                        help="record3d metadata.json / metashape cameras.xml"
                             " / realitycapture csv")
    parser.add_argument("--video-back", type=Path, default=None,
                        help="insta360-video: back-lens video (omit for "
                             "single-file dual-fisheye captures)")
    args = parser.parse_args(argv)

    out = args.output_dir
    out.mkdir(parents=True, exist_ok=True)

    if args.mode == "images-colmap":
        assert args.colmap_model_dir is not None, "--colmap-model-dir required"
        img_out = out / "images"
        if not img_out.exists():
            shutil.copytree(args.data, img_out)
        from gfnerf_tpu.process_data.colmap_utils import colmap_to_json

        n = colmap_to_json(args.colmap_model_dir, out)
        print(f"wrote transforms.json with {n} frames to {out}")
    elif args.mode == "polycam":
        from gfnerf_tpu.process_data.converters import polycam_to_json

        # polycam export layout: keyframes/images + keyframes/cameras
        img_dir = args.data / "keyframes" / "images"
        cam_dir = args.data / "keyframes" / "cameras"
        imgs = sorted(img_dir.iterdir())
        img_out = out / "images"
        img_out.mkdir(exist_ok=True)
        for i, f in enumerate(imgs):
            shutil.copy(f, img_out / f"frame_{i+1:05d}{f.suffix}")
        for line in polycam_to_json(imgs, cam_dir, out):
            print(line)
    elif args.mode == "record3d":
        import numpy as np

        from gfnerf_tpu.process_data.converters import record3d_to_json

        assert args.metadata is not None, "--metadata metadata.json required"
        img_dir = args.data
        imgs = sorted(img_dir.iterdir())
        img_out = out / "images"
        img_out.mkdir(exist_ok=True)
        rels = []
        for i, f in enumerate(imgs):
            dst = img_out / f"frame_{i+1:05d}{f.suffix}"
            shutil.copy(f, dst)
            rels.append(Path("images") / dst.name)
        n = record3d_to_json(rels, args.metadata, out,
                             np.arange(len(rels)))
        print(f"wrote transforms.json with {n} frames")
    elif args.mode == "metashape":
        from gfnerf_tpu.process_data.converters import metashape_to_json

        assert args.metadata is not None, "--metadata cameras.xml required"
        img_out = out / "images"
        if not img_out.exists():
            shutil.copytree(args.data, img_out)
        fmap = {f.stem: Path("images") / f.name
                for f in sorted(img_out.iterdir())}
        for line in metashape_to_json(fmap, args.metadata, out):
            print(line)
    elif args.mode == "realitycapture":
        from gfnerf_tpu.process_data.converters import realitycapture_to_json

        assert args.metadata is not None, "--metadata poses.csv required"
        img_out = out / "images"
        if not img_out.exists():
            shutil.copytree(args.data, img_out)
        fmap = {f.stem: Path("images") / f.name
                for f in sorted(img_out.iterdir())}
        for line in realitycapture_to_json(fmap, args.metadata, out):
            print(line)
    elif args.mode == "insta360-images":
        # pre-decoded insta360 frames: --data holds either front/ + back/
        # subdirs (two-file capture) or flat dual-fisheye frames
        # (single-file capture); the crop/rotate/numbering pipeline is
        # native numpy (converters.py; video decode would need ffmpeg)
        from gfnerf_tpu.process_data.converters import (
            insta360_frames_to_images, insta360_single_frames_to_images)

        img_out = out / "images"
        if (args.data / "front").is_dir():
            lines = insta360_frames_to_images(
                sorted((args.data / "front").iterdir()),
                sorted((args.data / "back").iterdir()),
                img_out, args.num_frames_target)
        else:
            lines = insta360_single_frames_to_images(
                sorted(p for p in args.data.iterdir() if p.is_file()),
                img_out, args.num_frames_target)
        for line in lines:
            print(line)
        print("now run COLMAP (fisheye camera model) on the frames, then "
              "re-run with mode=images-colmap")
    elif args.mode == "insta360-video":
        from gfnerf_tpu.process_data.converters import insta360_to_images

        for line in insta360_to_images(args.data, args.video_back,
                                       out / "images",
                                       args.num_frames_target):
            print(line)
        print("now run COLMAP (fisheye camera model) on the frames, then "
              "re-run with mode=images-colmap")
    elif args.mode == "hloc":
        from gfnerf_tpu.process_data.converters import hloc_to_json

        img_out = out / "images"
        if not img_out.exists():
            shutil.copytree(args.data, img_out)
        for line in hloc_to_json(img_out, out):
            print(line)
    elif args.mode == "video":
        import cv2

        cap = cv2.VideoCapture(str(args.data))
        total = int(cap.get(cv2.CAP_PROP_FRAME_COUNT))
        step = max(total // args.num_frames_target, 1)
        img_out = out / "images"
        img_out.mkdir(exist_ok=True)
        i = saved = 0
        while True:
            ok, frame = cap.read()
            if not ok:
                break
            if i % step == 0:
                cv2.imwrite(str(img_out / f"frame_{saved:05d}.png"), frame)
                saved += 1
            i += 1
        print(f"extracted {saved} frames to {img_out}; run COLMAP on them, "
              f"then re-run with mode=images-colmap")


if __name__ == "__main__":
    main()
