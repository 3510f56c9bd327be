#!/usr/bin/env python
"""Convert captured data into a trainable nerfstudio-format dataset.

Equivalent of the reference's ``scripts/process_data.py`` /
``nerfstudio/process_data/``: currently supports an existing COLMAP
reconstruction (``images-colmap``) and video frame extraction (``video``,
via cv2).  Running COLMAP itself is out of scope for this environment
(no COLMAP binary); point ``--colmap-model-dir`` at a sparse model.
"""

from __future__ import annotations

import argparse
import shutil
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("mode", choices=["images-colmap", "video"])
    parser.add_argument("--data", type=Path, required=True,
                        help="image dir (images-colmap) or video file")
    parser.add_argument("--output-dir", type=Path, required=True)
    parser.add_argument("--colmap-model-dir", type=Path, default=None,
                        help="COLMAP sparse model dir (cameras/images .bin|.txt)")
    parser.add_argument("--num-frames-target", type=int, default=300)
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
