"""Minimal .npz dataparser — the test-fixture mechanism.

Equivalent of the reference's MinimalDataParser
(``nerfstudio/data/dataparsers/minimal_dataparser.py``), used by
``tests/test_train.py::test_simple_io``: a {split}.npz containing images and
camera arrays, so smoke tests need no real dataset on disk.

npz keys: images (N,H,W,3) uint8 or float, c2w (N,3,4), fx fy cx cy (N,),
optionally bounds (N,2).
"""

from __future__ import annotations

import dataclasses
from pathlib import Path

import numpy as np

from gfnerf_tpu.data.dataparsers.base import (
    CamerasHost,
    DataParser,
    DataparserOutputs,
    SceneBox,
)


@dataclasses.dataclass
class MinimalDataParserConfig:
    data: Path = Path(".")


class MinimalDataParser(DataParser):
    config: MinimalDataParserConfig

    def _generate_dataparser_outputs(self, split="train"):
        data_dir = Path(self.config.data)
        path = data_dir / f"{split}.npz"
        if not path.exists():
            path = data_dir / "train.npz"
        data = np.load(path, allow_pickle=True)
        images = data["images"]
        n, h, w = images.shape[:3]
        cameras = CamerasHost(
            camera_to_worlds=data["c2w"].astype(np.float32),
            fx=data["fx"].astype(np.float32),
            fy=data["fy"].astype(np.float32),
            cx=data["cx"].astype(np.float32),
            cy=data["cy"].astype(np.float32),
            width=np.full(n, w, np.int32),
            height=np.full(n, h, np.int32),
        )
        scene_box = SceneBox(aabb=np.array([[-4.0] * 3, [4.0] * 3], np.float32))
        return DataparserOutputs(
            image_filenames=[path] * n,  # images come from the npz, not disk
            cameras=cameras,
            scene_box=scene_box,
            metadata={
                "images_array": images,
                "road_masks_array": (data["road_masks"]
                                     if "road_masks" in data else None),
                "bounds": data["bounds"] if "bounds" in data else None,
                "global_image_indices": list(range(n)),
                "depth_filenames": None, "normal_filenames": None,
                "road_mask_filenames": None, "all_mask_filenames": None,
                "depth_unit_scale_factor": 1e-3,
            },
        )
