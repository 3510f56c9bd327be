#!/usr/bin/env python
"""Export point clouds / meshes / camera poses from a trained checkpoint.

Equivalent of the reference's ``scripts/exporter.py`` (point cloud, mesh,
camera poses).
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("mode", choices=["pointcloud", "poses", "mesh"])
    parser.add_argument("--load-config", type=Path, required=True)
    parser.add_argument("--output-dir", type=Path, default=Path("exports"))
    parser.add_argument("--num-views", type=int, default=None)
    parser.add_argument("--downscale-factor", type=int, default=4)
    parser.add_argument("--resolution", type=int, default=128)
    parser.add_argument("--density-threshold", type=float, default=5.0)
    parser.add_argument("--dataparser", default=None)
    args = parser.parse_args(argv)

    from gfnerf_tpu.utils.eval_utils import eval_setup

    config, trainer = eval_setup(args.load_config, args.dataparser)
    pipeline = trainer.pipeline
    args.output_dir.mkdir(parents=True, exist_ok=True)

    from gfnerf_tpu.exporter import exporter

    if args.mode == "pointcloud":
        n = exporter.export_point_cloud(
            pipeline, args.output_dir / "point_cloud.ply",
            num_views=args.num_views, downscale=args.downscale_factor)
        print(f"wrote {n} points to {args.output_dir / 'point_cloud.ply'}")
    elif args.mode == "poses":
        n = exporter.export_camera_poses(
            pipeline, args.output_dir / "camera_poses.json")
        print(f"wrote {n} poses")
    elif args.mode == "mesh":
        import jax.numpy as jnp
        import numpy as np

        from gfnerf_tpu.fields.field import STAGE_INIT, field_density
        from gfnerf_tpu.sampler.perssampler import locate_points, warp_points

        p = pipeline

        def density_fn(pts):
            pts_j = jnp.asarray(pts, jnp.float32)
            oct_dev = p.sampler.oct_dev
            _, _, _, trans, _ = locate_points(
                oct_dev, pts_j, p.sampler.sampler_config.locate_iters)
            trc = jnp.clip(trans, 0, oct_dev.w2xz.shape[0] - 1)
            warp = warp_points(oct_dev, trc, pts_j)
            density, _ = field_density(
                p.state.params, p.statics, p.field_cfg, warp, trans,
                STAGE_INIT)
            return np.asarray(density)

        aabb = np.array([[-8.0, -8.0, -8.0], [8.0, 8.0, 8.0]], np.float32)
        n = exporter.export_marching_cubes_mesh(
            density_fn, aabb, args.resolution, args.density_threshold,
            args.output_dir / "mesh.obj")
        print(f"wrote mesh with {n} vertices")


if __name__ == "__main__":
    main()
