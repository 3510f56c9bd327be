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
    parser.add_argument("mode", choices=["pointcloud", "poses", "mesh",
                                         "tsdf", "texture"])
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
    elif args.mode == "tsdf":
        import numpy as np

        cams = pipeline.datamanager.train_dataparser_outputs.cameras \
            if hasattr(pipeline, "datamanager") \
            else pipeline.train_outputs.cameras
        aabb = np.array([[-4.0] * 3, [4.0] * 3], np.float64)
        n = exporter.export_tsdf_mesh(
            pipeline.render_camera, cams, aabb, args.resolution,
            args.output_dir / "tsdf_mesh.obj",
            downscale=args.downscale_factor, num_views=args.num_views)
        print(f"wrote TSDF mesh with {n} vertices")
    elif args.mode == "texture":
        import jax.numpy as jnp
        import numpy as np

        # mesh from density isosurface, then texture by rendering rays
        # toward each face (texture_utils.py role)
        mesh_path = args.output_dir / "mesh.obj"
        assert mesh_path.exists(), "run `exporter.py mesh` first"
        verts, faces = [], []
        for line in mesh_path.read_text().splitlines():
            t = line.split()
            if not t:
                continue
            if t[0] == "v":
                verts.append([float(x) for x in t[1:4]])
            elif t[0] == "f":
                faces.append([int(x.split("/")[0]) - 1 for x in t[1:]])
        verts = np.asarray(verts, np.float32)
        faces = np.asarray(faces, np.int64)

        def render_rays_fn(o, d):
            import jax

            outs = []
            chunk = 4096
            for s in range(0, len(o), chunk):
                e = min(s + chunk, len(o))
                ro = jnp.asarray(o[s:e], jnp.float32)
                rd = jnp.asarray(d[s:e], jnp.float32)
                pad = chunk - (e - s)
                if pad:
                    ro = jnp.concatenate([ro, jnp.tile(ro[-1:], (pad, 1))])
                    rd = jnp.concatenate([rd, jnp.tile(rd[-1:], (pad, 1))])
                if hasattr(pipeline, "_render_chunk"):
                    out = pipeline._render_chunk(
                        pipeline.state.params, pipeline.statics,
                        pipeline.sampler.oct_dev, ro, rd,
                        jnp.asarray(0, jnp.int32), jnp.asarray(0, jnp.int32),
                        False)
                else:
                    out = pipeline._render_jit(
                        pipeline.params, pipeline.model_state,
                        jax.random.PRNGKey(0), ro, rd,
                        jnp.zeros((chunk,), jnp.int32))
                outs.append(np.asarray(out["rgb"])[: e - s])
            return np.concatenate(outs)

        out_path = exporter.export_textured_mesh(
            verts, faces, render_rays_fn, args.output_dir)
        print(f"wrote textured mesh to {out_path}")


if __name__ == "__main__":
    main()
