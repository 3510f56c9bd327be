"""Ray / sample / octree debug visualizations.

Role of the reference's ``gfnerf/plots.py`` (plotly ray+sample traces and
.obj dumps, :6-100).  plotly is not installed in this environment, so every
visualization is written as .obj line sets / .ply colored point clouds —
loadable in Blender/MeshLab and diffable in tests.  Octree and camera
wireframes live in ``sampler/octree.py`` (vis_octree_obj, vis_cameras_obj).
"""

from __future__ import annotations

from pathlib import Path

import numpy as np


def vis_rays_obj(rays_o: np.ndarray, rays_d: np.ndarray, output_path,
                 length: float = 5.0, max_rays: int = 256) -> int:
    """Ray segments as an .obj line set (origin -> origin + length*dir)."""
    o = np.asarray(rays_o)[:max_rays]
    d = np.asarray(rays_d)[:max_rays]
    e = o + length * d
    lines = []
    for p in np.concatenate([o, e]):
        lines.append(f"v {p[0]} {p[1]} {p[2]}")
    n = len(o)
    for i in range(n):
        lines.append(f"l {i + 1} {i + 1 + n}")
    Path(output_path).write_text("\n".join(lines) + "\n")
    return n


def vis_samples_ply(world_pts: np.ndarray, values: np.ndarray,
                    valid: np.ndarray, output_path,
                    max_points: int = 200_000) -> int:
    """Sample points as a binary-free ASCII .ply colored by ``values``
    (e.g. densities or weights); invalid samples are dropped."""
    pts = np.asarray(world_pts).reshape(-1, 3)
    val = np.asarray(values).reshape(-1)
    ok = np.asarray(valid).reshape(-1).astype(bool)
    pts, val = pts[ok], val[ok]
    if len(pts) > max_points:
        sel = np.linspace(0, len(pts) - 1, max_points).astype(int)
        pts, val = pts[sel], val[sel]
    v = val - val.min()
    v = v / (v.max() + 1e-12)
    # blue -> red colormap
    r = (255 * v).astype(np.uint8)
    b = (255 * (1 - v)).astype(np.uint8)
    g = np.zeros_like(r)
    header = "\n".join([
        "ply", "format ascii 1.0", f"element vertex {len(pts)}",
        "property float x", "property float y", "property float z",
        "property uchar red", "property uchar green", "property uchar blue",
        "end_header"])
    body = "\n".join(
        f"{p[0]} {p[1]} {p[2]} {cr} {cg} {cb}"
        for p, cr, cg, cb in zip(pts, r, g, b))
    Path(output_path).write_text(header + "\n" + body + "\n")
    return len(pts)


def vis_march_debug(oct_dev, rays_o, rays_d, sampler_cfg, output_dir,
                    fineness: float = 1.0) -> dict:
    """One-call march debugging: runs the sampler on the given rays and
    dumps rays.obj + samples.ply (+ per-ray sample-count stats)."""
    import jax.numpy as jnp

    from gfnerf_tpu.models.gfnerf import sample_rays

    output_dir = Path(output_dir)
    output_dir.mkdir(parents=True, exist_ok=True)
    r = len(rays_o)
    noise = jnp.ones((r, sampler_cfg.max_samples))
    samples = sample_rays(oct_dev, jnp.asarray(rays_o), jnp.asarray(rays_d),
                          noise, jnp.asarray(fineness), sampler_cfg)
    n_rays = vis_rays_obj(rays_o, rays_d, output_dir / "rays.obj")
    n_pts = vis_samples_ply(np.asarray(samples.world_pts),
                            np.asarray(samples.ts),
                            np.asarray(samples.valid),
                            output_dir / "samples.ply")
    nv = np.asarray(samples.num_valid)
    return {"rays": n_rays, "points": n_pts,
            "samples_per_ray_mean": float(nv.mean()),
            "samples_per_ray_max": int(nv.max())}
