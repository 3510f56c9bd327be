"""Utils tests: pytree structs, colormaps, math, writer, camera rays."""

import numpy as np
import jax.numpy as jnp


def test_tree_slice_and_concat():
    """Pytree indexing semantics (the framework's answer to the reference's
    tensor_dataclass broadcast/index machinery, SURVEY.md §4)."""
    from gfnerf_tpu.cameras.rays import RayBundle
    from gfnerf_tpu.utils.structs import tree_concat, tree_slice

    rb = RayBundle(
        origins=jnp.ones((10, 3)),
        directions=jnp.ones((10, 3)),
        lookat_directions=jnp.ones((10, 3)),
        pixel_area=jnp.ones((10, 1)),
        camera_indices=jnp.zeros((10, 1), jnp.int32),
        rel_camera_indices=jnp.zeros((10, 1), jnp.int32),
    )
    sub = tree_slice(rb, slice(2, 5))
    assert sub.origins.shape == (3, 3)
    both = tree_concat([sub, sub])
    assert both.origins.shape == (6, 3)
    assert len(rb) == 10


def test_colormaps():
    from gfnerf_tpu.utils.colormaps import apply_colormap, apply_depth_colormap

    x = np.linspace(0, 1, 100).reshape(10, 10)
    img = apply_colormap(x)
    assert img.shape == (10, 10, 3)
    assert img.min() >= 0 and img.max() <= 1
    depth = np.random.rand(10, 10, 1)
    acc = np.ones((10, 10, 1))
    out = apply_depth_colormap(depth, acc)
    assert out.shape == (10, 10, 3)


def test_intersect_aabb():
    from gfnerf_tpu.utils.math import intersect_aabb

    o = jnp.array([[0.0, 0.0, -5.0], [10.0, 10.0, 10.0]])
    d = jnp.array([[0.0, 0.0, 1.0], [0.0, 0.0, 1.0]])
    aabb = jnp.array([[-1.0, -1.0, -1.0], [1.0, 1.0, 1.0]])
    tmin, tmax = intersect_aabb(o, d, aabb)
    np.testing.assert_allclose(np.asarray(tmin), [4.0, 1e10], rtol=1e-5)
    np.testing.assert_allclose(np.asarray(tmax), [6.0, 1e10], rtol=1e-5)


def test_writer_local(capsys):
    from gfnerf_tpu.utils.writer import EventWriter

    w = EventWriter("local", steps_per_log=1)
    w.put_scalar("loss", 1.25, 0)
    w.put_dict({"psnr": 30.0}, 0)
    w.flush(0)
    out = capsys.readouterr().out
    assert "loss" in out and "psnr" in out


def test_generate_rays_directions_unit_norm(ring_cameras):
    import jax.numpy as jnp

    from gfnerf_tpu.cameras.cameras import (Cameras, generate_rays,
                                            get_image_coords)

    c2w, intri = ring_cameras
    n = len(c2w)
    cams = Cameras(
        camera_to_worlds=jnp.asarray(c2w),
        fx=jnp.asarray(intri[:, 0, 0]), fy=jnp.asarray(intri[:, 1, 1]),
        cx=jnp.asarray(intri[:, 0, 2]), cy=jnp.asarray(intri[:, 1, 2]),
        width=jnp.full((n,), 64, jnp.int32),
        height=jnp.full((n,), 48, jnp.int32),
    )
    # grid centered at the principal point (cx=32, cy=24)
    coords = get_image_coords(8, 8) + np.array([24.0 - 4, 32.0 - 4])
    rays = generate_rays(cams, 0, jnp.asarray(coords))
    norms = np.linalg.norm(np.asarray(rays["directions"]), axis=-1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-5)
    # center pixel looks along -z of the camera (the lookat direction is +z)
    center = np.asarray(rays["directions"])[3, 3]
    lookat = np.asarray(rays["lookat_directions"])[0, 0]
    assert np.dot(center, -lookat) > 0.95
    assert np.asarray(rays["pixel_area"]).min() > 0


def test_edge_samples(ring_cameras):
    import jax

    from gfnerf_tpu.sampler.octree import construct_edge_pool
    from gfnerf_tpu.sampler.perssampler import get_edge_samples
    from tests.test_octree import build_test_tree

    tree = build_test_tree(ring_cameras)
    construct_edge_pool(tree)
    if len(tree.edge_t_idx) == 0:
        return
    pts, trans = get_edge_samples(
        jax.random.PRNGKey(0),
        jnp.asarray(tree.edge_t_idx), jnp.asarray(tree.edge_center),
        jnp.asarray(tree.edge_dirs), 64)
    assert pts.shape == (64, 2, 3)
    assert trans.shape == (64, 2)
    # both copies of each point are identical world positions
    np.testing.assert_allclose(np.asarray(pts[:, 0]), np.asarray(pts[:, 1]))


def test_fisheye_and_equirect_rays(ring_cameras):
    from gfnerf_tpu.cameras.cameras import (
        CAMERA_TYPE_EQUIRECTANGULAR, CAMERA_TYPE_FISHEYE, Cameras,
        generate_rays_multi)

    c2w, intri = ring_cameras
    n = len(c2w)
    for ctype in (CAMERA_TYPE_FISHEYE, CAMERA_TYPE_EQUIRECTANGULAR):
        cams = Cameras(
            camera_to_worlds=jnp.asarray(c2w),
            fx=jnp.asarray(intri[:, 0, 0]), fy=jnp.asarray(intri[:, 1, 1]),
            cx=jnp.asarray(intri[:, 0, 2]), cy=jnp.asarray(intri[:, 1, 2]),
            width=jnp.full((n,), 64, jnp.int32),
            height=jnp.full((n,), 48, jnp.int32),
            camera_type=ctype,
        )
        coords = jnp.asarray(
            np.stack([np.random.default_rng(0).uniform(0, 48, 16),
                      np.random.default_rng(1).uniform(0, 64, 16)], -1),
            jnp.float32)
        rays = generate_rays_multi(cams, jnp.zeros(16, jnp.int32), coords)
        d = np.asarray(rays["directions"])
        np.testing.assert_allclose(np.linalg.norm(d, axis=-1), 1.0, atol=1e-5)
    # equirect: left and right image borders map to (nearly) the same ray
    cams = Cameras(
        camera_to_worlds=jnp.asarray(c2w),
        fx=jnp.asarray(intri[:, 0, 0]), fy=jnp.asarray(intri[:, 1, 1]),
        cx=jnp.asarray(intri[:, 0, 2]), cy=jnp.asarray(intri[:, 1, 2]),
        width=jnp.full((n,), 64, jnp.int32),
        height=jnp.full((n,), 48, jnp.int32),
        camera_type=CAMERA_TYPE_EQUIRECTANGULAR,
    )
    border = jnp.asarray([[24.0, 0.0], [24.0, 64.0]], jnp.float32)
    rays = generate_rays_multi(cams, jnp.zeros(2, jnp.int32), border)
    d = np.asarray(rays["directions"])
    np.testing.assert_allclose(d[0], d[1], atol=1e-4)


def test_vis_plots(tmp_path):
    """Ray/sample visualization dumps (utils/plots.py)."""
    import numpy as np

    from gfnerf_tpu.utils.plots import vis_rays_obj, vis_samples_ply

    rng = np.random.default_rng(0)
    o = rng.standard_normal((10, 3)).astype(np.float32)
    d = rng.standard_normal((10, 3)).astype(np.float32)
    n = vis_rays_obj(o, d, tmp_path / "rays.obj")
    assert n == 10
    txt = (tmp_path / "rays.obj").read_text()
    assert txt.count("\nl ") == 10 and txt.startswith("v ")

    pts = rng.standard_normal((50, 3))
    vals = rng.random(50)
    valid = np.ones(50, bool)
    valid[::5] = False
    k = vis_samples_ply(pts, vals, valid, tmp_path / "s.ply")
    assert k == 40
    assert "element vertex 40" in (tmp_path / "s.ply").read_text()


def test_smooth_scene_variant():
    """Band-limited GT variant (QUALITY.md findings 5-7): smooth must
    change the ground texture (no hard checker) and supersampling must
    box-average exactly."""
    import numpy as np

    from gfnerf_tpu.utils.synthetic import render_textured_scene, ring_cameras

    c2w, fx, fy, cx, cy, w, h = ring_cameras(2, img_wh=(64, 48))
    hard = render_textured_scene(c2w, fx, fy, cx, cy, w, h)
    smooth = render_textured_scene(c2w, fx, fy, cx, cy, w, h, smooth=True)
    assert hard.shape == smooth.shape == (2, 48, 64, 3)
    assert float(np.abs(hard - smooth).max()) > 0.05
    ss = render_textured_scene(c2w, fx, fy, cx, cy, w, h, smooth=True,
                               supersample=2)
    big = render_textured_scene(c2w, fx * 2, fy * 2, cx * 2, cy * 2,
                                w * 2, h * 2, smooth=True)
    np.testing.assert_allclose(
        ss, big.reshape(2, 48, 2, 64, 2, 3).mean(axis=(2, 4)), atol=1e-6)
