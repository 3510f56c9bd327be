"""Unit tests for framework components: samplers, colliders, camera
optimizer Lie maps, schedulers, config IO, COLMAP conversion, exporters."""

import json

import numpy as np
import jax
import jax.numpy as jnp


def test_spaced_sampler_statistics():
    """Uniform sampler covers [near, far] evenly (reference
    tests/model_components/test_ray_sampler.py pattern)."""
    from gfnerf_tpu.model_components.ray_samplers import spaced_sample

    nears = jnp.full((4, 1), 1.0)
    fars = jnp.full((4, 1), 5.0)
    bs, be, ss, se = spaced_sample(None, nears, fars, 32,
                                   train_stratified=False)
    assert float(bs.min()) >= 1.0 - 1e-5
    assert float(be.max()) <= 5.0 + 1e-5
    widths = np.asarray(be - bs)
    np.testing.assert_allclose(widths, widths[0, 0], rtol=1e-4)

    # lindisp: more samples near the camera
    bs2, be2, _, _ = spaced_sample(None, nears, fars, 32, spacing="lindisp",
                                   train_stratified=False)
    w2 = np.asarray(be2 - bs2)[0]
    assert w2[0] < w2[-1]


def test_pdf_sampler_concentrates_on_peak():
    from gfnerf_tpu.model_components.ray_samplers import (
        pdf_sample, spaced_sample)

    nears = jnp.zeros((2, 1))
    fars = jnp.ones((2, 1))
    _, _, ss, se = spaced_sample(None, nears, fars, 64,
                                 train_stratified=False)
    weights = jnp.zeros((2, 64)).at[:, 30:34].set(10.0)
    s2, e2 = pdf_sample(jax.random.PRNGKey(0), ss, se, weights, 32)
    mid = np.asarray((s2 + e2) / 2)
    frac_near_peak = ((mid > 0.4) & (mid < 0.6)).mean()
    assert frac_near_peak > 0.8


def test_colliders():
    from gfnerf_tpu.model_components.scene_colliders import (
        aabb_collider, near_far_collider, sphere_collider)

    o = jnp.array([[0.0, 0.0, -5.0]])
    d = jnp.array([[0.0, 0.0, 1.0]])
    n, f = near_far_collider(o, d, 0.1, 10.0)
    assert abs(float(n[0, 0]) - 0.1) < 1e-6 and float(f[0, 0]) == 10.0
    aabb = jnp.array([[-1.0, -1.0, -1.0], [1.0, 1.0, 1.0]])
    n, f = aabb_collider(o, d, aabb)
    np.testing.assert_allclose([float(n[0, 0]), float(f[0, 0])], [4.0, 6.0],
                               atol=1e-5)
    n, f = sphere_collider(o, d, jnp.zeros(3), 1.0)
    np.testing.assert_allclose([float(n[0, 0]), float(f[0, 0])], [4.0, 6.0],
                               atol=1e-5)


def test_camera_optimizer_exp_maps():
    from gfnerf_tpu.cameras.camera_optimizers import (
        CameraOptimizerConfig, apply_to_rays, exp_map_se3, exp_map_so3,
        init_pose_adjustment)

    # zero tangent -> identity
    R = np.asarray(exp_map_so3(jnp.zeros((1, 3))))[0]
    np.testing.assert_allclose(R, np.eye(3), atol=1e-6)
    # 90 deg about z
    R = np.asarray(exp_map_so3(jnp.array([[0.0, 0.0, np.pi / 2]])))[0]
    np.testing.assert_allclose(R @ [1, 0, 0], [0, 1, 0], atol=1e-6)
    R, t = exp_map_se3(jnp.array([[1.0, 0, 0, 0, 0, 0]]))
    np.testing.assert_allclose(np.asarray(t)[0], [1, 0, 0], atol=1e-6)

    cfg = CameraOptimizerConfig(mode="SO3xR3")
    adj = init_pose_adjustment(2).at[1, 0].set(0.5)
    o = jnp.zeros((2, 3))
    d = jnp.tile(jnp.array([[0.0, 0.0, 1.0]]), (2, 1))
    no, nd = apply_to_rays(cfg, adj, jnp.array([0, 1]), o, d)
    np.testing.assert_allclose(np.asarray(no)[1], [0.5, 0, 0], atol=1e-6)
    np.testing.assert_allclose(np.asarray(nd), np.asarray(d), atol=1e-6)


def test_gfnerf_scheduler_restarts():
    """LR decays over init then restarts at each focal split
    (schedulers.py:163-171)."""
    from gfnerf_tpu.engine.schedulers import (
        GFNerfExponentialDecaySchedulerConfig,
        gfnerf_exponential_decay_schedule)

    cfg = GFNerfExponentialDecaySchedulerConfig(
        lr_final=1e-4, max_steps=100, steps_perssampler_init=100,
        steps_per_split_dataset=50, n_split_dataset=2)
    sched = sched = gfnerf_exponential_decay_schedule(cfg, 1e-2)
    assert abs(float(sched(0)) - 1e-2) < 1e-6
    assert abs(float(sched(100)) - 1e-2) < 1e-6   # restart at split 0 start
    assert float(sched(149)) < float(sched(100))  # decays within split
    assert abs(float(sched(150)) - 1e-2) < 1e-6   # restart at split 1


def test_config_yaml_roundtrip():
    from gfnerf_tpu.configs.config_io import (apply_override,
                                              config_from_yaml,
                                              config_to_yaml)
    from gfnerf_tpu.configs.method_configs import gf_nerf_tiny_config

    cfg = gf_nerf_tiny_config()
    text = config_to_yaml(cfg)
    cfg2 = config_from_yaml(text)
    assert cfg2.method_name == cfg.method_name
    assert cfg2.pipeline.model.n_blocks == cfg.pipeline.model.n_blocks
    assert cfg2.pipeline.sampler.sample_l == cfg.pipeline.sampler.sample_l

    apply_override(cfg2, "pipeline.model.n_blocks", "5")
    assert cfg2.pipeline.model.n_blocks == 5
    apply_override(cfg2, "max-num-iterations", "77")
    assert cfg2.max_num_iterations == 77


def test_colmap_roundtrip(tmp_path):
    """Write a tiny COLMAP text model, convert, parse with the dataparser."""
    from gfnerf_tpu.process_data.colmap_utils import colmap_to_json

    model = tmp_path / "sparse"
    model.mkdir()
    (model / "cameras.txt").write_text(
        "# cameras\n1 PINHOLE 64 48 60.0 60.0 32.0 24.0\n")
    lines = ["# images"]
    for i in range(3):
        # identity quaternion, camera at (i, 0, 0)
        lines.append(f"{i+1} 1 0 0 0 {float(i)} 0 0 1 img_{i}.png")
        lines.append("")  # empty points2D line
    (model / "images.txt").write_text("\n".join(lines) + "\n")
    n = colmap_to_json(model, tmp_path)
    assert n == 3
    data = json.loads((tmp_path / "transforms.json").read_text())
    assert len(data["frames"]) == 3
    assert data["frames"][0]["fl_x"] == 60.0
    m = np.array(data["frames"][1]["transform_matrix"])
    assert m.shape == (4, 4)
    # camera center magnitude preserved by the convention change
    assert abs(np.linalg.norm(m[:3, 3]) - 1.0) < 1e-6


def test_ply_writer(tmp_path):
    from gfnerf_tpu.exporter.exporter import write_ply

    pts = np.random.rand(10, 3).astype(np.float32)
    cols = np.random.rand(10, 3).astype(np.float32)
    path = tmp_path / "test.ply"
    write_ply(path, pts, colors=cols)
    header = path.read_bytes()[:200].decode(errors="ignore")
    assert "element vertex 10" in header
    assert "property uchar red" in header


def test_nerf_frequency_encoding():
    from gfnerf_tpu.fields.encodings import nerf_frequency_encode

    x = jnp.array([[0.5, 0.25, 0.0]])
    enc = nerf_frequency_encode(x, num_frequencies=4, max_freq_exp=3,
                                include_input=True)
    assert enc.shape == (1, 3 + 3 * 4 * 2)
    assert np.isfinite(np.asarray(enc)).all()


def test_scene_contraction():
    from gfnerf_tpu.model_components.spatial_distortions import (
        scene_contraction)

    inside = jnp.array([[0.5, 0.0, 0.0]])
    np.testing.assert_allclose(np.asarray(scene_contraction(inside)),
                               np.asarray(inside), atol=1e-6)
    far = jnp.array([[100.0, 0.0, 0.0]])
    out = np.asarray(scene_contraction(far))
    assert np.abs(out).max() < 2.0
    assert out[0, 0] > 1.9


def test_undistortion_roundtrip():
    """Distort normalized coords with the OpenCV model, undistort, compare."""
    from gfnerf_tpu.utils.camera_utils import (
        radial_and_tangential_undistort_jax)

    rng = np.random.default_rng(0)
    xy = jnp.asarray(rng.uniform(-0.4, 0.4, (64, 2)), jnp.float32)
    params = jnp.tile(jnp.asarray([[0.1, -0.02, 0.0, 0.0, 0.001, -0.002]],
                                  jnp.float32), (64, 1))
    x, y = xy[:, 0], xy[:, 1]
    r2 = x * x + y * y
    k1, k2, p1, p2 = params[:, 0], params[:, 1], params[:, 4], params[:, 5]
    radial = 1 + k1 * r2 + k2 * r2 * r2
    xd = x * radial + 2 * p1 * x * y + p2 * (r2 + 2 * x * x)
    yd = y * radial + 2 * p2 * x * y + p1 * (r2 + 2 * y * y)
    und = radial_and_tangential_undistort_jax(
        jnp.stack([xd, yd], -1), params)
    np.testing.assert_allclose(np.asarray(und), np.asarray(xy), atol=1e-5)


def test_method_registry_complete():
    from gfnerf_tpu.configs.method_configs import discover_methods

    methods = discover_methods()
    for name in ("gf-nerf", "gf-nerf-perf", "nerfacto", "instant-ngp",
                 "mipnerf", "tensorf", "neus", "vanilla-nerf"):
        assert name in methods, name
        cfg = methods[name]()
        assert cfg.method_name == name


def test_model_forwards_cpu():
    """One tiny forward+grad step of each stock model (CPU)."""
    import jax

    from gfnerf_tpu.models import instant_ngp as ngp
    from gfnerf_tpu.models import nerfacto as nf
    from gfnerf_tpu.models import tensorf as trf

    rng = np.random.default_rng(0)
    o = jnp.asarray(rng.standard_normal((8, 3)) * 0.1 + [0, 0, 3], jnp.float32)
    d = jnp.asarray(rng.standard_normal((8, 3)), jnp.float32)
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    tgt = jnp.asarray(rng.random((8, 3)), jnp.float32)
    key = jax.random.PRNGKey(0)

    cfg = nf.NerfactoConfig(log2_hashmap_size=8, proposal_log2_hashmap_size=8,
                            num_proposal_samples=(16,), num_nerf_samples=8)
    p, s = nf.init_nerfacto_params(cfg)
    (l, _), g = jax.value_and_grad(
        lambda p: nf.nerfacto_loss(p, s, cfg, key, o, d,
                                   jnp.zeros(8, jnp.int32), tgt)[0],
        has_aux=False)(p), None
    assert np.isfinite(float(l[0] if isinstance(l, tuple) else l))

    mcfg = nf.MipNerfConfig(num_coarse_samples=8, num_importance_samples=8,
                            hidden_dim=16)
    p = nf.init_mipnerf_params(mcfg)
    l, _ = nf.mipnerf_loss(p, mcfg, key, o, d, tgt)
    assert np.isfinite(float(l))

    icfg = ngp.InstantNGPConfig(grid_resolution=16, num_samples=8,
                                log2_hashmap_size=8)
    p, s, ms = ngp.init_instant_ngp_params(icfg)
    l, _ = ngp.instant_ngp_loss(p, s, ms, icfg, key, o, d, tgt)
    assert np.isfinite(float(l))

    tcfg = trf.TensoRFConfig(resolution=16, num_coarse_samples=8,
                             num_fine_samples=8, hidden_dim=16)
    p = trf.init_tensorf_params(tcfg)
    l, _ = trf.tensorf_loss(p, tcfg, key, o, d, tgt)
    assert np.isfinite(float(l))

    # depth-nerfacto variant
    cfg2 = nf.NerfactoConfig(log2_hashmap_size=8,
                             proposal_log2_hashmap_size=8,
                             num_proposal_samples=(16,), num_nerf_samples=8)
    p2, s2 = nf.init_nerfacto_params(cfg2)
    depth = jnp.full((8, 1), 0.3)
    l, (losses, _) = nf.depth_nerfacto_loss(p2, s2, cfg2, key, o, d,
                                            jnp.zeros(8, jnp.int32), tgt,
                                            depth_gt=depth)
    assert "depth_loss" in losses and np.isfinite(float(l))


def test_blender_dataparser(tmp_path):
    from gfnerf_tpu.data.dataparsers.blender_parser import (
        BlenderDataParser, BlenderDataParserConfig)
    from gfnerf_tpu.utils.synthetic import make_blender_fixture

    path = make_blender_fixture(tmp_path / "scene", n_train=4, n_eval=2)
    parser = BlenderDataParser(BlenderDataParserConfig(data=path))
    train = parser.get_dataparser_outputs("train")
    val = parser.get_dataparser_outputs("val")
    assert len(train.cameras) == 4 and len(val.cameras) == 2
    from gfnerf_tpu.data.dataset import InputDataset

    ds = InputDataset(train)
    img = ds.get_image(0)
    assert img.shape == (30, 40, 3) and 0 <= img.min() and img.max() <= 1


def test_nerfstudio_dataparser(tmp_path):
    """transforms.json path incl. vertical orientation + auto-scale."""
    import json

    from gfnerf_tpu.data.dataparsers.nerfstudio_parser import (
        NerfstudioDataParser, NerfstudioDataParserConfig)
    from gfnerf_tpu.utils.synthetic import ring_cameras

    c2w, fx, fy, cx, cy, w, h = ring_cameras(6, img_wh=(32, 24))
    frames = []
    for i in range(6):
        m = np.eye(4)
        m[:3, :4] = c2w[i]
        frames.append({
            "file_path": f"images/f_{i}.png", "transform_matrix": m.tolist(),
            "fl_x": float(fx[i]), "fl_y": float(fy[i]),
            "cx": float(cx[i]), "cy": float(cy[i]), "w": 32, "h": 24,
        })
    (tmp_path / "transforms.json").write_text(json.dumps({"frames": frames}))
    parser = NerfstudioDataParser(NerfstudioDataParserConfig(
        data=tmp_path, scale_factor=10.0, orientation_method="vertical"))
    out = parser.get_dataparser_outputs("train")
    assert len(out.cameras) == 6
    # auto-scale x scale_factor: max |t| == 10
    assert abs(np.abs(out.cameras.camera_to_worlds[:, :, 3]).max() - 10.0) < 1e-3
    assert out.metadata["global_image_indices"] == list(range(6))


def test_dynamic_batch_retarget(tmp_path):
    """DynamicBatchPipeline equivalent: rays/batch follows the sample count
    toward the target, bucketed to powers of two."""
    import numpy as np

    from gfnerf_tpu.data.dataparsers.minimal_parser import (
        MinimalDataParser, MinimalDataParserConfig)
    from gfnerf_tpu.pipelines.vanilla_pipeline import VanillaPipelineConfig
    from gfnerf_tpu.utils.synthetic import make_synthetic_npz

    path = tmp_path / "scene"
    make_synthetic_npz(path, n_train=4, n_val=1, img_wh=(16, 12))
    cfg = VanillaPipelineConfig(model_kind="instant-ngp",
                                train_num_rays_per_batch=512,
                                dynamic_batch=True,
                                target_num_samples=1 << 14)
    cfg.instant_ngp.num_samples = 32
    cfg.instant_ngp.grid_resolution = 16
    cfg.instant_ngp.log2_hashmap_size = 10
    parser = MinimalDataParser(MinimalDataParserConfig(data=path))
    pipe = cfg.build(parser, tmp_path / "out")
    m = pipe.get_train_loss_dict(0)
    assert "num_rays_per_batch" in m
    assert pipe.pixel_sampler.num_rays_per_batch & (
        pipe.pixel_sampler.num_rays_per_batch - 1) == 0  # power of two
    assert pipe.pixel_sampler.num_rays_per_batch <= 512


def test_equirect_pixel_sampler(tmp_path):
    """Latitude distribution must follow sin(theta): mid rows sampled more
    than pole rows."""
    import numpy as np

    from gfnerf_tpu.data.dataset import ImageCache, InputDataset
    from gfnerf_tpu.data.pixel_samplers import EquirectangularPixelSampler
    from gfnerf_tpu.data.dataparsers.minimal_parser import (
        MinimalDataParser, MinimalDataParserConfig)
    from gfnerf_tpu.utils.synthetic import make_synthetic_npz

    path = tmp_path / "scene"
    make_synthetic_npz(path, n_train=2, n_val=1, img_wh=(64, 64))
    parser = MinimalDataParser(MinimalDataParserConfig(data=path))
    ds = InputDataset(parser.get_dataparser_outputs("train"))
    cache = ImageCache(ds, seed=0)
    s = EquirectangularPixelSampler(20000, seed=0)
    idx = s.sample_indices(cache)
    ys = idx[:, 1]
    h = 64
    pole = np.sum((ys < h // 8) | (ys >= h - h // 8))
    mid = np.sum((ys >= 3 * h // 8) & (ys < 5 * h // 8))
    assert mid > 2 * pole
    assert ys.min() >= 0 and ys.max() < h


def test_auto_sample_l_calibration():
    """A too-fine sample_l must be grown until the slot budget spans the
    scene (QUALITY.md finding 3: uncalibrated marches truncate near the
    camera and the model memorizes fog)."""
    import numpy as np

    from gfnerf_tpu.sampler.manager import (PersSamplerManager,
                                            PersSamplerManagerConfig)
    from tests.conftest import make_ring_cameras

    c2w, intri = make_ring_cameras(16, radius=4.0, img_wh=(32, 24))
    bounds = np.tile(np.array([[0.01, 50.0]], np.float32), (16, 1))
    cfg = PersSamplerManagerConfig(
        max_samples=64, sample_l=1.0 / 1024, max_level=6, bbox_levels=6,
        n_rand_pts=512, vis_res_w=16, node_capacity=8192,
        auto_sample_l=True)
    mgr = PersSamplerManager(c2w, intri, bounds, cfg, 2, 10, 10)
    assert mgr.sampler_config.sample_l > 1.0 / 1024 * 1.5, (
        "calibration did not grow a truncating sample_l")
    # a generous sample_l is left alone
    cfg2 = PersSamplerManagerConfig(
        max_samples=1024, sample_l=1.0 / 8, max_level=6, bbox_levels=6,
        n_rand_pts=512, vis_res_w=16, node_capacity=8192,
        auto_sample_l=True)
    mgr2 = PersSamplerManager(c2w, intri, bounds, cfg2, 2, 10, 10)
    assert mgr2.sampler_config.sample_l == 1.0 / 8
