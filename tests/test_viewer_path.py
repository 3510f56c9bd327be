"""Camera-path capture/export loop (VERDICT r2 item 9).

The viewer exports a slerp-interpolated nerfstudio-format camera_path.json
from captured keyframes; scripts/render.py --traj filename consumes the
same schema (reference: /root/reference/scripts/render.py:47-128 +
the viewer_new camera-path editor).
"""

import numpy as np

from gfnerf_tpu.viewer.server import (
    _mat_from_quat,
    _quat_from_mat,
    build_camera_path,
    interpolate_keyframes,
)


def _lookat_pose(eye, target=(0.0, 0.0, 0.0), up=(0.0, 0.0, 1.0)):
    eye = np.asarray(eye, np.float64)
    f = np.asarray(target) - eye
    f /= np.linalg.norm(f)
    r = np.cross(f, up)
    r /= np.linalg.norm(r)
    u = np.cross(r, f)
    return np.concatenate(
        [np.stack([r, u, -f], axis=1), eye[:, None]], axis=1)


def test_quat_roundtrip(rng):
    for _ in range(20):
        q = rng.normal(size=4)
        q /= np.linalg.norm(q)
        m = _mat_from_quat(q)
        q2 = _quat_from_mat(m)
        if np.dot(q, q2) < 0:
            q2 = -q2
        np.testing.assert_allclose(q, q2, atol=1e-9)


def test_interpolation_hits_keyframes_and_stays_rigid():
    kf = np.stack([_lookat_pose([4, 0, 1]), _lookat_pose([0, 4, 2]),
                   _lookat_pose([-4, 0, 1])]).astype(np.float32)
    path = interpolate_keyframes(kf, 21)
    np.testing.assert_allclose(path[0], kf[0], atol=1e-5)
    np.testing.assert_allclose(path[10], kf[1], atol=1e-5)
    np.testing.assert_allclose(path[20], kf[2], atol=1e-5)
    for m in path:
        rtr = m[:3, :3].T @ m[:3, :3]
        np.testing.assert_allclose(rtr, np.eye(3), atol=1e-5)


def test_smooth_interpolation_hits_keyframes_and_differs_from_lerp():
    """Catmull-Rom smoothing (the reference editor's smoothness spline)
    still passes through every keyframe but bends between them."""
    kf = np.stack([_lookat_pose([4, 0, 1]), _lookat_pose([0, 4, 2]),
                   _lookat_pose([-4, 0, 1]), _lookat_pose([0, -4, 2])])
    from gfnerf_tpu.viewer.server import interpolate_scalars

    n = 31  # 3 segments x 10 + 1 -> keyframes at 0, 10, 20, 30
    smooth = interpolate_keyframes(kf, n, smooth=True)
    linear = interpolate_keyframes(kf, n, smooth=False)
    for f, k in ((0, 0), (10, 1), (20, 2), (30, 3)):
        np.testing.assert_allclose(smooth[f], kf[k], atol=1e-5)
    # midpoints bend off the chord
    assert np.abs(smooth[5][:, 3] - linear[5][:, 3]).max() > 1e-3
    for m in smooth:  # rotations stay rigid
        np.testing.assert_allclose(m[:3, :3].T @ m[:3, :3], np.eye(3),
                                   atol=1e-5)
    # matching scalar interpolation passes through keyframe values too
    fovs = interpolate_scalars([40.0, 60.0, 80.0, 50.0], n, smooth=True)
    np.testing.assert_allclose(fovs[[0, 10, 20, 30]], [40, 60, 80, 50],
                               atol=1e-4)


def test_loop_path_wraps_back_to_start():
    kf = np.stack([_lookat_pose([4, 0, 1]), _lookat_pose([0, 4, 2]),
                   _lookat_pose([-4, 0, 1]), _lookat_pose([0, -4, 2])])
    n = 40  # 4 segments x 10: keyframe k sits at frame 10k, no repeat
    path = interpolate_keyframes(kf, n, loop=True)
    for f, k in ((0, 0), (10, 1), (20, 2), (30, 3)):
        np.testing.assert_allclose(path[f], kf[k], atol=1e-5)
    # the tail approaches keyframe 0 again (closed cycle, tiling playback)
    tail_gap = np.abs(path[39][:, 3] - kf[0][:3, 3]).max()
    seg_step = np.abs(kf[1][:3, 3] - kf[0][:3, 3]).max() / 10
    assert tail_gap < 2 * seg_step


def test_camera_path_fov_smooth_loop_schema():
    kf = np.stack([_lookat_pose([4, 0, 1]), _lookat_pose([0, 4, 2]),
                   _lookat_pose([-4, 0, 1])])
    doc = build_camera_path(kf, 320, 240, fov_deg=60.0, fps=10, seconds=3.0,
                            fovs=[40.0, 70.0, 55.0], smooth=True, loop=True)
    assert doc["is_cycle"] and doc["smoothness_value"] == 1.0
    frame_fovs = [fr["fov"] for fr in doc["camera_path"]]
    assert abs(frame_fovs[0] - 40.0) < 1e-4
    assert min(frame_fovs) < 45.0 and max(frame_fovs) > 65.0
    # without fovs every frame carries the default
    doc2 = build_camera_path(kf, 320, 240, fov_deg=60.0, fps=10, seconds=2.0)
    assert all(fr["fov"] == 60.0 for fr in doc2["camera_path"])
    assert not doc2["is_cycle"] and doc2["smoothness_value"] == 0.0


def test_render_honors_request_fov_and_depth_range():
    """Per-request fov (the client's fov slider / per-keyframe fov) changes
    the rendered rays' focal; cmap_near/cmap_far pin the depth colormap."""
    from gfnerf_tpu.viewer.server import ViewerServer

    seen = {}

    class StubPipeline:
        def render_camera(self, cams, idx, step, downscale=1, **kw):
            seen["fx"] = float(cams.fx[0])
            h, w = 4, 6
            return {"rgb": np.zeros((h, w, 3), np.float32),
                    "depth": np.full((h, w, 1), 5.0, np.float32),
                    "accumulation": np.ones((h, w, 1), np.float32)}

    server = ViewerServer(pipeline=StubPipeline(), port=0)
    req = {"c2w": np.eye(4)[:3].tolist(), "width": 6, "height": 4}
    server._render({**req, "fov": 90.0})
    np.testing.assert_allclose(seen["fx"], 4 / 2 / np.tan(np.pi / 4),
                               rtol=1e-6)
    server._render(req)   # default fov 60
    np.testing.assert_allclose(seen["fx"], 4 / 2 / np.tan(np.pi / 6),
                               rtol=1e-6)
    # fixed colormap range: depth 5.0 in [0, 10] maps mid-scale (not the
    # autoscale degenerate all-one-color), and differs from autoscale
    png_fixed = server._render({**req, "output": "depth",
                                "cmap_near": 0.0, "cmap_far": 10.0})
    png_auto = server._render({**req, "output": "depth"})
    assert png_fixed != png_auto


def test_export_roundtrips_through_render_script():
    import importlib.util
    from pathlib import Path

    spec = importlib.util.spec_from_file_location(
        "render_script",
        Path(__file__).resolve().parent.parent / "scripts" / "render.py")
    render_script = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(render_script)

    kf = np.stack([_lookat_pose([4, 0, 1]), _lookat_pose([0, 4, 2])])
    doc = build_camera_path(kf, width=320, height=240, fov_deg=60.0,
                            fps=24, seconds=1.0)
    assert doc["render_width"] == 320 and doc["render_height"] == 240
    assert len(doc["camera_path"]) == 24
    assert all(len(fr["camera_to_world"]) == 16 for fr in doc["camera_path"])

    cams = render_script.cameras_from_camera_path(doc)
    assert cams.camera_to_worlds.shape == (24, 3, 4)
    np.testing.assert_allclose(cams.camera_to_worlds[0], kf[0], atol=1e-5)
    np.testing.assert_allclose(cams.camera_to_worlds[-1], kf[1], atol=1e-5)
    # fov -> focal conversion matches the export fov
    focal = 240 / 2 / np.tan(np.deg2rad(60.0) / 2)
    np.testing.assert_allclose(cams.fx[0], focal, rtol=1e-5)


def test_train_control_http_roundtrip():
    """Viewer training controls (reference viewer_utils.py:65-280): /status
    reflects published metrics; /control pause/resume/stop mutate the shared
    TrainControl the Trainer loop checks between steps."""
    import json
    import threading
    import time
    import urllib.request

    from gfnerf_tpu.viewer.server import TrainControl, ViewerServer

    ctl = TrainControl()
    ctl.publish(step=42, loss=0.5, psnr=21.3, rays_per_sec=1e4)
    server = ViewerServer(pipeline=None, port=0, control=ctl)

    # run the real HTTP server on an ephemeral port
    import http.server

    held = {}

    def run():
        # serve_forever binds to self.port; bind manually for port 0
        viewer = server

        class Handler(http.server.BaseHTTPRequestHandler):
            def log_message(self, *a):
                pass

            def do_GET(self):
                body = viewer._status()
                self.send_response(200)
                self.end_headers()
                self.wfile.write(body)

            def do_POST(self):
                n = int(self.headers.get("Content-Length", 0))
                req = json.loads(self.rfile.read(n))
                body = viewer._control(req)
                self.send_response(200)
                self.end_headers()
                self.wfile.write(body)

        httpd = http.server.HTTPServer(("127.0.0.1", 0), Handler)
        held["port"] = httpd.server_address[1]
        held["httpd"] = httpd
        httpd.serve_forever()

    t = threading.Thread(target=run, daemon=True)
    t.start()
    for _ in range(100):
        if "port" in held:
            break
        time.sleep(0.02)
    base = f"http://127.0.0.1:{held['port']}"

    s = json.loads(urllib.request.urlopen(base + "/status").read())
    assert s["training"] and s["step"] == 42 and not s["paused"]

    def post(action):
        req = urllib.request.Request(
            base + "/control", data=json.dumps({"action": action}).encode())
        return json.loads(urllib.request.urlopen(req).read())

    assert post("pause")["ok"] and ctl.paused
    # a paused control must block wait_if_paused until resumed
    unblocked = []

    def waiter():
        ctl.wait_if_paused(poll_s=0.01)
        unblocked.append(True)

    w = threading.Thread(target=waiter, daemon=True)
    w.start()
    time.sleep(0.08)
    assert not unblocked
    assert post("resume")["ok"] and not ctl.paused
    w.join(timeout=2)
    assert unblocked

    assert post("stop")["ok"] and ctl.stop and not ctl.paused
    s = json.loads(urllib.request.urlopen(base + "/status").read())
    assert s["stopping"]
    assert not post("bogus")["ok"]
    held["httpd"].shutdown()


def test_scene_and_export_endpoints():
    """Side-panel endpoints (reference viewer SidePanel scene tree + export
    tab): /scene degrades gracefully without a pipeline; /export generates
    the exporter CLI command for every mode."""
    import json

    from gfnerf_tpu.viewer.server import ViewerServer

    server = ViewerServer(pipeline=None, port=0)
    doc = json.loads(server._scene())
    assert doc["cameras"] == [] and doc["octree"] == {}

    for mode in ("pointcloud", "mesh", "tsdf", "textured", "poses"):
        r = json.loads(server._export_cmd({"mode": mode,
                                           "output_dir": "/tmp/exp"}))
        assert r["ok"], mode
        assert f"scripts/exporter.py {mode}" in r["command"]
        assert "--output-dir /tmp/exp" in r["command"]
        if mode in ("mesh", "tsdf", "textured"):
            assert "--resolution" in r["command"]
    bad = json.loads(server._export_cmd({"mode": "nope"}))
    assert not bad["ok"]


def test_status_history_and_render_output_selector():
    """r5 client features: bounded metric history for the sparklines, and
    the /render output selector (rgb | depth | accumulation) colormapped
    like trainer.eval_iteration's eval images."""
    import json

    from gfnerf_tpu.viewer.server import TrainControl, ViewerServer

    ctl = TrainControl()
    for i in range(TrainControl.HISTORY_LEN + 40):
        ctl.publish(step=i, loss=1.0 / (i + 1), rays_per_sec=100.0 + i)
    snap = ctl.snapshot(with_history=True)
    assert len(snap["history"]) == TrainControl.HISTORY_LEN
    assert snap["history"][-1]["step"] == TrainControl.HISTORY_LEN + 39
    # plain snapshot stays light
    assert "history" not in ctl.snapshot()

    class StubPipeline:
        def render_camera(self, cams, idx, step, downscale=1, **kw):
            h, w = 8, 12
            return {"rgb": np.full((h, w, 3), 0.5, np.float32),
                    "depth": np.linspace(0, 1, h * w, dtype=np.float32)
                        .reshape(h, w, 1),
                    "accumulation": np.ones((h, w, 1), np.float32)}

    server = ViewerServer(pipeline=StubPipeline(), port=0, control=ctl)
    body = server._status(with_history=True)
    assert len(json.loads(body)["history"]) == TrainControl.HISTORY_LEN

    req = {"c2w": np.eye(4)[:3].tolist(), "width": 12, "height": 8}
    pngs = {}
    for out in ("rgb", "depth", "accumulation"):
        png = server._render({**req, "output": out})
        assert png[:8] == b"\x89PNG\r\n\x1a\n"
        pngs[out] = png
    # depth colormap differs from the flat rgb render
    assert pngs["depth"] != pngs["rgb"]


def test_saved_path_roundtrip_and_name_sanitization(tmp_path):
    """LoadPathModal equivalent: a named export lands in
    save_dir/camera_paths/, shows up in the saved-path listing, fetches
    back byte-identical, and carries the editor-restore fields (keyframes
    matrices + orbit_states). Path names are sanitized to a bare stem."""
    import json

    from gfnerf_tpu.viewer.server import ViewerServer, _safe_path_name

    assert _safe_path_name("../../etc/passwd") == "etcpasswd"
    assert _safe_path_name("fly-through_2") == "fly-through_2"
    assert _safe_path_name(None) == "" and _safe_path_name(7) == ""

    server = ViewerServer(pipeline=None, port=0, save_dir=tmp_path)
    kf = np.stack([_lookat_pose([4, 0, 1]), _lookat_pose([0, 4, 2])])
    orbit = [{"az": 0.1, "el": 0.2, "radius": 4.0,
              "target": [0, 0, 0], "fov": 50.0},
             {"az": 1.1, "el": 0.3, "radius": 4.0,
              "target": [0, 0, 0], "fov": 70.0}]
    payload = server._camera_path(
        {"keyframes": kf.tolist(), "width": 320, "height": 240,
         "fovs": [50.0, 70.0], "orbit_states": orbit,
         "name": "fly/../one"})
    doc = json.loads(payload)
    # editor-restore fields present and consistent
    assert doc["orbit_states"] == orbit
    assert len(doc["keyframes"]) == 2
    m0 = np.asarray(doc["keyframes"][0]["matrix"]).reshape(4, 4)
    np.testing.assert_allclose(m0[:3], kf[0], atol=1e-6)
    assert doc["keyframes"][1]["fov"] == 70.0

    listed = json.loads(server._camera_paths_list())
    assert "flyone" in listed["paths"]          # sanitized stem
    assert "camera_path" in listed["paths"]     # the default save
    assert server._camera_path_get("fly/../one") == payload
    with np.testing.assert_raises(Exception):
        server._camera_path_get("missing")
