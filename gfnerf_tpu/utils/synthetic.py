"""Synthetic test scenes (analytic renders, no assets needed).

The repo's equivalent of the reference's tiny fixture datasets
(``tests/data/lego_test``, ``tests/data/minimal_parser`` — SURVEY.md §4):
ring cameras around colored spheres, images rendered by direct ray-sphere
intersection with Lambert shading.  Deterministic, a few KB, and enough
structure for smoke-training to reduce loss and for eval PSNR to move.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

SPHERES = np.array([
    # x, y, z, radius, r, g, b
    [0.0, 0.0, 0.0, 0.9, 0.9, 0.2, 0.2],
    [1.2, 0.6, -0.2, 0.45, 0.2, 0.8, 0.3],
    [-1.0, -0.7, 0.3, 0.55, 0.2, 0.4, 0.9],
], dtype=np.float32)


def ring_cameras(n: int = 24, radius: float = 4.0, height: float = 1.2,
                 img_wh=(64, 48), focal: float = 55.0):
    c2ws = []
    for i in range(n):
        ang = 2 * np.pi * i / n
        pos = np.array([radius * np.cos(ang), radius * np.sin(ang), height])
        forward = -pos / np.linalg.norm(pos)
        up = np.array([0.0, 0.0, 1.0])
        right = np.cross(forward, up)
        right /= np.linalg.norm(right)
        true_up = np.cross(right, forward)
        rot = np.stack([right, true_up, -forward], axis=-1)  # z backward
        c2ws.append(np.concatenate([rot, pos[:, None]], axis=-1))
    c2w = np.stack(c2ws).astype(np.float32)
    w, h = img_wh
    fx = np.full(n, focal, np.float32)
    fy = np.full(n, focal, np.float32)
    cx = np.full(n, w / 2.0, np.float32)
    cy = np.full(n, h / 2.0, np.float32)
    return c2w, fx, fy, cx, cy, w, h


def render_spheres(c2w, fx, fy, cx, cy, w, h,
                   spheres: np.ndarray = SPHERES) -> np.ndarray:
    """Analytic render: nearest sphere hit, Lambert-shaded. (N, H, W, 3)."""
    n = len(c2w)
    yy, xx = np.meshgrid(np.arange(h) + 0.5, np.arange(w) + 0.5,
                         indexing="ij")
    imgs = np.zeros((n, h, w, 3), np.float32)
    light = np.array([0.4, 0.3, 0.85])
    light = light / np.linalg.norm(light)
    for i in range(n):
        d_cam = np.stack([(xx - cx[i]) / fx[i], -(yy - cy[i]) / fy[i],
                          -np.ones_like(xx)], axis=-1)
        d = d_cam @ c2w[i, :3, :3].T
        d = d / np.linalg.norm(d, axis=-1, keepdims=True)
        o = c2w[i, :3, 3]
        best_t = np.full((h, w), np.inf, np.float32)
        # sky-gradient background: an all-black background makes "predict
        # black everywhere" a gradient-dead attractor (sigmoid saturates to
        # exactly 0 and every gradient vanishes) — real captures are never
        # black, so neither are the fixtures
        sky_t = np.clip(d[..., 2] * 0.5 + 0.5, 0, 1)
        img = np.stack([0.35 + 0.25 * sky_t, 0.45 + 0.25 * sky_t,
                        0.55 + 0.35 * sky_t], axis=-1).astype(np.float32)
        for sx, sy, sz, r, cr, cg, cb in spheres:
            ctr = np.array([sx, sy, sz])
            oc = o - ctr
            b = np.einsum("hwc,c->hw", d, oc)
            c = float(oc @ oc - r * r)
            disc = b * b - c
            hit = disc > 0
            t = -b - np.sqrt(np.maximum(disc, 0))
            hit &= (t > 0) & (t < best_t)
            p = o + t[..., None] * d
            nrm = (p - ctr) / r
            lam = np.clip(np.einsum("hwc,c->hw", nrm, light), 0.1, 1.0)
            col = np.stack([cr * lam, cg * lam, cb * lam], axis=-1)
            img = np.where(hit[..., None], col, img)
            best_t = np.where(hit, t, best_t)
        imgs[i] = img
    return imgs


def render_textured_scene(c2w, fx, fy, cx, cy, w, h,
                          spheres: np.ndarray = SPHERES,
                          smooth: bool = False,
                          supersample: int = 1) -> np.ndarray:
    """Analytic render with high-frequency content: a checkered/noise ground
    plane at z=0, procedurally textured spheres, sky gradient.  The closest
    stand-in for a real capture obtainable in this offline environment —
    PSNR differences between models are driven by texture detail rather
    than flat shading. (N, H, W, 3).

    ``smooth``/``supersample``: the band-limited photo-consistent variant
    (QUALITY.md findings 5-6).  The default point-sampled hard-checker GT
    aliases across views at 160x120 — the resulting view-inconsistency puts
    a ~20.5 dB ceiling on EVERY model and makes residual-table capacity
    fit pure noise.  ``smooth`` replaces the checker with a sinusoidal
    quasi-checker, drops the unbounded-frequency uv-product texture term,
    and fades ground texture to its mean with distance (an analytic
    mipmap); ``supersample`` box-averages an ss x ss render (silhouette
    anti-aliasing).  Together the GT becomes representable by a
    one-ray-per-pixel renderer, so extra field capacity maps to real
    signal instead of aliasing noise."""
    if supersample > 1:
        ss = supersample
        big = render_textured_scene(
            c2w, fx * ss, fy * ss, cx * ss, cy * ss, w * ss, h * ss,
            spheres, smooth=smooth, supersample=1)
        return big.reshape(len(c2w), h, ss, w, ss, 3).mean(axis=(2, 4))
    n = len(c2w)
    yy, xx = np.meshgrid(np.arange(h) + 0.5, np.arange(w) + 0.5,
                         indexing="ij")
    imgs = np.zeros((n, h, w, 3), np.float32)
    light = np.array([0.4, 0.3, 0.85])
    light = light / np.linalg.norm(light)

    def tex(u, v):
        """Procedural multi-scale texture in [0, 1]."""
        t = (0.5 + 0.25 * np.sin(3.1 * u) * np.sin(2.7 * v)
             + 0.15 * np.sin(9.3 * u + 1.7) * np.cos(8.1 * v))
        if not smooth:
            # unbounded local frequency as |u*v| grows — deliberately
            # alias-prone detail for the hard variant
            t = t + 0.10 * np.sin(23.0 * u * v + 0.3)
        return np.clip(t, 0, 1)

    for i in range(n):
        d_cam = np.stack([(xx - cx[i]) / fx[i], -(yy - cy[i]) / fy[i],
                          -np.ones_like(xx)], axis=-1)
        d = d_cam @ c2w[i, :3, :3].T
        d = d / np.linalg.norm(d, axis=-1, keepdims=True)
        o = c2w[i, :3, 3]
        best_t = np.full((h, w), np.inf, np.float32)
        sky_t = np.clip(d[..., 2] * 0.5 + 0.5, 0, 1)
        img = np.stack([0.35 + 0.25 * sky_t, 0.45 + 0.25 * sky_t,
                        0.55 + 0.35 * sky_t], axis=-1).astype(np.float32)
        # ground plane z = -0.8 with checker x noise texture
        dz = d[..., 2]
        tg = (-0.8 - o[2]) / np.where(np.abs(dz) < 1e-6, 1e-6, dz)
        hit_g = (tg > 0) & (dz < 0)
        pg = o + tg[..., None] * d
        if smooth:
            # sinusoidal quasi-checker (no step edges) at the same period
            checker = (0.5 + 0.5 * np.sin(np.pi * pg[..., 0])
                       * np.sin(np.pi * pg[..., 1])).astype(np.float32)
        else:
            checker = ((np.floor(pg[..., 0] * 2) + np.floor(pg[..., 1] * 2))
                       % 2).astype(np.float32)
        gt_tex = tex(pg[..., 0] * 2.3, pg[..., 1] * 2.3)
        if smooth:
            # analytic mipmap: fade texture to its mean with ground
            # distance — far grazing-angle pixels see smooth color
            r2 = pg[..., 0] ** 2 + pg[..., 1] ** 2
            fade = np.exp(-r2 / (2.0 * 12.0 ** 2)).astype(np.float32)
            checker = 0.5 + (checker - 0.5) * fade
            gt_tex = 0.5 + (gt_tex - 0.5) * fade
        gcol = np.stack([
            0.25 + 0.35 * checker + 0.2 * gt_tex,
            0.22 + 0.28 * checker + 0.2 * gt_tex,
            0.18 + 0.22 * checker + 0.15 * gt_tex], axis=-1)
        img = np.where(hit_g[..., None], gcol, img)
        best_t = np.where(hit_g, tg, best_t)
        for sx, sy, sz, r, cr, cg, cb in spheres:
            ctr = np.array([sx, sy, sz])
            oc = o - ctr
            b = np.einsum("hwc,c->hw", d, oc)
            c = float(oc @ oc - r * r)
            disc = b * b - c
            hit = disc > 0
            t = -b - np.sqrt(np.maximum(disc, 0))
            hit &= (t > 0) & (t < best_t)
            p = o + t[..., None] * d
            nrm = (p - ctr) / r
            lam = np.clip(np.einsum("hwc,c->hw", nrm, light), 0.1, 1.0)
            u = np.arctan2(nrm[..., 1], nrm[..., 0]) * 4
            v = np.arccos(np.clip(nrm[..., 2], -1, 1)) * 4
            st = 0.55 + 0.45 * tex(u, v)
            col = np.stack([cr * lam * st, cg * lam * st, cb * lam * st],
                           axis=-1)
            img = np.where(hit[..., None], col, img)
            best_t = np.where(hit, t, best_t)
        imgs[i] = np.clip(img, 0, 1)
    return imgs


def make_synthetic_npz(path: Path, n_train: int = 24, n_val: int = 3,
                       img_wh=(64, 48), seed: int = 0):
    """Write train.npz / val.npz consumable by the minimal dataparser."""
    path = Path(path)
    path.mkdir(parents=True, exist_ok=True)
    total = n_train + n_val
    c2w, fx, fy, cx, cy, w, h = ring_cameras(total, img_wh=img_wh)
    imgs = render_spheres(c2w, fx, fy, cx, cy, w, h)
    rng = np.random.default_rng(seed)
    val_idx = rng.choice(total, n_val, replace=False)
    train_idx = np.setdiff1d(np.arange(total), val_idx)

    def save(split, idx):
        np.savez(
            path / f"{split}.npz",
            images=(imgs[idx] * 255).astype(np.uint8),
            c2w=c2w[idx], fx=fx[idx], fy=fy[idx], cx=cx[idx], cy=cy[idx],
            bounds=np.tile(np.array([[0.05, 20.0]], np.float32),
                           (len(idx), 1)),
        )

    save("train", train_idx)
    save("val", val_idx)
    return path


def make_blender_fixture(path: Path, n_train: int = 10, n_eval: int = 2,
                         img_wh=(40, 30)):
    """Write a blender-format dataset (transforms_{split}.json + pngs) from
    the synthetic renderer — exercises the blender dataparser end-to-end
    (the BASELINE configs[0] 'nerfacto on blender' shape)."""
    import json

    import imageio.v2 as imageio

    path = Path(path)
    total = n_train + n_eval
    c2w, fx, fy, cx, cy, w, h = ring_cameras(total, img_wh=img_wh)
    imgs = render_spheres(c2w, fx, fy, cx, cy, w, h)
    cam_angle_x = 2 * np.arctan(w / (2 * fx[0]))
    splits = (("train", 0, n_train), ("val", n_train, total),
              ("test", n_train, total))
    for split, lo, hi in splits:
        (path / split).mkdir(parents=True, exist_ok=True)
        frames = []
        for i in range(lo, hi):
            m = np.eye(4)
            m[:3, :4] = c2w[i]
            imageio.imwrite(path / split / f"r_{i}.png",
                            (imgs[i] * 255).astype(np.uint8))
            frames.append({"file_path": f"./{split}/r_{i}",
                           "transform_matrix": m.tolist()})
        (path / f"transforms_{split}.json").write_text(json.dumps(
            {"camera_angle_x": float(cam_angle_x), "frames": frames}))
    return path
