"""Training losses.

Ports of the reference's loss zoo (``nerfstudio/model_components/losses.py``)
used on the GF-NeRF path: Charbonnier (losses.py:713-725 region), S3IM
(losses.py:713-794), MSE, plus the proposal-model losses (interlevel,
distortion) for the nerfacto-class models.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def mse_loss(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean((pred - target) ** 2)


def charbonnier_loss(pred, target, eps: float = 1e-6) -> jnp.ndarray:
    """CharbonnierLoss with out_norm='b': sum sqrt((x-y)^2+eps^2) / batch."""
    loss = jnp.sum(jnp.sqrt((pred - target) ** 2 + eps * eps))
    return loss / pred.shape[0]


# ---------------------------------------------------------------- S3IM ----


def _gaussian_kernel(size: int, sigma: float = 1.5) -> np.ndarray:
    x = np.arange(size, dtype=np.float64)
    g = np.exp(-((x - size // 2) ** 2) / (2.0 * sigma * sigma))
    g = g / g.sum()
    k2 = np.outer(g, g).astype(np.float32)
    return k2


def _depthwise_conv(img: jnp.ndarray, kernel: jnp.ndarray, stride: int,
                    padding: int) -> jnp.ndarray:
    """img (1, C, H, W), kernel (k, k) applied per channel (groups=C)."""
    c = img.shape[1]
    k = jnp.asarray(kernel)[None, None, :, :]            # (1,1,k,k)
    k = jnp.tile(k, (c, 1, 1, 1))                        # (C,1,k,k)
    return jax.lax.conv_general_dilated(
        img, k,
        window_strides=(stride, stride),
        padding=[(padding, padding), (padding, padding)],
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        feature_group_count=c,
    )


def s3im_loss(
    rng: jax.Array,
    pred: jnp.ndarray,     # (R, 3)
    target: jnp.ndarray,   # (R, 3)
    kernel_size: int = 4,
    stride: int = 4,
    repeat_time: int = 10,
    patch_height: int = 32,
) -> jnp.ndarray:
    """Stochastic structural-similarity loss (S3IM, losses.py:713-794).

    Repeats the ray batch ``repeat_time`` times with random permutations
    (identity first), reshapes into a (patch_height x W) pseudo-image and
    returns 1 - SSIM.
    """
    n = pred.shape[0]
    keys = jax.random.split(rng, repeat_time - 1)
    idx = [jnp.arange(n)]
    for k in keys:
        idx.append(jax.random.permutation(k, n))
    res_index = jnp.concatenate(idx)
    tar = target[res_index]
    src = pred[res_index]
    # (R*rep, 3) -> (1, 3, patch_height, W)
    tar_patch = tar.T.reshape(1, 3, patch_height, -1)
    src_patch = src.T.reshape(1, 3, patch_height, -1)
    return 1.0 - _ssim(src_patch, tar_patch, kernel_size, stride)


def _ssim(img1: jnp.ndarray, img2: jnp.ndarray, kernel_size: int,
          stride: int) -> jnp.ndarray:
    kernel = _gaussian_kernel(kernel_size)
    pad = (kernel_size - 1) // 2
    conv = functools.partial(_depthwise_conv, kernel=kernel, stride=stride,
                             padding=pad)
    mu1 = conv(img1)
    mu2 = conv(img2)
    mu1_sq, mu2_sq, mu1_mu2 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    sigma1_sq = conv(img1 * img1) - mu1_sq
    sigma2_sq = conv(img2 * img2) - mu2_sq
    sigma12 = conv(img1 * img2) - mu1_mu2
    c1, c2 = 0.01 ** 2, 0.03 ** 2
    ssim_map = ((2 * mu1_mu2 + c1) * (2 * sigma12 + c2)) / (
        (mu1_sq + mu2_sq + c1) * (sigma1_sq + sigma2_sq + c2)
    )
    return jnp.mean(ssim_map)


# ------------------------------------------------- proposal-model losses ----


def interlevel_loss(weights_fine, spacing_starts_fine, spacing_ends_fine,
                    weights_coarse, spacing_starts_coarse, spacing_ends_coarse):
    """mip-NeRF-360 proposal loss (losses.py:154): penalize coarse weights
    that underestimate the enclosed fine weights. Histogram outer bound."""
    # fine bins
    c = spacing_starts_coarse
    cd = spacing_ends_coarse
    w = weights_coarse
    f_start = spacing_starts_fine
    f_end = spacing_ends_fine
    wf = weights_fine
    wf = jax.lax.stop_gradient(wf)
    f_start_sg = jax.lax.stop_gradient(f_start)
    f_end_sg = jax.lax.stop_gradient(f_end)

    # For each coarse bin, sum of fine weights whose interval overlaps it.
    # (R, Sc, Sf) overlap mask
    overlap = (f_end_sg[:, None, :] > c[:, :, None]) & (
        f_start_sg[:, None, :] < cd[:, :, None]
    )
    inner = jnp.sum(wf[:, None, :] * overlap, axis=-1)
    return jnp.mean(jnp.clip(inner - w, 0.0) ** 2 / (w + 1e-7))


def distortion_loss(weights, spacing_starts, spacing_ends):
    """mip-NeRF-360 distortion regularizer (losses.py:186) on normalized bins."""
    mid = (spacing_starts + spacing_ends) / 2.0
    dist = jnp.abs(mid[..., :, None] - mid[..., None, :])
    inter = jnp.sum(weights[..., :, None] * weights[..., None, :] * dist,
                    axis=(-1, -2))
    intra = jnp.sum(weights ** 2 * (spacing_ends - spacing_starts), axis=-1) / 3.0
    return jnp.mean(inter + intra)


# --------------------------------------------------- depth / normal losses ----


def ds_nerf_depth_loss(weights, termination_depth, steps, lengths,
                       sigma: float = 0.01):
    """DS-NeRF depth log-likelihood (losses.py DepthLossType.DS_NERF)."""
    depth_mask = termination_depth > 0
    loss = -jnp.log(weights + 1e-7) * jnp.exp(
        -((steps - termination_depth[:, None]) ** 2) / (2 * sigma)
    ) * lengths
    loss = jnp.sum(loss, axis=-1) * depth_mask[..., 0]
    return jnp.mean(loss)


def scale_and_shift_invariant_depth_loss(prediction, target, mask):
    """MiDaS-style scale/shift-invariant MSE (losses.py:685,
    ScaleAndShiftInvariantLoss with alpha=0): solve per-image scale+shift in
    closed form, then masked MSE. prediction/target/mask: (B, H, W)."""
    a00 = jnp.sum(mask * prediction * prediction, axis=(1, 2))
    a01 = jnp.sum(mask * prediction, axis=(1, 2))
    a11 = jnp.sum(mask, axis=(1, 2))
    b0 = jnp.sum(mask * prediction * target, axis=(1, 2))
    b1 = jnp.sum(mask * target, axis=(1, 2))
    det = a00 * a11 - a01 * a01
    valid = det > 0
    scale = jnp.where(valid, (a11 * b0 - a01 * b1) / (det + 1e-12), 0.0)
    shift = jnp.where(valid, (-a01 * b0 + a00 * b1) / (det + 1e-12), 0.0)
    pred_ssi = scale[:, None, None] * prediction + shift[:, None, None]
    res = (pred_ssi - target) ** 2 * mask
    return jnp.sum(res) / jnp.maximum(jnp.sum(mask), 1.0)


def orientation_loss(weights, normals, view_dirs):
    """mip-NeRF-360 orientation regularizer (losses.py orientation_loss):
    penalize normals facing away from the camera."""
    w = jax.lax.stop_gradient(weights)
    n_dot_v = jnp.sum(normals * -view_dirs[:, None, :], axis=-1)
    return jnp.mean(jnp.sum(w * jnp.clip(-n_dot_v, 0.0) ** 2, axis=-1))


def pred_normal_loss(weights, normals, pred_normals):
    """Predicted-vs-density-gradient normal consistency (losses.py
    pred_normal_loss)."""
    w = jax.lax.stop_gradient(weights)
    return jnp.mean(jnp.sum(
        w * (1.0 - jnp.sum(normals * pred_normals, axis=-1)), axis=-1))


def tv_edge_loss(field_fn, edge_pts, edge_trans):
    """Total-variation loss over octree-leaf boundary samples (the reference's
    GetEdgeSamples mechanism, PersSampler_cuda.cu:479-516): the field should
    agree when a boundary point is queried through either adjacent warp."""
    fa = field_fn(edge_pts[:, 0], edge_trans[:, 0])
    fb = field_fn(edge_pts[:, 1], edge_trans[:, 1])
    return jnp.mean((fa - fb) ** 2)
