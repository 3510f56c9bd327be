"""Perspective octree ray sampler — device side (jittable).

TPU-native replacement for the reference's CUDA sampling kernels
(``gfnerf/bindings/PtsSampler/PersSampler_cuda.cu``):

- ``GetSamples`` (cu:321-477): the reference runs a two-phase stack-DFS
  octree intersection kernel followed by a leaf-list ray march.  On TPU the
  stack DFS is replaced by *top-down point location*: every march step
  locates its point by descending the tree (a fixed-depth ``fori_loop`` of
  gathers), which (a) has no per-ray stack, (b) vectorizes across the whole
  ray batch on the VPU, and (c) skips empty space exactly (a missing-child
  octant cube is the empty region, since the builder does no path
  compression).  Sample emission matches the reference: warp-space step
  ``sample_l * noise / |J.d|`` scaled by distance (cu:263-276), the first
  point dropped (cu:277-291), deltas equal to the warp-space step, and
  quantized skipping across leaf gaps (cu:295-305).
- ``UpdateOctNodes`` (cu:518-677): per-(ray, node)-run max weight/alpha with
  per-ray relative thresholds, turned into scatter-max segment ops.
- fineness annealing ``UpdateRayMarch`` (PersSampler.cpp:958-967).

All shapes are static: rays (R,), samples (R, S) with validity masks, node
arrays padded to a fixed capacity so milestone tree rebuilds don't retrigger
retracing.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from gfnerf_tpu.cameras.rays import WarpedSamples
from gfnerf_tpu.sampler.octree import PersOctree
from gfnerf_tpu.utils.structs import dataclass, static_field

# occupancy-stat constants (PersSampler_cuda.cu:11-17)
OCC_WEIGHT_BASE = 512
ABS_WEIGHT_THRES = 0.01
REL_WEIGHT_THRES = 0.1
OCC_ALPHA_BASE = 32
ABS_ALPHA_THRES = 0.02
REL_ALPHA_THRES = 0.1
INIT_NODE_STAT = 1000  # PersSampler.h:14


@dataclass
class OctreeDevice:
    """HBM-resident octree SoA, padded to a static capacity."""

    centers: jnp.ndarray      # (C, 3) f32
    side_lens: jnp.ndarray    # (C,) f32
    childs: jnp.ndarray       # (C, 8) i32 (-1 none; padding rows all -1)
    is_leaf: jnp.ndarray      # (C,) bool (padding True)
    trans_idx: jnp.ndarray    # (C,) i32 (-1 invalid)
    block_idx: jnp.ndarray    # (C,) i32
    weight_stats: jnp.ndarray  # (C,) i32
    alpha_stats: jnp.ndarray   # (C,) i32
    visit_cnt: jnp.ndarray     # (C,) i32
    n_nodes: jnp.ndarray       # () i32
    # valid-leaf list for the vectorized march (node ids, -1 padded)
    leaf_idx: jnp.ndarray      # (Lcap,) i32
    n_leaves: jnp.ndarray      # () i32
    # tree cut for the hierarchical march (fast_march.py): every valid leaf
    # has exactly one ancestor-or-self in the cut; each cut node holds the
    # positions (into leaf_idx) of its <= CUT_F descendant leaves.  Rays
    # slab-test the cut first and only the leaf lists of the nearest
    # coarse_hits cut nodes — O(R x (Ccap + M*F)) instead of O(R x Lcap).
    cut_nodes: jnp.ndarray      # (Ccap,) i32 node ids, -1 pad
    cut_leaf_slots: jnp.ndarray  # (Ccap, CUT_F) i32 positions into leaf_idx
    # warp arrays (fixed size T after construction)
    w2xz: jnp.ndarray          # (T, 12, 2, 4) f32
    warp_weight: jnp.ndarray   # (T, 3, 12) f32
    # flat relayouts of the same tables for the hot warp/Jacobian paths:
    # (T, 12, 2, 4) rows tile terribly on TPU (minor dim 4 of a 128-lane
    # vreg) — gathering + computing through a flat (T, 96) row in
    # [j][i][k] order (j the homogeneous-coordinate index, i num/den,
    # k the 12 projections) keeps every slice lane-contiguous and runs the
    # gather ~3.7x faster (measured v5e; PERF_NOTES.md)
    w2xz_flat: jnp.ndarray     # (T, 96) f32 = transpose(w2xz, (0,3,2,1))
    warp_weight_flat: jnp.ndarray  # (T, 36) f32 = warp_weight.reshape
    t_center: jnp.ndarray      # (T, 3) f32
    t_dis_summary: jnp.ndarray  # (T,) f32


@dataclass
class SamplerConfig:
    """Static sampling hyper-parameters (gfnerf/perssampler.py:48-76)."""

    max_samples: int = static_field(default=1024)   # MAX_SAMPLE_PER_RAY
    sample_l: float = static_field(default=1.0 / 256)
    scale_by_dis: bool = static_field(default=True)
    global_near: float = static_field(default=0.01)
    global_far: float = static_field(default=1e8)
    locate_iters: int = static_field(default=24)    # >= max tree depth
    march: str = static_field(default="fast")       # "fast" | "scan"
    max_hits: int = static_field(default=64)        # leaf hits/ray (fast march)
    ray_chunk: int = static_field(default=1024)     # slab-test ray chunking
    # hierarchical march: slab-test the tree cut first and expand only the
    # nearest `coarse_hits` cut nodes' leaf lists (0 = brute-force over all
    # leaves).  Work per ray: Ccap + coarse_hits*CUT_F instead of Lcap.
    coarse_hits: int = static_field(default=0)


def leaf_capacity_for(n: int, minimum: int = 1024) -> int:
    cap = minimum
    while cap < n:
        cap *= 2
    return cap


CUT_F = 32  # max descendant leaves per tree-cut node


def build_tree_cut(tree: PersOctree, leaf_idx: np.ndarray,
                   f_max: int = CUT_F):
    """Tree cut for the hierarchical march: the shallowest antichain of
    nodes whose valid-leaf descendant counts are all <= f_max.

    Returns (cut_nodes (Ccap,) i32, cut_leaf_slots (Ccap, f_max) i32), both
    -1 padded; slots index into ``leaf_idx`` (the padded valid-leaf list).
    The reference has no equivalent — its stack-DFS kernel
    (PersSampler_cuda.cu:54-152) prunes per ray; on TPU the pruning must be
    a static two-phase filter instead.
    """
    slot_of_node = {int(n): i for i, n in enumerate(leaf_idx) if n >= 0}
    cut, lists = [], []

    def leaf_slots(node: int):
        """Slots of valid-leaf descendants (including node itself)."""
        if tree.is_leaf[node]:
            s = slot_of_node.get(node)
            return [s] if s is not None else []
        out = []
        for c in tree.childs[node]:
            if c >= 0:
                out.extend(leaf_slots(int(c)))
        return out

    def descend(node: int):
        slots = leaf_slots(node)
        if not slots:
            return
        if len(slots) <= f_max or tree.is_leaf[node]:
            cut.append(node)
            lists.append(slots)
        else:
            for c in tree.childs[node]:
                if c >= 0:
                    descend(int(c))

    import sys
    old_limit = sys.getrecursionlimit()
    sys.setrecursionlimit(max(old_limit, 10000))
    try:
        descend(0)
    finally:
        sys.setrecursionlimit(old_limit)
    ccap = leaf_capacity_for(max(len(cut), 1), minimum=128)
    cut_nodes = np.full(ccap, -1, np.int32)
    cut_slots = np.full((ccap, f_max), -1, np.int32)
    for i, (n, slots) in enumerate(zip(cut, lists)):
        cut_nodes[i] = n
        cut_slots[i, : len(slots)] = slots
    return cut_nodes, cut_slots


def octree_to_device(tree: PersOctree, capacity: int,
                     leaf_capacity: int | None = None) -> OctreeDevice:
    """Upload a host octree into padded device arrays."""
    m = tree.n_nodes
    assert m <= capacity, f"octree has {m} nodes > capacity {capacity}"

    valid_leaves = np.where(tree.is_leaf & (tree.trans_idx >= 0))[0].astype(
        np.int32)
    if leaf_capacity is None:
        leaf_capacity = leaf_capacity_for(len(valid_leaves))
    assert len(valid_leaves) <= leaf_capacity
    leaf_idx = np.full(leaf_capacity, -1, np.int32)
    leaf_idx[: len(valid_leaves)] = valid_leaves
    cut_nodes, cut_leaf_slots = build_tree_cut(tree, leaf_idx)

    def pad(arr, fill, dtype=None):
        arr = np.asarray(arr)
        out_shape = (capacity,) + arr.shape[1:]
        out = np.full(out_shape, fill, dtype=dtype or arr.dtype)
        out[:m] = arr
        return jnp.asarray(out)

    return OctreeDevice(
        leaf_idx=jnp.asarray(leaf_idx),
        n_leaves=jnp.asarray(len(valid_leaves), jnp.int32),
        cut_nodes=jnp.asarray(cut_nodes),
        cut_leaf_slots=jnp.asarray(cut_leaf_slots),
        centers=pad(tree.centers, 0.0),
        side_lens=pad(tree.side_lens, 1.0),
        childs=pad(tree.childs, -1),
        is_leaf=pad(tree.is_leaf, True),
        trans_idx=pad(tree.trans_idx, -1),
        block_idx=pad(tree.block_idx, -1),
        weight_stats=pad(tree.weight_stats.astype(np.int32), INIT_NODE_STAT),
        alpha_stats=pad(tree.alpha_stats.astype(np.int32), INIT_NODE_STAT),
        visit_cnt=pad(tree.visit_cnt.astype(np.int32), 0),
        n_nodes=jnp.asarray(m, jnp.int32),
        w2xz=jnp.asarray(tree.w2xz),
        warp_weight=jnp.asarray(tree.weight),
        w2xz_flat=jnp.asarray(
            np.transpose(np.asarray(tree.w2xz), (0, 3, 2, 1)).reshape(
                len(tree.w2xz), 96).copy()),
        warp_weight_flat=jnp.asarray(
            np.asarray(tree.weight).reshape(len(tree.weight), 36).copy()),
        t_center=jnp.asarray(tree.t_center),
        t_dis_summary=jnp.asarray(tree.t_dis_summary),
    )


def octree_from_device(oct: OctreeDevice, tree: PersOctree) -> PersOctree:
    """Pull the mutable device state (stats + invalidated trans) back to host."""
    import dataclasses as dc

    m = tree.n_nodes
    return dc.replace(
        tree,
        trans_idx=np.asarray(oct.trans_idx[:m], dtype=np.int32),
        weight_stats=np.asarray(oct.weight_stats[:m], dtype=np.int64),
        alpha_stats=np.asarray(oct.alpha_stats[:m], dtype=np.int64),
        visit_cnt=np.asarray(oct.visit_cnt[:m], dtype=np.int64),
    )


# ---------------------------------------------------------------- locate ----


def locate_points(oct: OctreeDevice, p: jnp.ndarray, locate_iters: int):
    """Top-down point location for a batch of points.

    p: (R, 3). Returns (node_idx (R,), cube_center (R,3), cube_side (R,),
    trans (R,), block (R,)).  When the descent hits a missing child, the
    returned cube is the (empty) octant cube and trans == -1.
    """
    r = p.shape[0]
    u = jnp.zeros((r,), jnp.int32)
    c = jnp.broadcast_to(oct.centers[0], (r, 3))
    s = jnp.full((r,), oct.side_lens[0])
    done = jnp.zeros((r,), bool)
    virt = jnp.zeros((r,), bool)

    def body(_, carry):
        u, c, s, done, virt = carry
        leaf = oct.is_leaf[u]
        bits = p >= c  # (R, 3)
        oct_id = (
            bits[:, 0].astype(jnp.int32) * 4
            + bits[:, 1].astype(jnp.int32) * 2
            + bits[:, 2].astype(jnp.int32)
        )
        child = oct.childs[u, oct_id]
        has_child = child >= 0
        descend = (~done) & (~leaf)
        offset = bits.astype(p.dtype) - 0.5
        c_new = c + s[:, None] * 0.5 * offset
        c = jnp.where(descend[:, None], c_new, c)
        s = jnp.where(descend, s * 0.5, s)
        u = jnp.where(descend & has_child, child, u)
        virt = virt | (descend & ~has_child)
        done = done | leaf | (descend & ~has_child)
        return u, c, s, done, virt

    u, c, s, done, virt = jax.lax.fori_loop(
        0, locate_iters, body, (u, c, s, done, virt)
    )
    trans = jnp.where(virt | ~oct.is_leaf[u], -1, oct.trans_idx[u])
    block = jnp.where(virt, -1, oct.block_idx[u])
    return u, c, s, trans, block


# ------------------------------------------------------------------ warp ----


def warp_points(oct: OctreeDevice, trans: jnp.ndarray, p: jnp.ndarray):
    """QueryFrameTransform (PersSampler_cuda.cu:155-170), batched.

    trans: (R,) clamped indices; p: (R, 3). Returns warped (R, 3).
    """
    g = oct.w2xz_flat[trans]           # (R, 96) [j][i][k] layout
    wf = oct.warp_weight_flat[trans]   # (R, 36) [c][k]
    ph = jnp.concatenate([p, jnp.ones_like(p[:, :1])], axis=-1)  # (R, 4)
    # lane-contiguous slices of the flat row; every op fuses into the
    # gather consumer (the structured (R, 12, 2, 4) layout tiles 4/128
    # lanes and ran ~3x slower — see OctreeDevice.w2xz_flat)
    a = sum(g[:, j * 24: j * 24 + 12] * ph[:, j: j + 1] for j in range(4))
    b = sum(g[:, j * 24 + 12: j * 24 + 24] * ph[:, j: j + 1]
            for j in range(4))
    vals = a / b                                     # (R, 12)
    return jnp.stack(
        [jnp.sum(wf[:, c * 12: (c + 1) * 12] * vals, axis=-1)
         for c in range(3)], axis=-1)                # (R, 3)


def warp_jacobian_dir(oct: OctreeDevice, trans: jnp.ndarray, p: jnp.ndarray,
                      d: jnp.ndarray):
    """||J(p) . d|| for the warp (QueryFrameTransformJac, cu:172-188)."""
    g = oct.w2xz_flat[trans]           # (R, 96) [j][i][k]
    wf = oct.warp_weight_flat[trans]   # (R, 36) [c][k]
    ph = jnp.concatenate([p, jnp.ones_like(p[:, :1])], axis=-1)
    a = sum(g[:, j * 24: j * 24 + 12] * ph[:, j: j + 1] for j in range(4))
    b = sum(g[:, j * 24 + 12: j * 24 + 24] * ph[:, j: j + 1]
            for j in range(4))
    # dv/dxyz_j = (1/b) * A_j - (a/b^2) * B_j with A_j/B_j the j < 3 slices;
    # proj = sum_j dv_j d_j folds into two lane-contiguous accumulations
    Ad = sum(g[:, j * 24: j * 24 + 12] * d[:, j: j + 1] for j in range(3))
    Bd = sum(g[:, j * 24 + 12: j * 24 + 24] * d[:, j: j + 1]
             for j in range(3))
    proj = Ad / b - (a / (b * b)) * Bd               # (R, 12)
    jd = [jnp.sum(wf[:, c * 12: (c + 1) * 12] * proj, axis=-1)
          for c in range(3)]
    return jnp.sqrt(jd[0] ** 2 + jd[1] ** 2 + jd[2] ** 2)


def _ray_aabb(o, d, center, side):
    """Slab test; returns (near, far). o,d,center (R,3), side (R,)."""
    hf = side[:, None] * 0.5
    inv = 1.0 / jnp.where(jnp.abs(d) < 1e-10, jnp.where(d >= 0, 1e-10, -1e-10), d)
    t0 = (center - hf - o) * inv
    t1 = (center + hf - o) * inv
    near = jnp.max(jnp.minimum(t0, t1), axis=-1)
    far = jnp.min(jnp.maximum(t0, t1), axis=-1)
    return near, far


# ------------------------------------------------------------- GetSamples ----


@functools.partial(jax.jit, static_argnames=("cfg",))
def get_samples(
    oct: OctreeDevice,
    rays_o: jnp.ndarray,   # (R, 3)
    rays_d: jnp.ndarray,   # (R, 3) (normalized inside)
    noise: jnp.ndarray,    # (R, S) per-sample march noise (already x fineness)
    cfg: SamplerConfig,
) -> WarpedSamples:
    """March rays through the octree, emitting warp-space samples.

    Equivalent of ``PersSampler::GetSamples`` (PersSampler_cuda.cu:321-477):
    fixed-shape (R, S) outputs with validity masks.  Iterations that cross
    empty regions consume a slot without emitting (the reference instead
    spends an inner while-loop; the distribution of emitted samples matches).
    """
    R, S = noise.shape
    d = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
    o = rays_o

    root_near, root_far = _ray_aabb(
        o, d,
        jnp.broadcast_to(oct.centers[0], o.shape),
        jnp.full((R,), oct.side_lens[0]),
    )
    t0 = jnp.maximum(root_near, cfg.global_near)
    alive0 = (root_near < root_far) & (root_far > cfg.global_near)

    def step(carry, noise_i):
        t, prev_step, first, alive, first_oct = carry
        p = o + t[:, None] * d
        u, cc, cs, trans, block = locate_points(oct, p, cfg.locate_iters)
        valid_leaf = trans >= 0
        trc = jnp.clip(trans, 0, oct.w2xz.shape[0] - 1)

        jnorm = warp_jacobian_dir(oct, trc, p, d) + 1e-6
        radius = jnp.linalg.norm(o - oct.t_center[trc], axis=-1) / oct.t_dis_summary[trc]
        radius = jnp.maximum(radius, 1.0)
        step_world = cfg.sample_l * noise_i / jnorm
        if cfg.scale_by_dis:
            step_world = step_world * radius

        emit = alive & valid_leaf & (~first)
        warp_p = warp_points(oct, trc, p)
        dt = step_world * jnorm          # warp-space delta (cu:285)

        # first valid-leaf entry distance (cu:229-234): the cube's entry t
        cube_near, cube_far = _ray_aabb(o, d, cc, cs)
        hit_first = alive & valid_leaf & (first_oct >= 1e8)
        first_oct = jnp.where(hit_first, jnp.maximum(cube_near, cfg.global_near),
                              first_oct)

        # advance: inside valid leaf -> one step; empty region -> quantized
        # skip past the cube exit (cu:295-305)
        exit_t = jnp.maximum(cube_far, t) + 1e-4 * cs
        q = jnp.maximum(jnp.ceil((exit_t - t) / jnp.maximum(prev_step, 1e-8)), 1.0)
        skip_t = jnp.where(prev_step > 0, t + prev_step * q, exit_t)
        t_next = jnp.where(valid_leaf, t + step_world, skip_t)

        prev_step = jnp.where(valid_leaf, step_world, prev_step)
        first = first & ~(alive & valid_leaf)
        alive = alive & (t_next < jnp.minimum(root_far, cfg.global_far))

        out = (p, warp_p, dt, t, trans, u, block, emit)
        return (t_next, prev_step, first, alive, first_oct), out

    init = (
        t0,
        jnp.zeros((R,)),
        jnp.ones((R,), bool),
        alive0,
        jnp.full((R,), 1e9),
    )
    (tN, _, _, _, first_oct), outs = jax.lax.scan(
        step, init, jnp.moveaxis(noise, 1, 0)
    )
    world_pts, warp_pts, dts, ts, trans, octi, block, emit = [
        jnp.moveaxis(x, 0, 1) for x in outs
    ]

    valid = emit
    zero3 = jnp.zeros_like(world_pts)
    return WarpedSamples(
        world_pts=jnp.where(valid[..., None], world_pts, zero3),
        warp_pts=jnp.where(valid[..., None], warp_pts, zero3),
        dists=jnp.where(valid, dts, 0.0),
        ts=jnp.where(valid, ts, 0.0),
        trans_idx=jnp.where(valid, trans, -1).astype(jnp.int32),
        oct_idx=jnp.where(valid, octi, -1).astype(jnp.int32),
        block_idx=jnp.where(valid, block, -1).astype(jnp.int32),
        valid=valid,
        num_valid=jnp.sum(valid, axis=-1).astype(jnp.int32),
        first_oct_dis=first_oct,
    )


# --------------------------------------------------------- occupancy stats ----


@jax.jit
def update_oct_nodes(
    oct: OctreeDevice,
    samples: WarpedSamples,
    weights: jnp.ndarray,   # (R, S)
    alphas: jnp.ndarray,    # (R, S)
) -> OctreeDevice:
    """Occupancy statistics update (UpdateOctNodes, cu:518-677).

    Per ray: thresholds rel/abs on the ray's max weight/alpha; per visited
    node: +BASE if any sample exceeded, else -1; EMA-like integer stats with
    clamping; nodes whose stats go negative get trans_idx = -1.
    """
    cap = oct.centers.shape[0]
    valid = samples.valid
    node = jnp.where(valid, samples.oct_idx, cap)  # out-of-range -> dropped
    w = jnp.where(valid, weights, 0.0)
    a = jnp.where(valid, alphas, 0.0)

    max_w = jnp.max(w, axis=-1, keepdims=True)
    max_a = jnp.max(a, axis=-1, keepdims=True)
    w_thres = jnp.minimum(max_w * REL_WEIGHT_THRES, ABS_WEIGHT_THRES)
    a_thres = jnp.minimum(max_a * REL_ALPHA_THRES, ABS_ALPHA_THRES)

    exceed_w = valid & (w > w_thres)
    exceed_a = valid & (a > a_thres)

    flat_node = node.reshape(-1)
    adder_w = jnp.full((cap,), -1, jnp.int32).at[flat_node].max(
        jnp.where(exceed_w, OCC_WEIGHT_BASE, -1).reshape(-1).astype(jnp.int32),
        mode="drop",
    )
    adder_a = jnp.full((cap,), -1, jnp.int32).at[flat_node].max(
        jnp.where(exceed_a, OCC_ALPHA_BASE, -1).reshape(-1).astype(jnp.int32),
        mode="drop",
    )
    mark = jnp.zeros((cap,), jnp.int32).at[flat_node].max(
        valid.reshape(-1).astype(jnp.int32), mode="drop"
    )

    # max run length per node (atomicMax(visit_cnt, cur_visit_cnt), cu:556):
    # running position within each same-node run, then scatter-max.
    S = valid.shape[1]
    pos = jnp.arange(S)[None, :]
    change = jnp.concatenate(
        [jnp.ones_like(node[:, :1], bool),
         node[:, 1:] != node[:, :-1]], axis=1)
    run_start = jax.lax.cummax(jnp.where(change, pos, -1), axis=1)
    run_pos = (pos - run_start + 1).astype(jnp.int32)
    visit_cnt = oct.visit_cnt.at[flat_node].max(
        jnp.where(valid, run_pos, 0).reshape(-1), mode="drop"
    )

    def update_stats(stats, adder):
        occ = (adder > 0).astype(jnp.int32)
        stats = jnp.maximum(stats, occ * adder)
        stats = stats + mark * (1 - occ) * adder
        return jnp.clip(stats, -100, 1 << 20)

    weight_stats = update_stats(oct.weight_stats, adder_w)
    alpha_stats = update_stats(oct.alpha_stats, adder_a)

    trans_idx = jnp.where(
        (weight_stats < 0) | (alpha_stats < 0), -1, oct.trans_idx
    )
    return oct.replace(
        weight_stats=weight_stats,
        alpha_stats=alpha_stats,
        visit_cnt=visit_cnt,
        trans_idx=trans_idx,
    )


def ray_march_fineness(cur_step: int, init_fineness: float = 16.0,
                       decay_end_iter: int = 10000) -> float:
    """Annealed march fineness (UpdateRayMarch, PersSampler.cpp:958-967)."""
    if cur_step >= decay_end_iter:
        return 1.0
    progress = float(cur_step) / float(decay_end_iter)
    return float(np.exp(np.log(init_fineness) * (1.0 - progress)))


def get_edge_samples(rng, edge_t_idx: jnp.ndarray, edge_center: jnp.ndarray,
                     edge_dirs: jnp.ndarray, n_pts: int):
    """Sample points on octree-leaf boundary faces for the TV loss.

    Port of ``PersSampler::GetEdgeSamples`` (PersSampler_cuda.cu:479-516):
    random face-adjacency edges, random (u, v) in [-1, 1]^2 on the shared
    face, returning each point twice with the two adjacent warp anchors.

    edge arrays come from the host octree builder (construct_edge_pool).
    Returns (points (n_pts, 2, 3) world space, trans (n_pts, 2) int32).
    """
    import jax

    n_edges = edge_t_idx.shape[0]
    k1, k2 = jax.random.split(rng)
    eidx = jax.random.randint(k1, (n_pts,), 0, jnp.maximum(n_edges, 1))
    coord = jax.random.uniform(k2, (n_pts, 2)) * 2.0 - 1.0
    center = edge_center[eidx]                  # (n, 3)
    dirs = edge_dirs[eidx]                      # (n, 2, 3)
    pts = (center + dirs[:, 0] * coord[:, 0:1]
           + dirs[:, 1] * coord[:, 1:2])
    pts2 = jnp.stack([pts, pts], axis=1)
    return pts2, edge_t_idx[eidx]
