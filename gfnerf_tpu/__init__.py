"""gfnerf_tpu: a TPU-native JAX framework with the capabilities of GF-NeRF.

Re-designed from scratch for TPU (jax / XLA / Pallas / pjit): the reference
implementation (shaomq2187/GF-NeRF, a nerfstudio fork with F2-NeRF CUDA
bindings) is PyTorch + CUDA; this framework maps the same capabilities onto
TPU hardware:

- the perspective-octree ray sampler becomes a host-built SoA octree marched
  by a jittable (and Pallas-accelerated) point-location kernel,
- the anchored multi-resolution hash encoding becomes a pure-JAX/uint32 hash
  gather with an XLA scatter-add VJP (no fp16 atomics needed),
- the two-stage global/focal training keeps every focal block table resident
  in HBM with masked optax updates (no disk paging),
- data parallelism is a jax.sharding Mesh with XLA collectives (no NCCL/DDP).

See SURVEY.md at the repo root for the structural analysis of the reference.
"""

__version__ = "0.1.0"
