#!/usr/bin/env python
"""Train a registered method: ``python scripts/train.py gf-nerf --data ...``.

CLI-parity equivalent of the reference's ``scripts/train.py`` (tyro over the
method-config union, :243-252).  Multi-chip is a jax.sharding Mesh inside the
train step (see gfnerf_tpu/parallel) rather than the reference's
mp.spawn + NCCL worker launch (:90-214) — one process drives all local chips.

Extra args are dotted config overrides: ``--pipeline.model.n_blocks 4``.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def build_dataparser(name: str, data: Path, scale_factor: float = None):
    from gfnerf_tpu.data.dataparsers import build_dataparser as _build

    return _build(name, data, scale_factor)


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("method", help="registered method name (e.g. gf-nerf)")
    parser.add_argument("--data", type=Path, required=True)
    parser.add_argument("--dataparser", default="nerfstudio",
                        choices=["nerfstudio", "blender", "minimal",
                                 "instant-ngp", "dnerf", "scannet",
                                 "sdfstudio", "phototourism", "sitcoms3d",
                                 "arkitscenes", "nuscenes", "dycheck"])
    parser.add_argument("--output-dir", type=Path, default=Path("outputs"))
    parser.add_argument("--experiment-name", default=None)
    parser.add_argument("--max-num-iterations", type=int, default=None)
    parser.add_argument("--vis", default="tensorboard",
                        choices=["tensorboard", "wandb", "local",
                                 "viewer+tensorboard"])
    parser.add_argument("--load-dir", type=Path, default=None)
    parser.add_argument("--dataparser-scale-factor", type=float, default=None)
    parser.add_argument("--num-machines", type=int, default=1,
                        help="multi-host: total process count "
                             "(reference scripts/train.py:146-214)")
    parser.add_argument("--machine-rank", type=int, default=0)
    parser.add_argument("--dist-url", default="",
                        help="coordinator address host:port for "
                             "jax.distributed.initialize")
    parser.add_argument("--parallel-blocks", action="store_true",
                        help="train focal residual tables concurrently "
                             "across a (data, block) device mesh (needs "
                             ">= 2 devices; see parallel/sharding.py)")
    args, unknown = parser.parse_known_args(argv)

    if args.num_machines > 1:
        from gfnerf_tpu.parallel.sharding import initialize_multihost

        assert args.dist_url, "--dist-url required with --num-machines > 1"
        initialize_multihost(args.dist_url.replace("tcp://", ""),
                             args.num_machines, args.machine_rank)

    from gfnerf_tpu.configs.config_io import apply_override
    from gfnerf_tpu.configs.method_configs import discover_methods

    methods = discover_methods()
    if args.method not in methods:
        print(f"unknown method {args.method!r}; available: "
              f"{sorted(methods)}")
        sys.exit(1)
    config = methods[args.method]()
    config.data = args.data
    config.output_dir = args.output_dir
    config.vis = args.vis
    if args.experiment_name:
        config.experiment_name = args.experiment_name
    if args.max_num_iterations is not None:
        config.max_num_iterations = args.max_num_iterations
    if args.load_dir is not None:
        config.load_dir = args.load_dir
    if args.parallel_blocks:
        config.pipeline.parallel_blocks = True

    # dotted overrides: --a.b.c value
    i = 0
    while i < len(unknown):
        key = unknown[i]
        if not key.startswith("--"):
            raise SystemExit(f"unexpected argument {key!r}")
        apply_override(config, key[2:], unknown[i + 1])
        i += 2

    dataparser = build_dataparser(args.dataparser, args.data,
                                  args.dataparser_scale_factor)

    from gfnerf_tpu.engine.trainer import Trainer

    trainer = Trainer(config, dataparser)
    trainer.setup()
    trainer.train()
    print(f"training complete; outputs in {trainer.base_dir}")


if __name__ == "__main__":
    main()
