#!/usr/bin/env python
"""Compute eval metrics from a trained checkpoint.

Equivalent of the reference ``scripts/eval.py`` (ComputePSNR): loads
config.yml + latest checkpoint, runs the full eval set, writes a metrics
json with PSNR/SSIM + rays/sec + fps (eval.py:32-43).
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--load-config", type=Path, required=True)
    parser.add_argument("--output-path", type=Path,
                        default=Path("eval_output.json"))
    parser.add_argument("--dataparser", default=None)
    args = parser.parse_args(argv)

    from gfnerf_tpu.utils.eval_utils import eval_setup

    config, trainer = eval_setup(args.load_config, args.dataparser)
    step = int(trainer.pipeline.state.step)
    metrics = trainer.pipeline.get_average_eval_image_metrics(step)
    out = {
        "experiment_name": config.experiment_name,
        "method_name": config.method_name,
        "checkpoint": str(config.load_dir),
        "results": metrics,
    }
    args.output_path.parent.mkdir(parents=True, exist_ok=True)
    args.output_path.write_text(json.dumps(out, indent=2))
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
