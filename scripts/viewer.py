#!/usr/bin/env python
"""Serve the interactive web viewer for a trained checkpoint.

Substitute for the reference's `--vis viewer` websocket stack: loads the run
and serves an orbit-control client at http://localhost:<port>.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--load-config", type=Path, required=True)
    parser.add_argument("--port", type=int, default=7007)
    parser.add_argument("--host", default="127.0.0.1",
                        help="bind address; pass 0.0.0.0 to expose the "
                             "viewer (and its training controls) beyond "
                             "this host")
    parser.add_argument("--dataparser", default=None)
    args = parser.parse_args(argv)

    from gfnerf_tpu.utils.eval_utils import eval_setup
    from gfnerf_tpu.viewer.server import ViewerServer

    config, trainer = eval_setup(args.load_config, args.dataparser)
    pipeline = trainer.pipeline
    dm = getattr(pipeline, "datamanager", None)
    outputs = (dm.train_dataparser_outputs if dm is not None
               else pipeline.train_outputs)
    pos = outputs.cameras.camera_to_worlds[:, :, 3]
    radius = float(np.linalg.norm(pos, axis=1).mean())

    ViewerServer(pipeline, port=args.port, host=args.host,
                 default_radius=radius,
                 save_dir=args.load_config.parent).serve_forever()


if __name__ == "__main__":
    main()
