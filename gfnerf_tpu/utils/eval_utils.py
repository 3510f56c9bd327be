"""Checkpoint-loading helpers for eval/render.

Port of ``nerfstudio/utils/eval_utils.py``: ``eval_setup`` loads the saved
``config.yml``, rebuilds the pipeline in test mode and restores the latest
checkpoint.
"""

from __future__ import annotations

from pathlib import Path


def eval_setup(config_path: Path, dataparser_name: str = None):
    """Returns (config, pipeline trainer) restored from a training run."""
    from gfnerf_tpu.configs.config_io import config_from_yaml
    from gfnerf_tpu.engine.trainer import Trainer

    config_path = Path(config_path)
    config = config_from_yaml(config_path.read_text())
    base_dir = config_path.parent
    config.load_dir = base_dir / "nerfstudio_models"
    # re-point outputs at the original run dir (timestamp already fixed)
    config.output_dir = base_dir.parent.parent.parent
    config.experiment_name = base_dir.parent.parent.name
    config.timestamp = base_dir.name

    import scripts.train as train_script

    name = dataparser_name or getattr(config, "dataparser_name", None)
    if name is None:
        # guess from data contents
        data = Path(config.data)
        if (data / "transforms.json").exists():
            name = "nerfstudio"
        elif (data / "transforms_train.json").exists():
            name = "blender"
        else:
            name = "minimal"
    dataparser = train_script.build_dataparser(name, Path(config.data))
    trainer = Trainer(config, dataparser)
    trainer.setup(test_mode="test")
    return config, trainer
