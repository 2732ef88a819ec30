"""Checkpoint IO: flax msgpack files + the reference's naming conventions.

The reference stores torch state dicts as ``last_model.pt`` /
``best_ema_inference_epoch_model.pt`` next to a fully-resolved
``model_parameters.yml`` (utils/utils.py:249-343, inference.py:76).  We keep
the same directory layout with ``.msgpack`` files: variables (params +
batch_stats) serialized with flax, optimizer/EMA state alongside for
training resume.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Any, Dict, Optional

import yaml
from flax import serialization

from ..models.score_model import ScoreModelConfig

LAST_MODEL = "last_model.msgpack"
BEST_EMA_MODEL = "best_ema_inference_epoch_model.msgpack"
MODEL_PARAMS_YAML = "model_parameters.yml"


def save_variables(variables: Any, path: str) -> None:
    # write-to-temp + atomic rename: watchers/snapshotters read this file
    # concurrently (and a container recycle can land mid-write), so the
    # visible file must always be a complete checkpoint
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(serialization.to_bytes(variables))
    os.replace(tmp, path)


def _migrate_fc_params(node: Any) -> Any:
    """Checkpoint-format shim: the channelwise DenseTPConv edge-MLP was
    refactored from a nested ``fc`` MLP submodule (Dense_0/Dense_1) to
    explicit ``fc_w1/fc_b1/fc_w2/fc_b2`` params; rename old-format keys in
    place so pre-refactor checkpoints keep restoring."""
    if not isinstance(node, dict):
        return node
    out = {}
    for k, v in node.items():
        if (
            k == "fc"
            and isinstance(v, dict)
            and "Dense_0" in v
            and "fc_w1" not in node
        ):
            out["fc_w1"] = v["Dense_0"].get("kernel")
            out["fc_b1"] = v["Dense_0"].get("bias")
            out["fc_w2"] = v["Dense_1"].get("kernel")
            out["fc_b2"] = v["Dense_1"].get("bias")
        else:
            out[k] = _migrate_fc_params(v)
    return out


def load_variables(template: Any, path: str) -> Any:
    with open(path, "rb") as f:
        raw = f.read()
    try:
        return serialization.from_bytes(template, raw)
    except (KeyError, ValueError):
        state = serialization.msgpack_restore(raw)
        return serialization.from_state_dict(template, _migrate_fc_params(state))


def save_config_yaml(cfg: ScoreModelConfig, model_dir: str, extra: Optional[Dict] = None) -> str:
    """Persist the resolved config with reference-compatible field names."""
    os.makedirs(model_dir, exist_ok=True)
    d = dataclasses.asdict(cfg)
    d["clash_cutoff"] = list(d["clash_cutoff"])
    if extra:
        d.update(extra)
    path = os.path.join(model_dir, MODEL_PARAMS_YAML)
    with open(path, "w") as f:
        yaml.safe_dump(d, f, sort_keys=True)
    return path


def load_config_yaml(model_dir: str) -> ScoreModelConfig:
    with open(os.path.join(model_dir, MODEL_PARAMS_YAML)) as f:
        return ScoreModelConfig.from_reference_yaml(yaml.safe_load(f))
