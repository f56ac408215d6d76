"""Config file IO (reference-compatible JSON schema).

Parity with /root/reference/util/config_util.py:5-25: a "config" file
holds the model/graph/encoding selection, a "train_config"/"eval_config"
file holds run hyperparameters.  Additionally accepts a built-in
configuration name (see pointgnn_tpu.configs.list_configs) anywhere a
path is expected.
"""

import json
import os

from pointgnn_tpu import configs as builtin


def load_config(path_or_name: str) -> dict:
    if os.path.isfile(path_or_name):
        with open(path_or_name) as f:
            return json.load(f)
    name = os.path.basename(path_or_name).replace("_config", "")
    if name in builtin.list_configs():
        return builtin.get_config(name)
    raise FileNotFoundError(path_or_name)


def save_config(path: str, config: dict) -> None:
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "w") as f:
        json.dump(config, f, indent=4, sort_keys=True)


def load_train_config(path_or_name: str) -> dict:
    if os.path.isfile(path_or_name):
        with open(path_or_name) as f:
            return json.load(f)
    name = os.path.basename(path_or_name).replace("_train_config", "")
    if name in builtin.list_configs():
        return builtin.get_train_config(name)
    raise FileNotFoundError(path_or_name)


def save_train_config(path: str, config: dict) -> None:
    save_config(path, config)
