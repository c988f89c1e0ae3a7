"""YAML config + CLI-override system.

Preserves the reference UX — ``train config.yaml --key=value`` where any CLI
kwarg overrides the YAML (``utils/train_util.py:80-84`` ``parse_config_or_kwargs``,
advertised in ``runners/pytorch_runner_vae.py:124-126``) — with two upgrades:

* dotted overrides reach into nested dicts (``--model_args.beta=0.5``);
* the merged config is an attribute-accessible mapping with defaults, so the
  recovered AC-VAE schema (SURVEY §5) is explicit in one place.
"""
from __future__ import annotations

import json
import re
from typing import Any, Mapping

import yaml


class Config(dict):
    """dict with attribute access and dotted get/set."""

    def __getattr__(self, key: str) -> Any:
        try:
            v = self[key]
        except KeyError as e:
            raise AttributeError(key) from e
        if isinstance(v, dict) and not isinstance(v, Config):
            # store the wrapper back so it is a LIVE view: writes through
            # attribute access (cfg.model_args.beta = 0.5) must persist in
            # the config, not vanish into a throwaway copy
            v = Config(v)
            self[key] = v
        return v

    def __setattr__(self, key: str, value: Any) -> None:
        self[key] = value

    def get_path(self, path: str, default: Any = None) -> Any:
        node: Any = self
        for part in path.split("."):
            if not isinstance(node, Mapping) or part not in node:
                return default
            node = node[part]
        return node

    def set_path(self, path: str, value: Any) -> None:
        parts = path.split(".")
        node = self
        for part in parts[:-1]:
            nxt = node.get(part)
            if not isinstance(nxt, dict):
                nxt = {}
                node[part] = nxt
            node = nxt
        node[parts[-1]] = value


def _coerce(value: str) -> Any:
    """Best-effort parse of a CLI string into YAML/JSON scalar or container."""
    if not isinstance(value, str):
        return value
    try:
        return yaml.safe_load(value)
    except yaml.YAMLError:
        return value


_YAML11_FLOAT = re.compile(r"^[+-]?(\d+\.?\d*|\.\d+)[eE][+-]?\d+$")


def _fix_yaml11_floats(node: Any) -> Any:
    """YAML 1.1 (pyyaml) parses ``1e-3`` as a *string* (the spec demands
    ``1.0e-3``); every YAML-1.2 reader and every human treats it as a float.
    Coerce exactly that shape — bare scientific notation — so ``lr: 1e-3``
    doesn't surface as a string deep inside the jitted optimizer."""
    if isinstance(node, dict):
        return {k: _fix_yaml11_floats(v) for k, v in node.items()}
    if isinstance(node, list):
        return [_fix_yaml11_floats(v) for v in node]
    if isinstance(node, str) and _YAML11_FLOAT.match(node):
        return float(node)
    return node


def load_config(config_file: str | None = None, **overrides) -> Config:
    """Load YAML then apply overrides (dotted keys reach nested dicts)."""
    cfg = Config()
    if config_file is not None:
        with open(config_file) as f:
            loaded = yaml.safe_load(f) or {}
        if not isinstance(loaded, dict):
            raise ValueError(f"{config_file} must contain a YAML mapping")
        # _fix_yaml11_floats rebuilds every container, so no deepcopy needed
        cfg.update(_fix_yaml11_floats(loaded))
    for key, value in overrides.items():
        cfg.set_path(key, _fix_yaml11_floats(_coerce(value)))
    return cfg


def dump_config(cfg: Mapping, config_file: str) -> None:
    """Persist the merged config next to checkpoints (utils/train_util.py:87)."""
    def _plain(x):
        if isinstance(x, Mapping):
            return {k: _plain(v) for k, v in x.items()}
        if isinstance(x, (list, tuple)):
            return [_plain(v) for v in x]
        try:
            json.dumps(x)
            return x
        except TypeError:
            return repr(x)
    with open(config_file, "w") as f:
        yaml.safe_dump(_plain(cfg), f, default_flow_style=False)
