"""Yaml config handling (reference: espnet2/utils/config_argparse.py:7 —
yaml file sets defaults, CLI overrides; resolved config.yaml persisted to
the expdir as the contract for build_model_from_file).
"""
from __future__ import annotations

import argparse
from pathlib import Path
from typing import Any, Dict, List, Optional

import yaml


def load_yaml(path) -> Dict[str, Any]:
    with open(path) as f:
        return yaml.safe_load(f) or {}


def save_yaml(path, config: Dict[str, Any]):
    Path(path).parent.mkdir(parents=True, exist_ok=True)
    with open(path, "w") as f:
        yaml.safe_dump(config, f, sort_keys=False)


def parse_override(tokens: List[str]) -> Dict[str, Any]:
    """['--a.b', '3', '--flag', 'true'] → {'a': {'b': 3}, 'flag': True}."""
    out: Dict[str, Any] = {}
    i = 0
    while i < len(tokens):
        key = tokens[i]
        if not key.startswith("--"):
            raise ValueError(f"expected --key, got {key}")
        val = tokens[i + 1] if i + 1 < len(tokens) else "true"
        i += 2
        try:
            val = yaml.safe_load(val)
        except Exception:
            pass
        d = out
        parts = key[2:].split(".")
        for p in parts[:-1]:
            d = d.setdefault(p, {})
        d[parts[-1]] = val
    return out


def merge_config(base: Dict, override: Dict) -> Dict:
    out = dict(base)
    for k, v in override.items():
        if isinstance(v, dict) and isinstance(out.get(k), dict):
            out[k] = merge_config(out[k], v)
        else:
            out[k] = v
    return out


def build_config(
    argv: Optional[List[str]] = None, defaults: Optional[Dict] = None
) -> Dict[str, Any]:
    """--config file.yaml + dotted --key value overrides → config dict.

    `--print_config` dumps the fully-resolved config as yaml and exits
    (reference: espnet2 abs_task.py:915 print_config) — works in every
    train CLI since they all resolve configs through here."""
    parser = argparse.ArgumentParser(add_help=False)
    parser.add_argument("--config", default=None)
    parser.add_argument("--print_config", action="store_true")
    args, rest = parser.parse_known_args(argv)
    config = dict(defaults or {})
    if args.config:
        config = merge_config(config, load_yaml(args.config))
    config = merge_config(config, parse_override(rest))
    if args.print_config:
        import yaml

        print(yaml.safe_dump(config, default_flow_style=False, sort_keys=True))
        raise SystemExit(0)
    return config
