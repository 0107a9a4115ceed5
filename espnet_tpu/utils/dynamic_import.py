"""Dynamic class import — the plugin mechanism.

Reference parity: espnet/utils/dynamic_import.py (used by
`--model-module` in espnet/asr/pytorch_backend/asr.py:439-442 and the
`--encoder my_pkg.MyEncoder`-style extension points of espnet2
ClassChoices). Lets a config name any importable class:

    encoder: mypkg.encoders:MyEncoder     # "module:attr"
    encoder: mypkg.encoders.MyEncoder     # dotted fallback

Registry lookups should call `resolve_class(name, registry)`: a key in
the registry wins; otherwise the name is treated as an import path.
"""
from __future__ import annotations

import importlib
from typing import Any, Dict, Optional


def dynamic_import(import_path: str, alias: Optional[Dict[str, str]] = None) -> Any:
    """Import a class/function by "module:attr" (or "pkg.mod.Attr")."""
    if alias and import_path in alias:
        import_path = alias[import_path]
    if ":" in import_path:
        module_name, attr = import_path.split(":", 1)
    else:
        if "." not in import_path:
            raise ImportError(
                f"'{import_path}' is neither a registered name nor an import "
                "path ('module:attr' or 'pkg.mod.Attr')"
            )
        module_name, attr = import_path.rsplit(".", 1)
    module = importlib.import_module(module_name)
    try:
        return getattr(module, attr)
    except AttributeError as e:
        raise ImportError(f"{module_name} has no attribute {attr}") from e


def resolve_class(name: str, registry: Dict[str, Any]) -> Any:
    """Registry key, else dynamic import path (the plugin escape hatch)."""
    if name in registry:
        return registry[name]
    return dynamic_import(name)
