"""YAML config loader with the reference schema.

The shipped configs (configs/senas/*.yml) use `!!python/tuple` for Adam betas
(reference configs/senas/senas_promise12.yml:36, loaded with yaml.FullLoader
at experiments/search_arc.py:47). We support that tag without allowing
arbitrary python object construction.
"""

from __future__ import annotations

import copy
from typing import Any, Dict

import yaml


class _SenasLoader(yaml.SafeLoader):
    pass


def _construct_python_tuple(loader, node):
    return tuple(loader.construct_sequence(node))


_SenasLoader.add_constructor("tag:yaml.org,2002:python/tuple", _construct_python_tuple)


def load_config(path: str) -> Dict[str, Any]:
    with open(path, "r") as fp:
        return yaml.load(fp, Loader=_SenasLoader)


def merge_overrides(cfg: Dict[str, Any], phase: str, **overrides) -> Dict[str, Any]:
    """Apply CLI overrides onto a phase sub-dict (mirrors the argparse
    override pattern in experiments/search_arc.py:38-48)."""
    out = copy.deepcopy(cfg)
    for key, value in overrides.items():
        if value is not None:
            out[phase][key] = value
    return out
