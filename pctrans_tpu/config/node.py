"""A minimal YACS-compatible config node.

The reference framework configures everything through detectron2/yacs
``CfgNode`` trees merged from two YAML files plus ``--opts KEY VALUE`` CLI
overrides (reference: connectomics/config/utils.py:9-50).  We reimplement the
small subset of that behavior we need so the reference YAML files (same key
names) drop in without a yacs/detectron2 dependency.
"""

from __future__ import annotations

import ast
import copy
from typing import Any, Dict, List

import yaml


class CfgNode(dict):
    """Nested attribute dict with yacs-style merge/freeze semantics."""

    _FROZEN = "__frozen__"

    def __init__(self, init: Dict[str, Any] | None = None):
        super().__init__()
        object.__setattr__(self, CfgNode._FROZEN, False)
        if init:
            for k, v in init.items():
                self[k] = CfgNode(v) if isinstance(v, dict) else v

    # -- attribute access ---------------------------------------------------
    def __getattr__(self, name: str) -> Any:
        try:
            return self[name]
        except KeyError as e:
            raise AttributeError(name) from e

    def __setattr__(self, name: str, value: Any) -> None:
        if self.is_frozen():
            raise AttributeError(f"Cannot set {name}: CfgNode is frozen")
        self[name] = CfgNode(value) if isinstance(value, dict) and not isinstance(value, CfgNode) else value

    def __setitem__(self, name: str, value: Any) -> None:
        if self.is_frozen():
            raise AttributeError(f"Cannot set {name}: CfgNode is frozen")
        super().__setitem__(name, value)

    # -- freeze -------------------------------------------------------------
    def freeze(self) -> "CfgNode":
        object.__setattr__(self, CfgNode._FROZEN, True)
        for v in self.values():
            if isinstance(v, CfgNode):
                v.freeze()
        return self

    def defrost(self) -> "CfgNode":
        object.__setattr__(self, CfgNode._FROZEN, False)
        for v in self.values():
            if isinstance(v, CfgNode):
                v.defrost()
        return self

    def is_frozen(self) -> bool:
        return object.__getattribute__(self, CfgNode._FROZEN)

    def clone(self) -> "CfgNode":
        node = CfgNode()
        for k, v in self.items():
            node[k] = v.clone() if isinstance(v, CfgNode) else copy.deepcopy(v)
        return node

    # -- merging ------------------------------------------------------------
    def merge_from_other(self, other: Dict[str, Any], allow_new: bool = True) -> None:
        for k, v in other.items():
            if isinstance(v, dict):
                if k not in self or not isinstance(self[k], CfgNode):
                    if not allow_new and k not in self:
                        raise KeyError(f"Unknown config key: {k}")
                    self[k] = CfgNode()
                self[k].merge_from_other(v, allow_new=allow_new)
            else:
                if not allow_new and k not in self:
                    raise KeyError(f"Unknown config key: {k}")
                self[k] = _coerce(v, self.get(k))

    def merge_from_file(self, path: str, allow_new: bool = True) -> None:
        with open(path, "r") as f:
            data = yaml.safe_load(f) or {}
        self.merge_from_other(data, allow_new=allow_new)

    def merge_from_list(self, opts: List[str], allow_new: bool = False) -> None:
        """``--opts KEY VALUE ...`` overrides.  Like YACS (the reference's
        config CLI, connectomics/config/utils.py:30-38), unknown keys RAISE
        by default — a typo'd override key silently creating a dead branch
        is strictly worse than an error (``MONITOR.ITERATION_LOG 5`` would
        otherwise no-op instead of pointing at ``MONITOR.ITERATION_NUM``)."""
        assert len(opts) % 2 == 0, f"--opts must be KEY VALUE pairs, got {opts}"
        for key, value in zip(opts[0::2], opts[1::2]):
            node = self
            parts = key.split(".")
            for p in parts[:-1]:
                if p not in node:
                    if not allow_new:
                        raise KeyError(f"Unknown config key: {key}")
                    node[p] = CfgNode()
                node = node[p]
            if parts[-1] not in node and not allow_new:
                raise KeyError(f"Unknown config key: {key}")
            node[parts[-1]] = _coerce(_parse_literal(value), node.get(parts[-1]))

    # -- io -----------------------------------------------------------------
    def to_dict(self) -> Dict[str, Any]:
        return {k: (v.to_dict() if isinstance(v, CfgNode) else v) for k, v in self.items()}

    def dump(self) -> str:
        return yaml.safe_dump(self.to_dict(), default_flow_style=False, sort_keys=True)

    def save(self, path: str) -> None:
        with open(path, "w") as f:
            f.write(self.dump())


def _parse_literal(value: Any) -> Any:
    if not isinstance(value, str):
        return value
    try:
        return ast.literal_eval(value)
    except (ValueError, SyntaxError):
        return value


def _coerce(value: Any, old: Any) -> Any:
    """Coerce YAML-parsed values to the type of the default when sensible."""
    if old is None or value is None:
        return value
    if isinstance(old, bool) and isinstance(value, str):
        return value.lower() in ("true", "1", "yes")
    if isinstance(old, float) and isinstance(value, int):
        return float(value)
    if isinstance(old, (int, float)) and isinstance(value, str):
        # PyYAML (YAML 1.1) parses "1e-04" as a string; coerce numeric strings.
        try:
            return type(old)(float(value))
        except ValueError:
            return value
    if isinstance(old, tuple) and isinstance(value, (list, str)):
        if isinstance(value, str):
            value = _parse_literal(value)
        return tuple(value) if isinstance(value, (list, tuple)) else (value,)
    if isinstance(old, tuple) and isinstance(value, (int, float)):
        # a scalar override of a tuple-typed key (e.g. --opts SOLVER.STEPS
        # 30000) would otherwise crash far away at first use
        return (value,)
    return value
