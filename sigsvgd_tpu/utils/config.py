"""Config system: dataclass ↔ YAML round-trip for experiment configs.

Unifies the reference's three ad-hoc config styles (YAML files, argparse
flags, in-file dicts — SURVEY.md §5.6) behind one mechanism: every experiment
config is a frozen dataclass; ``load_config``/``save_config`` round-trip it
through YAML, and ``apply_overrides`` merges ``key=value`` CLI overrides.
"""
from __future__ import annotations

import dataclasses
from pathlib import Path
from typing import Any, Dict, Type, TypeVar

import yaml

T = TypeVar("T")


def to_dict(config: Any) -> Dict[str, Any]:
    return dataclasses.asdict(config)


def from_dict(cls: Type[T], data: Dict[str, Any]) -> T:
    field_names = {f.name for f in dataclasses.fields(cls)}
    unknown = set(data) - field_names
    if unknown:
        raise ValueError(f"Unknown config keys for {cls.__name__}: {sorted(unknown)}")
    return cls(**data)


def save_config(config: Any, path: str | Path) -> None:
    Path(path).parent.mkdir(parents=True, exist_ok=True)
    Path(path).write_text(yaml.safe_dump(to_dict(config)))


def load_config(cls: Type[T], path: str | Path) -> T:
    return from_dict(cls, yaml.safe_load(Path(path).read_text()) or {})


def apply_overrides(config: T, overrides: Dict[str, Any] | list) -> T:
    """Merge overrides into a dataclass config. Accepts a dict or a list of
    ``"key=value"`` strings (values parsed as YAML scalars)."""
    if isinstance(overrides, list):
        parsed = {}
        for item in overrides:
            key, _, val = item.partition("=")
            parsed[key.strip()] = yaml.safe_load(val)
        overrides = parsed
    return dataclasses.replace(config, **overrides)
