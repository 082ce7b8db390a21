"""YAML configuration system.

API-compatible with the reference config object (see
/root/reference/configs/__init__.py:4-44): recursive attribute access,
``parse``/``get``/``to_dict``/``to_yaml``, item get/set, and free mutation
(the attack CLIs rewrite configs in place, reference attack.py:102-137).
"""

from __future__ import annotations

import copy
import json
from typing import Any

import yaml


class Config:
    """Recursive dict -> attribute object parsed from YAML."""

    @classmethod
    def parse(cls, fpath: str) -> "Config":
        with open(fpath, "r") as f:
            entries = yaml.safe_load(f)
        return cls(entries)

    @classmethod
    def from_dict(cls, entries: dict) -> "Config":
        return cls(entries)

    def __init__(self, entries: dict | None = None):
        entries = entries or {}
        for k, v in entries.items():
            self.__dict__[k] = Config(v) if isinstance(v, dict) else v

    # -- attribute / item access ------------------------------------------
    def __getitem__(self, key: str) -> Any:
        return self.__dict__[key]

    def __setitem__(self, key: str, value: Any) -> None:
        self.__dict__[key] = Config(value) if isinstance(value, dict) else value

    def __setattr__(self, key: str, value: Any) -> None:
        self.__dict__[key] = Config(value) if isinstance(value, dict) else value

    def __contains__(self, key: str) -> bool:
        return key in self.__dict__

    def __eq__(self, other: object) -> bool:
        if isinstance(other, Config):
            return self.to_dict() == other.to_dict()
        return NotImplemented

    def get(self, key: str, default: Any = None) -> Any:
        return self.__dict__.get(key, default)

    def keys(self):
        return self.__dict__.keys()

    def items(self):
        return self.__dict__.items()

    # -- serialization -----------------------------------------------------
    def to_dict(self) -> dict:
        out = {}
        for k, v in self.__dict__.items():
            out[k] = v.to_dict() if isinstance(v, Config) else v
        return out

    def to_yaml(self) -> str:
        return yaml.safe_dump(self.to_dict())

    def to_json(self) -> str:
        return json.dumps(self.to_dict(), indent=2, sort_keys=True)

    def copy(self) -> "Config":
        return Config(copy.deepcopy(self.to_dict()))

    def __str__(self) -> str:
        return self.to_json()

    def __repr__(self) -> str:
        return f"Config({self.to_dict()!r})"
