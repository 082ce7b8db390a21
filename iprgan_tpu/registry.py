"""String-keyed registries.

The reference resolves experiments / model types / networks / datasets /
transforms / losses by `getattr(module, name)` on YAML strings (reference
train.py:23, models/dcgan.py:10-11, models/wrappers.py:17-27). We make
that idiom explicit: one registry per kind, populated by decorators, so a
bad YAML name fails with a clear error listing valid choices.
"""

from __future__ import annotations

from typing import Any, Callable, Dict


class Registry:
    def __init__(self, kind: str):
        self.kind = kind
        self._entries: Dict[str, Any] = {}

    def register(self, name: str | None = None) -> Callable:
        def deco(obj):
            key = name or obj.__name__
            if key in self._entries:
                raise KeyError(f"{self.kind} '{key}' registered twice")
            self._entries[key] = obj
            return obj

        return deco

    def __call__(self, name: str) -> Any:
        try:
            return self._entries[name]
        except KeyError:
            valid = ", ".join(sorted(self._entries))
            raise KeyError(
                f"unknown {self.kind} '{name}'; valid choices: {valid}"
            ) from None

    def __contains__(self, name: str) -> bool:
        return name in self._entries

    def names(self):
        return sorted(self._entries)


NETWORKS = Registry("network")
MODELS = Registry("model")
EXPERIMENTS = Registry("experiment")
DATASETS = Registry("dataset")
TRANSFORMS = Registry("transform")
LOSSES = Registry("loss")
