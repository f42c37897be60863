"""String-keyed component registries.

The reference framework wires archs/datasets/losses/metrics/models together
through name-keyed registries so that everything is YAML-addressable
(ref: HAT/ESC/basicsr/utils/registry.py:4-88, registries declared at :84-88).
We keep the same addressing scheme — the same `type:` strings in the same
YAML schema resolve to the TPU implementations — but with a plain
dict-of-factories instead of the decorator-heavy iterator class.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Iterator


class Registry:
    """A name -> factory mapping with decorator registration."""

    def __init__(self, name: str):
        self._name = name
        self._obj_map: Dict[str, Any] = {}

    def register(self, obj: Any = None, *, name: str | None = None, suffix: str | None = None):
        """Register a class/function under its __name__ (or explicit name).

        Can be used as ``@REGISTRY.register()`` or ``@REGISTRY.register``.
        ``suffix`` registers under ``f"{name}_{suffix}"`` (the reference uses
        this for app-specific overrides of basicsr names).
        """
        if obj is None:
            return lambda o: self.register(o, name=name, suffix=suffix)
        key = name if name is not None else obj.__name__
        if suffix is not None:
            key = f"{key}_{suffix}"
        if key in self._obj_map:
            raise KeyError(f"'{key}' already registered in '{self._name}' registry")
        self._obj_map[key] = obj
        return obj

    def get(self, name: str, suffix: str | None = None) -> Any:
        ret = self._obj_map.get(name)
        if ret is None and suffix is not None:
            ret = self._obj_map.get(f"{name}_{suffix}")
        if ret is None:
            raise KeyError(f"'{name}' not found in '{self._name}' registry. "
                           f"Available: {sorted(self._obj_map)}")
        return ret

    def __contains__(self, name: str) -> bool:
        return name in self._obj_map

    def __iter__(self) -> Iterator[tuple[str, Any]]:
        return iter(self._obj_map.items())

    def keys(self):
        return self._obj_map.keys()


# The five registries of the reference framework
# (ref: HAT/ESC/basicsr/utils/registry.py:84-88).
ARCH_REGISTRY = Registry("arch")
MODEL_REGISTRY = Registry("model")       # L5 runners (training/eval strategies)
DATASET_REGISTRY = Registry("dataset")
LOSS_REGISTRY = Registry("loss")
METRIC_REGISTRY = Registry("metric")
