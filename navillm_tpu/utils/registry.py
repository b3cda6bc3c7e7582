"""Name-keyed registries for datasets and agents.

Plain decorator registries instead of the reference's metaclass trick
(reference: tasks/datasets/base_dataset.py:3-12, tasks/agents/base_agent.py:2-8).
"""
from typing import Callable, Dict, Type


class Registry:
    def __init__(self, kind: str):
        self.kind = kind
        self._items: Dict[str, Type] = {}

    def register(self, name: str) -> Callable[[Type], Type]:
        def deco(cls: Type) -> Type:
            if name in self._items:
                raise KeyError(f"duplicate {self.kind} registration: {name}")
            self._items[name] = cls
            cls.name = name
            return cls
        return deco

    def get(self, name: str) -> Type:
        if name not in self._items:
            raise KeyError(f"unknown {self.kind} '{name}'; known: {sorted(self._items)}")
        return self._items[name]

    def build(self, name: str, *args, **kwargs):
        return self.get(name)(*args, **kwargs)

    def __contains__(self, name: str) -> bool:
        return name in self._items

    def keys(self):
        return self._items.keys()


DATASETS = Registry("dataset")
AGENTS = Registry("agent")
