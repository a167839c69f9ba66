"""YAML config system with defaulting attribute access.

Same surface as the reference ``network/config/__init__.py``: nested
attribute access over a YAML dict, ``.get(default)`` printing the applied
default, ``.value`` for required fields. The stock network/dataset YAMLs
(same keys as the reference's 13 configs) live beside this module.
"""

from __future__ import annotations

import os

import yaml

CONFIG_DIR = os.path.dirname(os.path.abspath(__file__))


class Reader:
    def __init__(self, obj, full_attr: str = ""):
        self._object = obj
        self._full_attr = full_attr

    def __getattr__(self, name: str) -> "Reader":
        if name.startswith("_"):
            raise AttributeError(name)
        ret = None if self._object is None else self._object.get(name, None)
        return Reader(ret, self._full_attr + "." + name)

    def __getitem__(self, name: str) -> "Reader":
        return getattr(self, name)

    def get(self, default=None):
        if self._object is None:
            print(f"Default FLAGS{self._full_attr} to {default}")
            return default
        return self._object

    @property
    def value(self):
        return self._object


def load_config(name_or_path: str) -> Reader:
    """Load a YAML by path, or by name from the bundled config directory."""
    path = name_or_path
    if not os.path.exists(path):
        path = os.path.join(CONFIG_DIR, name_or_path)
    with open(path) as fp:
        return Reader(yaml.safe_load(fp))
