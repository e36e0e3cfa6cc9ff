"""Typed string-keyed runtime properties.

Re-implements Property<T>/PropertyMap (g2o/stuff/property.h:39-142): solver
knobs addressable by name, settable from "key=value,key=value" strings (the
CLI's -solverProperties flag, apps/g2o_cli/g2o.cpp:218-226).
"""
from __future__ import annotations

from typing import Any, Callable, Optional

__all__ = ["Property", "PropertyMap"]


class Property:
    def __init__(self, name: str, value: Any, cast: Optional[Callable] = None):
        self.name = name
        self._cast = cast or type(value)
        self.value = value

    def set_from_string(self, s: str):
        if self._cast is bool:
            self.value = s.strip().lower() in ("1", "true", "yes", "on")
        else:
            self.value = self._cast(s)

    def __repr__(self):
        return f"Property({self.name}={self.value!r})"


class PropertyMap(dict):
    """name -> Property. make_property mirrors Property registration; the
    update-from-string grammar is the reference's updateMapFromString
    (property.h:140)."""

    def make_property(self, name: str, default: Any) -> Property:
        p = Property(name, default)
        self[name] = p
        return p

    def update_property(self, name: str, value_str: str) -> bool:
        if name not in self:
            return False
        self[name].set_from_string(value_str)
        return True

    def update_from_string(self, s: str) -> bool:
        ok = True
        for item in s.split(","):
            item = item.strip()
            if not item:
                continue
            name, _, value = item.partition("=")
            if not value or not self.update_property(name.strip(), value.strip()):
                ok = False
        return ok

    def values_dict(self):
        return {k: v.value for k, v in self.items()}
