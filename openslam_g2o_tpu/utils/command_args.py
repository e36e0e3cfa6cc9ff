"""Declarative CLI flags in the reference's style.

Re-implements CommandArgs (g2o/stuff/command_args.h:46-90): single-dash long
flags with typed defaults, help text, and leftover positional parameters —
a thin layer over argparse that keeps the reference's flag grammar
(`-i 10 -v -solver lm_var file.g2o`).
"""
from __future__ import annotations

import argparse
from typing import Any, Optional

__all__ = ["CommandArgs"]


class CommandArgs:
    def __init__(self, description: str = ""):
        self._parser = argparse.ArgumentParser(
            description=description, prefix_chars="-")
        self._leftovers: list = []
        self._values: dict = {}

    def param(self, name: str, default: Any, help: str = ""):
        """Register -name with a typed default (bool -> flag)."""
        if isinstance(default, bool):
            self._parser.add_argument(f"-{name}", action="store_true",
                                      default=default, help=help)
        else:
            self._parser.add_argument(f"-{name}", type=type(default),
                                      default=default, help=help)
        return self

    def param_leftover(self, name: str, optional: bool = False,
                       help: str = ""):
        self._parser.add_argument(name, nargs="?" if optional else None,
                                  help=help)
        return self

    def parse_args(self, argv=None):
        ns = self._parser.parse_args(argv)
        self._values = vars(ns)
        return self

    def get(self, name: str):
        return self._values[name]

    def __getattr__(self, name):
        values = object.__getattribute__(self, "_values")
        if name in values:
            return values[name]
        raise AttributeError(name)
