"""Native (C++) runtime components, loaded via ctypes.

Build happens on demand with the system g++ (cached by source mtime); when a
toolchain is unavailable the callers fall back to pure Python.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import sys

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "g2o_parser.cpp")
_SO = os.path.join(_DIR, "build", "libg2o_parser.so")

_lib = None
_lib_failed = False


class LineRec(ctypes.Structure):
    _fields_ = [
        ("tag_offset", ctypes.c_int64),
        ("tag_len", ctypes.c_int32),
        ("n_values", ctypes.c_int32),
        ("value_start", ctypes.c_int64),
        ("line_offset", ctypes.c_int64),
        ("line_len", ctypes.c_int32),
        ("ok", ctypes.c_int32),
    ]


def _build():
    os.makedirs(os.path.dirname(_SO), exist_ok=True)
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", _SRC, "-o", _SO]
    subprocess.run(cmd, check=True, capture_output=True)


def get_parser_lib():
    """The compiled tokenizer library, or None if unavailable."""
    global _lib, _lib_failed
    if _lib is not None:
        return _lib
    if _lib_failed:
        return None
    try:
        if (not os.path.exists(_SO)
                or os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
            _build()
        lib = ctypes.CDLL(_SO)
        lib.g2o_count.argtypes = [
            ctypes.c_char_p, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64)]
        lib.g2o_tokenize.argtypes = [
            ctypes.c_char_p, ctypes.c_int64,
            np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
            ctypes.POINTER(LineRec),
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64)]
        _lib = lib
        return lib
    except (OSError, subprocess.CalledProcessError) as e:
        print(f"native parser unavailable ({e}); using Python fallback",
              file=sys.stderr)
        _lib_failed = True
        return None


def tokenize(text: str):
    """Tokenize .g2o text natively.

    Returns list of (tag: str, values: np.ndarray | None, raw_line: str),
    where values is None for lines with non-numeric payload (caller
    re-parses), or None overall if the native library is unavailable.
    """
    lib = get_parser_lib()
    if lib is None:
        return None
    data = text.encode()
    n_lines = ctypes.c_int64()
    n_tokens = ctypes.c_int64()
    lib.g2o_count(data, len(data), ctypes.byref(n_lines), ctypes.byref(n_tokens))
    values = np.empty(max(int(n_tokens.value), 1), dtype=np.float64)
    lines = (LineRec * max(int(n_lines.value), 1))()
    out_lines = ctypes.c_int64()
    out_values = ctypes.c_int64()
    lib.g2o_tokenize(data, len(data), values, lines,
                     ctypes.byref(out_lines), ctypes.byref(out_values))
    out = []
    for i in range(int(out_lines.value)):
        r = lines[i]
        tag = data[r.tag_offset:r.tag_offset + r.tag_len].decode()
        if r.ok:
            vals = values[r.value_start:r.value_start + r.n_values]
            out.append((tag, vals, None))
        else:
            raw = data[r.line_offset:r.line_offset + r.line_len].decode()
            out.append((tag, None, raw))
    return out
