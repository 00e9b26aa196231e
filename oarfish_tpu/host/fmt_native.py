"""ctypes binding for the native writer-line assembler (csrc/fmt.cpp).

Formats f64 values in Rust-Display form (shortest round-trip decimal,
positional — the reference writers print counts with `{}`) and builds
whole `.count.mtx` / `.quant` / `.ambig_info.tsv` bodies natively. The
numpy/np.char path in `quant/writers.py` remains the fallback when the
toolchain is unavailable.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
from pathlib import Path
from typing import Optional

import numpy as np

log = logging.getLogger("oarfish_tpu")

_CSRC = Path(__file__).resolve().parent.parent.parent / "csrc"
_LIB_PATH = _CSRC / "liboarfish_fmt.so"
_lib = None
_lib_tried = False

_c_i64 = ctypes.c_int64
_p_i64 = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
_p_f64 = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")
_p_u8 = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
_p_char = ctypes.c_char_p


def get_lib():
    global _lib, _lib_tried
    if _lib is not None or _lib_tried:
        return _lib
    _lib_tried = True
    src = _CSRC / "fmt.cpp"

    def build() -> bool:
        if not src.exists():
            return False
        tmp = _LIB_PATH.with_suffix(".so.new")
        try:
            subprocess.run(
                ["g++", "-O3", "-march=native", "-std=c++17", "-shared",
                 "-fPIC", str(src), "-o", str(tmp), "-pthread"],
                check=True, capture_output=True, timeout=300,
            )
            os.replace(tmp, _LIB_PATH)
            return True
        except Exception as e:  # noqa: BLE001
            log.warning("could not build fmt library: %s", e)
            tmp.unlink(missing_ok=True)
            return False

    if not _LIB_PATH.exists() and not build():
        return None
    try:
        lib = ctypes.CDLL(str(_LIB_PATH))
    except OSError as e:  # pragma: no cover
        log.warning("could not load fmt library: %s", e)
        return None
    lib.oarfish_mtx_lines.restype = _c_i64
    lib.oarfish_mtx_lines.argtypes = [
        _p_i64, _p_i64, _p_f64, _c_i64, ctypes.c_void_p, _c_i64]
    lib.oarfish_quant_lines.restype = _c_i64
    lib.oarfish_quant_lines.argtypes = [
        _p_u8, _p_i64, _p_i64, _p_f64, _c_i64, ctypes.c_void_p, _c_i64]
    lib.oarfish_ambig_lines.restype = _c_i64
    lib.oarfish_ambig_lines.argtypes = [
        _p_i64, _p_i64, _c_i64, ctypes.c_void_p, _c_i64]
    lib.oarfish_fmt_f64.restype = _c_i64
    lib.oarfish_fmt_f64.argtypes = [
        _p_f64, _c_i64, ctypes.c_void_p, _c_i64, _p_i64]
    _lib = lib
    return _lib


def _run_capped(fn, n: int, est_per_line: int, *args) -> Optional[bytes]:
    """Call a -needed-protocol entry with a growable output buffer."""
    cap = max(n * est_per_line + 1024, 4096)
    for _ in range(2):
        out = ctypes.create_string_buffer(cap)
        r = fn(*args, out, cap)
        if r == -(2**63):  # sentinel: input rejected
            return None
        if r >= 0:
            return out.raw[:r]
        cap = -r
    return None


def mtx_lines(rows: np.ndarray, cols: np.ndarray,
              vals: np.ndarray) -> Optional[bytes]:
    lib = get_lib()
    if lib is None:
        return None
    rows = np.ascontiguousarray(rows, np.int64)
    cols = np.ascontiguousarray(cols, np.int64)
    vals = np.ascontiguousarray(vals, np.float64)
    n = len(vals)
    return _run_capped(lib.oarfish_mtx_lines, n, 24, rows, cols, vals, n)


def quant_lines(name_buf: np.ndarray, name_off: np.ndarray,
                lens: np.ndarray, counts: np.ndarray) -> Optional[bytes]:
    lib = get_lib()
    if lib is None:
        return None
    name_buf = np.ascontiguousarray(name_buf, np.uint8)
    name_off = np.ascontiguousarray(name_off, np.int64)
    lens = np.ascontiguousarray(lens, np.int64)
    counts = np.ascontiguousarray(counts, np.float64)
    n = len(counts)
    est = 24 + int(np.diff(name_off).max(initial=0))
    return _run_capped(
        lib.oarfish_quant_lines, n, est, name_buf, name_off, lens, counts, n)


def ambig_lines(uniq: np.ndarray, total: np.ndarray) -> Optional[bytes]:
    lib = get_lib()
    if lib is None:
        return None
    uniq = np.ascontiguousarray(uniq, np.int64)
    total = np.ascontiguousarray(total, np.int64)
    n = len(uniq)
    return _run_capped(lib.oarfish_ambig_lines, n, 24, uniq, total, n)


def fmt_f64_tokens(vals: np.ndarray):
    """Format values -> (bytes, offsets[n+1]) or None."""
    lib = get_lib()
    if lib is None:
        return None
    vals = np.ascontiguousarray(vals, np.float64)
    n = len(vals)
    offsets = np.zeros(n + 1, dtype=np.int64)
    cap = n * 24 + 1024
    for _ in range(2):
        out = ctypes.create_string_buffer(cap)
        r = lib.oarfish_fmt_f64(vals, n, out, cap, offsets)
        if r >= 0:
            return out.raw[:r], offsets
        cap = -r
    return None
