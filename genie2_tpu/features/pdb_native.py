"""ctypes bindings for the native C++ PDB parser, with lazy build and a
pure-Python fallback.

`parse_pdb_fast(path)` returns the same (seqs, coords) structure as
`genie2_tpu.features.pdb.parse_pdb`. The shared library is compiled on
first use (g++ -O3) into csrc/; any build or load failure silently falls
back to the Python parser, so the native path is a pure accelerator.
"""

from __future__ import annotations

import ctypes
import gzip
import os
import subprocess
import threading
from typing import List, Optional, Tuple

import numpy as np

from genie2_tpu.features.pdb import parse_pdb as parse_pdb_python

_CSRC = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "csrc")
_LIB_PATH = os.path.join(_CSRC, "libpdbparser.so")
_SRC_PATH = os.path.join(_CSRC, "pdb_parser.cpp")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_load_failed = False


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-o", _LIB_PATH, _SRC_PATH],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return True
    except Exception:
        return False


def _get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _load_failed
    if _lib is not None or _load_failed:
        return _lib
    with _lock:
        if _lib is not None or _load_failed:
            return _lib
        try:
            if not os.path.exists(_LIB_PATH) or os.path.getmtime(
                _LIB_PATH
            ) < os.path.getmtime(_SRC_PATH):
                if not _build():
                    _load_failed = True
                    return None
            lib = ctypes.CDLL(_LIB_PATH)
            lib.parse_pdb_ca.restype = ctypes.c_int64
            lib.parse_pdb_ca.argtypes = [
                ctypes.c_char_p,
                ctypes.c_int64,
                ctypes.POINTER(ctypes.c_float),
                ctypes.POINTER(ctypes.c_int32),
                ctypes.POINTER(ctypes.c_int32),
                ctypes.c_int64,
            ]
            _lib = lib
        except Exception:
            _load_failed = True
    return _lib


def native_available() -> bool:
    return _get_lib() is not None


def parse_pdb_fast(
    filepath: str, max_atoms: int = 65536
) -> Tuple[List[List[int]], List[List[List[float]]]]:
    """Drop-in replacement for parse_pdb; falls back to Python on any
    problem (unknown residues, missing toolchain)."""
    lib = _get_lib()
    if lib is None:
        return parse_pdb_python(filepath)

    if filepath.endswith(".gz"):
        with gzip.open(filepath, "rb") as f:
            data = f.read()
    else:
        with open(filepath, "rb") as f:
            data = f.read()

    coords = np.empty((max_atoms, 3), dtype=np.float32)
    restypes = np.empty(max_atoms, dtype=np.int32)
    chain_ids = np.empty(max_atoms, dtype=np.int32)
    n = lib.parse_pdb_ca(
        data,
        len(data),
        coords.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        restypes.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        chain_ids.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        max_atoms,
    )
    if n < 0:
        # Malformed / nonstandard residue: defer to the Python parser's
        # error behavior.
        return parse_pdb_python(filepath)

    seqs: List[List[int]] = []
    out_coords: List[List[List[float]]] = []
    for c in range(chain_ids[:n].max() + 1 if n else 0):
        m = chain_ids[:n] == c
        seqs.append(restypes[:n][m].tolist())
        out_coords.append(coords[:n][m].astype(float).tolist())
    return seqs, out_coords
