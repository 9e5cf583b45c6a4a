"""ctypes bindings for the glam_native C++ data-path library.

The reference's host-side chemistry runs in RDKit's C++ core; glam_tpu's
native equivalent lives in native/csrc/glam_native.cpp (SMILES parser +
featurizer + ELLPACK builder).  This module loads it via ctypes and
exposes drop-in replacements for the Python implementations in
:mod:`glam_tpu.chem.featurize` / :mod:`glam_tpu.data.graph`; the Python
versions remain the correctness oracle (tests/test_native.py) and the
fallback when the library has not been built (``native/build.sh``).
"""
from __future__ import annotations

import ctypes
from pathlib import Path
from typing import Optional, Tuple

import numpy as np

_LIB_PATH = (Path(__file__).resolve().parent.parent.parent / "native" /
             "lib" / "libglam_native.so")
_lib: Optional[ctypes.CDLL] = None


def load_library() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    if not _LIB_PATH.exists():
        return None
    lib = ctypes.CDLL(str(_LIB_PATH))
    lib.glam_smiles_sizes.restype = ctypes.c_int
    lib.glam_smiles_sizes.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int)]
    lib.glam_featurize.restype = ctypes.c_int
    lib.glam_featurize.argtypes = [
        ctypes.c_char_p,
        np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")]
    lib.glam_featurize2.restype = ctypes.c_int
    lib.glam_featurize2.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ctypes.c_int,
        np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS"),
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
    lib.glam_build_ell.restype = ctypes.c_int
    lib.glam_build_ell.argtypes = [
        np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
        ctypes.c_int, ctypes.c_int, ctypes.c_int,
        np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")]
    _lib = lib
    return lib


def available() -> bool:
    return load_library() is not None


_CAP_ATOMS = 1024
_CAP_EDGES = 4096


def smiles_to_arrays_native(smiles: str
                            ) -> Tuple[np.ndarray, np.ndarray,
                                       np.ndarray, np.ndarray]:
    """Native (x, senders, receivers, edge_attr); raises on failure.
    Single parse via glam_featurize2 with capacity buffers; falls back
    to the two-call path for molecules beyond the capacity."""
    lib = load_library()
    if lib is None:
        raise RuntimeError("glam_native not built; run native/build.sh")
    if hasattr(lib, "glam_featurize2"):
        x = np.empty((_CAP_ATOMS, 15), np.float32)
        snd = np.empty((_CAP_EDGES,), np.int32)
        rcv = np.empty((_CAP_EDGES,), np.int32)
        attr = np.empty((_CAP_EDGES, 4), np.float32)
        n, e = ctypes.c_int(), ctypes.c_int()
        rc = lib.glam_featurize2(smiles.encode(), _CAP_ATOMS, _CAP_EDGES,
                                 x, snd, rcv, attr, ctypes.byref(n),
                                 ctypes.byref(e))
        if rc == 0:
            return (x[:n.value].copy(), snd[:e.value].copy(),
                    rcv[:e.value].copy(), attr[:e.value].copy())
        if rc == -1:
            raise ValueError(f"native parse failed: {smiles!r}")
        # rc == -2: fall through to exact-size two-call path
    na, ne = ctypes.c_int(), ctypes.c_int()
    if lib.glam_smiles_sizes(smiles.encode(), ctypes.byref(na),
                             ctypes.byref(ne)) != 0:
        raise ValueError(f"native parse failed: {smiles!r}")
    n, e = na.value, ne.value
    x = np.zeros((n, 15), np.float32)
    snd = np.zeros((e,), np.int32)
    rcv = np.zeros((e,), np.int32)
    attr = np.zeros((e, 4), np.float32)
    if lib.glam_featurize(smiles.encode(), x, snd, rcv, attr) != 0:
        raise ValueError(f"native featurize failed: {smiles!r}")
    return x, snd, rcv, attr


def build_ell_native(senders: np.ndarray, receivers: np.ndarray,
                     num_nodes: int, k: int
                     ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    lib = load_library()
    if lib is None:
        raise RuntimeError("glam_native not built; run native/build.sh")
    senders = np.ascontiguousarray(senders, np.int32)
    receivers = np.ascontiguousarray(receivers, np.int32)
    nbr = np.zeros((num_nodes, k), np.int32)
    eid = np.zeros((num_nodes, k), np.int32)
    mask = np.zeros((num_nodes, k), np.uint8)
    rc = lib.glam_build_ell(senders, receivers, len(senders), num_nodes,
                            k, nbr, eid, mask)
    if rc != 0:
        raise ValueError(f"in-degree exceeds ELL width k={k}")
    return nbr, eid, mask.astype(bool)
