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
    if hasattr(lib, "glam_pack_batch"):
        FP = ctypes.POINTER(ctypes.c_float)
        IP = ctypes.POINTER(ctypes.c_int32)
        lib.glam_pack_batch.restype = ctypes.c_int
        lib.glam_pack_batch.argtypes = [
            ctypes.POINTER(FP), ctypes.POINTER(FP),
            ctypes.POINTER(IP), ctypes.POINTER(IP),
            np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS"),
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int,
            np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")]
    _lib = lib
    return lib


def pack_batch_native(graphs, num_nodes: int, num_edges: int, G: int,
                      fn: int, fe: int):
    """Native batch packing (C++ glam_pack_batch): the data-loader hot
    loop of ``pad_graphs``.  Returns (nodes, edges, senders, receivers,
    node_graph, node_pos, node_mask, edge_mask) with the framework's
    padding convention, byte-exact vs the Python path
    (tests/test_native.py).  Returns None when the library lacks the
    symbol (old build) so callers fall back."""
    lib = load_library()
    if lib is None or not hasattr(lib, "glam_pack_batch"):
        return None
    n = len(graphs)
    FP = ctypes.POINTER(ctypes.c_float)
    IP = ctypes.POINTER(ctypes.c_int32)
    nodes_p = (FP * n)()
    edges_p = (FP * n)()
    snd_p = (IP * n)()
    rcv_p = (IP * n)()
    n_cnt = np.empty(n, np.int64)
    e_cnt = np.empty(n, np.int64)
    keep = []  # hold contiguous views alive through the call
    for i, g in enumerate(graphs):
        gn = np.ascontiguousarray(g.nodes, np.float32)
        ge = np.ascontiguousarray(g.edges, np.float32)
        gs = np.ascontiguousarray(g.senders, np.int32)
        gr = np.ascontiguousarray(g.receivers, np.int32)
        keep.append((gn, ge, gs, gr))
        nodes_p[i] = gn.ctypes.data_as(FP)
        edges_p[i] = ge.ctypes.data_as(FP)
        snd_p[i] = gs.ctypes.data_as(IP)
        rcv_p[i] = gr.ctypes.data_as(IP)
        n_cnt[i] = gn.shape[0]
        e_cnt[i] = gs.shape[0]
    nodes = np.empty((num_nodes, fn), np.float32)
    edges = np.empty((num_edges, fe), np.float32)
    senders = np.empty(num_edges, np.int32)
    receivers = np.empty(num_edges, np.int32)
    node_graph = np.empty(num_nodes, np.int32)
    node_pos = np.empty(num_nodes, np.int32)
    node_mask = np.empty(num_nodes, np.uint8)
    edge_mask = np.empty(num_edges, np.uint8)
    rc = lib.glam_pack_batch(nodes_p, edges_p, snd_p, rcv_p, n_cnt,
                             e_cnt, n, fn, fe, num_nodes, num_edges, G,
                             nodes, edges, senders, receivers,
                             node_graph, node_pos, node_mask, edge_mask)
    if rc != 0:
        raise ValueError(
            f"batch over budget ({int(n_cnt.sum())} nodes, "
            f"{int(e_cnt.sum())} edges) > ({num_nodes}, {num_edges})")
    return (nodes, edges, senders, receivers, node_graph, node_pos,
            node_mask.astype(bool), edge_mask.astype(bool))


def available() -> bool:
    return load_library() is not None


def pack_enabled() -> bool:
    """C++ batch packer opt-in: measured SLOWER than the vectorized
    numpy pack loop at every batch size (see data/graph.py pad_graphs),
    so it is off by default; GLAM_NATIVE_PACK=1 enables it."""
    import os
    return (os.environ.get("GLAM_NATIVE_PACK", "0") == "1"
            and available())


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
