"""ctypes bindings for the native host kernels (fastio.cpp), with
build-on-first-use and graceful fallback.

`get_lib()` returns the loaded library or None (set PEPR_NO_NATIVE=1 to
force the pure-Python paths; failures to build are silent and simply
fall back)."""

from __future__ import annotations

import ctypes
import os
import subprocess
import sys

import numpy as np

_HERE = os.path.dirname(__file__)
_SRC = os.path.join(_HERE, "fastio.cpp")
_LIB_PATH = os.path.join(_HERE, "libfastio.so")
_lib = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", _SRC, "-o", _LIB_PATH],
            check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def get_lib():
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    if os.environ.get("PEPR_NO_NATIVE") == "1":
        return None
    if not os.path.exists(_LIB_PATH) or \
            os.path.getmtime(_LIB_PATH) < os.path.getmtime(_SRC):
        if not _build():
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None
    lib.fasta_stats.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64)]
    lib.fasta_stats.restype = ctypes.c_int
    lib.fasta_parse.argtypes = [
        ctypes.c_char_p,
        np.ctypeslib.ndpointer(np.int8, flags="C"),
        np.ctypeslib.ndpointer(np.int8, flags="C"),
        np.ctypeslib.ndpointer(np.int64, flags="C"),
        np.ctypeslib.ndpointer(np.uint8, flags="C"),
        np.ctypeslib.ndpointer(np.int64, flags="C"),
        ctypes.c_int64]
    lib.fasta_parse.restype = ctypes.c_int
    lib.kmer_profiles.argtypes = [
        np.ctypeslib.ndpointer(np.int8, flags="C"),
        np.ctypeslib.ndpointer(np.int64, flags="C"),
        ctypes.c_int64, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_int,
        np.ctypeslib.ndpointer(np.float32, flags="C")]
    lib.kmer_profiles.restype = None
    lib.connected_components.argtypes = [
        ctypes.c_int64,
        np.ctypeslib.ndpointer(np.int64, flags="C"),
        np.ctypeslib.ndpointer(np.int64, flags="C"),
        ctypes.c_int64,
        np.ctypeslib.ndpointer(np.int64, flags="C")]
    lib.connected_components.restype = None
    _lib = lib
    return _lib


def native_read_fasta(path: str):
    """Returns (titles, list-of-code-arrays) or None if unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    from pepr_tpu.alphabet import ENCODE_LUT
    n = ctypes.c_int64()
    residues = ctypes.c_int64()
    tbytes = ctypes.c_int64()
    rc = lib.fasta_stats(path.encode(), ctypes.byref(n),
                         ctypes.byref(residues), ctypes.byref(tbytes))
    if rc != 0 or n.value == 0:
        return ([], []) if rc == 0 else None
    codes = np.empty(residues.value, dtype=np.int8)
    seq_off = np.zeros(n.value + 1, dtype=np.int64)
    titles_buf = np.zeros(tbytes.value + 1, dtype=np.uint8)
    title_off = np.zeros(n.value, dtype=np.int64)
    got = lib.fasta_parse(path.encode(), ENCODE_LUT, codes, seq_off,
                          titles_buf, title_off, n.value)
    if got != n.value:
        return None
    titles = []
    raw = titles_buf.tobytes()
    for i in range(n.value):
        start = int(title_off[i])
        end = raw.index(b"\0", start)
        titles.append(raw[start:end].decode("utf-8", "replace").strip())
    seqs = [codes[seq_off[i]:seq_off[i + 1]] for i in range(n.value)]
    return titles, seqs


def native_kmer_profiles(seqs, k: int, dim: int, clip: int):
    lib = get_lib()
    if lib is None:
        return None
    from pepr_tpu.alphabet import N_AA
    n = len(seqs)
    offsets = np.zeros(n + 1, dtype=np.int64)
    for i, s in enumerate(seqs):
        offsets[i + 1] = offsets[i] + len(s)
    cat = np.concatenate([np.asarray(s, np.int8) for s in seqs]) \
        if n and offsets[-1] else np.zeros(1, np.int8)
    cat = np.ascontiguousarray(cat)
    out = np.zeros((n, dim), dtype=np.float32)
    lib.kmer_profiles(cat, offsets, n, k, dim, clip, N_AA, out)
    return out


def native_connected_components(n: int, ei, ej):
    lib = get_lib()
    if lib is None:
        return None
    ei = np.ascontiguousarray(np.asarray(ei, dtype=np.int64))
    ej = np.ascontiguousarray(np.asarray(ej, dtype=np.int64))
    comp = np.zeros(n, dtype=np.int64)
    lib.connected_components(n, ei, ej, len(ei), comp)
    return comp
