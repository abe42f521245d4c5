"""ctypes wrapper for the native flat inner-product index.

Replaces faiss.IndexIDMap(IndexFlatIP) as used by the replay buffer
(/root/reference/datasets/replay_buffer.py:395-445). The C++ library is
built lazily with make on first use; a pure-numpy fallback provides the
identical API if no compiler is available.
"""

from __future__ import annotations

import ctypes
import subprocess
import threading
from pathlib import Path

import numpy as np

_NATIVE_DIR = Path(__file__).parent
_LIB_PATH = _NATIVE_DIR / "libsimindex.so"
_BUILD_LOCK = threading.Lock()
_LIB = None
_LIB_FAILED = False


def _load_library():
    global _LIB, _LIB_FAILED
    if _LIB is not None or _LIB_FAILED:
        return _LIB
    with _BUILD_LOCK:
        if _LIB is not None or _LIB_FAILED:
            return _LIB
        try:
            # Always invoke make: it is a no-op when the .so is up to
            # date, and consults the Makefile's cpp dependency — gating
            # on _LIB_PATH.exists() would silently keep loading a stale
            # binary after simindex.cpp changes.
            subprocess.run(["make", "-C", str(_NATIVE_DIR)], check=True,
                           capture_output=True)
            lib = ctypes.CDLL(str(_LIB_PATH))
        except (OSError, subprocess.CalledProcessError):
            _LIB_FAILED = True
            return None

        lib.simindex_create.restype = ctypes.c_void_p
        lib.simindex_create.argtypes = [ctypes.c_int64]
        lib.simindex_free.argtypes = [ctypes.c_void_p]
        lib.simindex_size.restype = ctypes.c_int64
        lib.simindex_size.argtypes = [ctypes.c_void_p]
        lib.simindex_add_with_ids.argtypes = [
            ctypes.c_void_p, ctypes.c_int64,
            np.ctypeslib.ndpointer(np.int64, flags="C"),
            np.ctypeslib.ndpointer(np.float32, flags="C")]
        lib.simindex_search.argtypes = [
            ctypes.c_void_p, ctypes.c_int64,
            np.ctypeslib.ndpointer(np.float32, flags="C"), ctypes.c_int64,
            np.ctypeslib.ndpointer(np.float32, flags="C"),
            np.ctypeslib.ndpointer(np.int64, flags="C")]
        lib.simindex_remove_ids.restype = ctypes.c_int64
        lib.simindex_remove_ids.argtypes = [
            ctypes.c_void_p, ctypes.c_int64,
            np.ctypeslib.ndpointer(np.int64, flags="C")]
        lib.simindex_reconstruct.restype = ctypes.c_int
        lib.simindex_reconstruct.argtypes = [
            ctypes.c_void_p, ctypes.c_int64,
            np.ctypeslib.ndpointer(np.float32, flags="C")]
        lib.simindex_dump.argtypes = [
            ctypes.c_void_p,
            np.ctypeslib.ndpointer(np.int64, flags="C"),
            np.ctypeslib.ndpointer(np.float32, flags="C")]
        lib.simindex_pairwise.argtypes = [
            ctypes.c_void_p,
            np.ctypeslib.ndpointer(np.float32, flags="C")]
        _LIB = lib
        return _LIB


class SimIndex:
    """Exact inner-product index with external ids (native or numpy)."""

    def __init__(self, dim: int, force_numpy: bool = False):
        self.dim = int(dim)
        lib = None if force_numpy else _load_library()
        self._lib = lib
        if lib is not None:
            self._handle = lib.simindex_create(self.dim)
        else:
            self._vectors = np.zeros((0, self.dim), np.float32)
            self._ids = np.zeros((0,), np.int64)

    def __del__(self):
        if getattr(self, "_lib", None) is not None and \
                getattr(self, "_handle", None):
            self._lib.simindex_free(self._handle)
            self._handle = None

    # ------------------------------------------------------------------

    @property
    def ntotal(self) -> int:
        if self._lib is not None:
            return int(self._lib.simindex_size(self._handle))
        return int(self._ids.shape[0])

    def add_with_ids(self, vectors: np.ndarray, ids: np.ndarray) -> None:
        vectors = np.ascontiguousarray(vectors, np.float32)
        ids = np.ascontiguousarray(ids, np.int64).reshape(-1)
        assert vectors.shape == (ids.shape[0], self.dim)
        if self._lib is not None:
            self._lib.simindex_add_with_ids(self._handle, ids.shape[0], ids,
                                            vectors)
        else:
            self._vectors = np.concatenate([self._vectors, vectors])
            self._ids = np.concatenate([self._ids, ids])

    def search(self, queries: np.ndarray, k: int):
        """Returns (scores (nq, k) descending, ids (nq, k); -1 pads)."""
        queries = np.ascontiguousarray(queries, np.float32)
        if queries.ndim == 1:
            queries = queries[None]
        assert queries.shape[1] == self.dim, (
            f"query width {queries.shape[1]} != index dim {self.dim}")
        nq = queries.shape[0]
        if self._lib is not None:
            scores = np.empty((nq, k), np.float32)
            ids = np.empty((nq, k), np.int64)
            self._lib.simindex_search(self._handle, nq, queries, k, scores,
                                      ids)
            return scores, ids
        if self.ntotal == 0:
            return (np.full((nq, k), -np.inf, np.float32),
                    np.full((nq, k), -1, np.int64))
        sims = queries @ self._vectors.T  # (nq, n)
        order = np.argsort(-sims, axis=1, kind="stable")[:, :k]
        top_scores = np.take_along_axis(sims, order, axis=1)
        top_ids = self._ids[order]
        if order.shape[1] < k:
            pad = k - order.shape[1]
            top_scores = np.pad(top_scores, ((0, 0), (0, pad)),
                                constant_values=-np.inf)
            top_ids = np.pad(top_ids, ((0, 0), (0, pad)),
                             constant_values=-1)
        return top_scores.astype(np.float32), top_ids

    def remove_ids(self, ids: np.ndarray) -> int:
        ids = np.ascontiguousarray(ids, np.int64).reshape(-1)
        if self._lib is not None:
            return int(self._lib.simindex_remove_ids(self._handle,
                                                     ids.shape[0], ids))
        keep = ~np.isin(self._ids, ids)
        removed = int((~keep).sum())
        self._vectors = self._vectors[keep]
        self._ids = self._ids[keep]
        return removed

    def reconstruct(self, external_id: int) -> np.ndarray:
        if self._lib is not None:
            out = np.empty((self.dim,), np.float32)
            status = self._lib.simindex_reconstruct(self._handle,
                                                    int(external_id), out)
            if status != 0:
                raise KeyError(f"id {external_id} not in index")
            return out
        matches = np.where(self._ids == external_id)[0]
        if matches.size == 0:
            raise KeyError(f"id {external_id} not in index")
        return self._vectors[matches[0]].copy()

    def dump(self):
        """(ids, vectors) in insertion order — for save_state/load_state."""
        n = self.ntotal
        if self._lib is not None:
            ids = np.empty((n,), np.int64)
            vectors = np.empty((n, self.dim), np.float32)
            if n:
                self._lib.simindex_dump(self._handle, ids, vectors)
            return ids, vectors
        return self._ids.copy(), self._vectors.copy()

    def pairwise_similarity(self) -> np.ndarray:
        n = self.ntotal
        if self._lib is not None:
            out = np.empty((n, n), np.float32)
            if n:
                self._lib.simindex_pairwise(self._handle, out)
            return out
        return (self._vectors @ self._vectors.T).astype(np.float32)
