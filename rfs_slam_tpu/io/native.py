"""ctypes bindings for the native IO runtime (native/rfsio.cpp).

Loads ``librfsio.so`` when present (``make -C native rfsio``); callers fall
back to pure-Python paths when it is not.  This is the framework's native
(C++) IO tier, mirroring the reference's fprintf/fscanf logging and ingest
(rbphdslam2dSim.cpp:369-441, rbphdslam_VictoriaPark.cpp:199-324).
"""

from __future__ import annotations

import ctypes
import os

import numpy as np

_LIB = None
_TRIED = False


def _find_lib():
    here = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    return os.path.join(here, "native", "librfsio.so")


def lib():
    """The loaded library or None."""
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    path = _find_lib()
    if not os.path.exists(path):
        return None
    try:
        L = ctypes.CDLL(path)
    except OSError:
        return None
    L.rfsio_write_particle_poses.restype = ctypes.c_int
    L.rfsio_write_particle_poses.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_double),
        ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
        ctypes.c_long, ctypes.c_long]
    L.rfsio_write_landmark_estimates.restype = ctypes.c_int
    L.rfsio_write_landmark_estimates.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_double),
        ctypes.POINTER(ctypes.c_long), ctypes.POINTER(ctypes.c_double),
        ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
        ctypes.POINTER(ctypes.c_ubyte), ctypes.c_long, ctypes.c_long]
    L.rfsio_read_values.restype = ctypes.c_long
    L.rfsio_read_values.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_double), ctypes.c_long]
    _LIB = L
    return _LIB


def _dptr(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def write_particle_poses(path: str, times, poses, weights) -> bool:
    """Native particlePose.dat writer; returns False if unavailable."""
    L = lib()
    if L is None:
        return False
    times = np.ascontiguousarray(times, np.float64)
    poses = np.ascontiguousarray(poses, np.float64)
    weights = np.ascontiguousarray(weights, np.float64)
    T, P, _ = poses.shape
    rc = L.rfsio_write_particle_poses(
        path.encode(), _dptr(times), _dptr(poses), _dptr(weights), T, P)
    return rc == 0


def write_landmark_estimates(path: str, times, best, means, covs_packed,
                             ws, alive) -> bool:
    """Native landmarkEst.dat writer (packed [T, M, 3] covariances)."""
    L = lib()
    if L is None:
        return False
    times = np.ascontiguousarray(times, np.float64)
    best = np.ascontiguousarray(best, np.int64)
    means = np.ascontiguousarray(means, np.float64)
    covs = np.ascontiguousarray(covs_packed, np.float64)
    ws = np.ascontiguousarray(ws, np.float64)
    alive = np.ascontiguousarray(alive, np.uint8)
    T, M, _ = means.shape
    rc = L.rfsio_write_landmark_estimates(
        path.encode(), _dptr(times),
        best.ctypes.data_as(ctypes.POINTER(ctypes.c_long)),
        _dptr(means), _dptr(covs), _dptr(ws),
        alive.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)), T, M)
    return rc == 0


def read_values(path: str) -> np.ndarray | None:
    """Bulk-parse a numeric text file; None if the native lib is absent."""
    L = lib()
    if L is None:
        return None
    n = L.rfsio_read_values(path.encode(), None, 0)
    if n < 0:
        raise IOError(f"rfsio failed to read {path}")
    out = np.empty(n, np.float64)
    got = L.rfsio_read_values(path.encode(), _dptr(out), n)
    assert got == n
    return out


def loadtxt(path: str, ncols: int | None = None) -> np.ndarray | None:
    """np.loadtxt equivalent via the native parser (uniform-column files)."""
    vals = read_values(path)
    if vals is None:
        return None
    if ncols is None:
        with open(path) as f:
            for line in f:
                if line.strip() and not line.startswith("#"):
                    ncols = len(line.split())
                    break
    if not ncols:
        return vals
    return vals.reshape(-1, ncols)
