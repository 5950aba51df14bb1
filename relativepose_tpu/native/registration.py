"""ctypes bindings for the native registration library (cpp/registration.cpp).

Numpy in, numpy out; every function returns a 4x4 transform mapping source
points into the target frame.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_LIB = None


def _repo_root():
    return os.path.abspath(
        os.path.join(os.path.dirname(__file__), "..", ".."))


def _load():
    global _LIB
    if _LIB is not None:
        return _LIB
    cpp_dir = os.path.join(_repo_root(), "cpp")
    so_path = os.path.join(cpp_dir, "librpregistration.so")
    if not os.path.exists(so_path):
        subprocess.run(["make", "-C", cpp_dir], check=True,
                       capture_output=True)
    lib = ctypes.CDLL(so_path)
    D = ctypes.POINTER(ctypes.c_double)
    F = ctypes.POINTER(ctypes.c_float)
    lib.rp_global_registration.argtypes = [
        D, ctypes.c_int, D, ctypes.c_int, ctypes.c_double, ctypes.c_int,
        ctypes.c_uint64, D]
    lib.rp_fast_global_registration.argtypes = [
        D, ctypes.c_int, D, ctypes.c_int, ctypes.c_double, D]
    lib.rp_colored_registration.argtypes = [
        D, D, ctypes.c_int, D, D, ctypes.c_int, ctypes.c_double,
        ctypes.c_uint64, D]
    lib.rp_super4pcs.argtypes = [
        D, ctypes.c_int, D, ctypes.c_int, ctypes.c_double, ctypes.c_double,
        ctypes.c_double, ctypes.c_int, ctypes.c_uint64, D]
    lib.rp_icp_point_to_plane.argtypes = [
        D, ctypes.c_int, D, ctypes.c_int, ctypes.c_double, ctypes.c_double,
        ctypes.c_int, D, D]
    lib.rp_voxel_downsample.argtypes = [
        D, ctypes.c_int, ctypes.c_double, D, ctypes.c_int]
    lib.rp_voxel_downsample.restype = ctypes.c_int
    lib.rp_estimate_normals.argtypes = [D, ctypes.c_int, ctypes.c_double, D]
    lib.rp_fpfh.argtypes = [D, ctypes.c_int, ctypes.c_double,
                            ctypes.c_double, F]
    lib.rp_overlap_stats.argtypes = [
        D, ctypes.c_int, D, ctypes.c_int, D, ctypes.c_double, D]
    _LIB = lib
    return lib


def _cptr(arr):
    return arr.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def _prep(pc):
    a = np.ascontiguousarray(np.asarray(pc, np.float64).reshape(-1, 3))
    return a, len(a)


def global_registration(pc_src, pc_tgt, voxel=0.05, max_iters=40000,
                        seed=0):
    lib = _load()
    s, ns = _prep(pc_src)
    t, nt = _prep(pc_tgt)
    out = np.eye(4)
    lib.rp_global_registration(_cptr(s), ns, _cptr(t), nt, voxel, max_iters,
                               seed, _cptr(out))
    return out


def fast_global_registration(pc_src, pc_tgt, voxel=0.05):
    lib = _load()
    s, ns = _prep(pc_src)
    t, nt = _prep(pc_tgt)
    out = np.eye(4)
    lib.rp_fast_global_registration(_cptr(s), ns, _cptr(t), nt, voxel,
                                    _cptr(out))
    return out


def colored_registration(pc_src, pc_tgt, col_src, col_tgt, voxel=0.05,
                         seed=0):
    lib = _load()
    s, ns = _prep(pc_src)
    t, nt = _prep(pc_tgt)
    cs, _ = _prep(col_src)
    ct, _ = _prep(col_tgt)
    out = np.eye(4)
    lib.rp_colored_registration(_cptr(s), _cptr(cs), ns, _cptr(t), _cptr(ct),
                                nt, voxel, seed, _cptr(out))
    return out


def super4pcs(pc_src, pc_tgt, overlap=0.5, delta=0.1, time_budget_s=240.0,
              n_points=200, seed=0):
    lib = _load()
    s, ns = _prep(pc_src)
    t, nt = _prep(pc_tgt)
    out = np.eye(4)
    lib.rp_super4pcs(_cptr(s), ns, _cptr(t), nt, overlap, delta,
                     time_budget_s, n_points, seed, _cptr(out))
    return out


def icp_point_to_plane(pc_src, pc_tgt, voxel=0.02, max_dist=0.05, iters=30,
                       init=None):
    lib = _load()
    s, ns = _prep(pc_src)
    t, nt = _prep(pc_tgt)
    out = np.eye(4)
    init_arr = np.ascontiguousarray(
        np.asarray(init if init is not None else np.eye(4), np.float64))
    lib.rp_icp_point_to_plane(_cptr(s), ns, _cptr(t), nt, voxel, max_dist,
                              iters, _cptr(init_arr), _cptr(out))
    return out


def voxel_downsample(pc, voxel):
    lib = _load()
    p, n = _prep(pc)
    out = np.zeros((n, 3))
    m = lib.rp_voxel_downsample(_cptr(p), n, voxel, _cptr(out), n)
    return out[: min(m, n)]


def estimate_normals(pc, radius):
    lib = _load()
    p, n = _prep(pc)
    out = np.zeros((n, 3))
    lib.rp_estimate_normals(_cptr(p), n, radius, _cptr(out))
    return out


def fpfh(pc, normal_radius=0.1, feat_radius=0.25):
    lib = _load()
    p, n = _prep(pc)
    out = np.zeros((n, 33), np.float32)
    lib.rp_fpfh(_cptr(p), n, normal_radius, feat_radius,
                out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    return out


def overlap_stats(pc_src, pc_tgt, T_gt, thresh=0.08):
    """Host-native overlap statistics (core/overlap.py semantics via the
    C++ GridNN) — O(N) per scan, usable on the 300k-point scannet
    full-frame clouds where the chunked-matmul path is O(N^2)."""
    lib = _load()
    s, ns = _prep(pc_src)
    t, nt = _prep(pc_tgt)
    T = np.ascontiguousarray(np.asarray(T_gt, np.float64).reshape(4, 4))
    out = np.zeros(5)
    lib.rp_overlap_stats(_cptr(s), ns, _cptr(t), nt, _cptr(T), thresh,
                         _cptr(out))
    return {"overlap": out[0], "cam_dist": out[1], "pc_dist": out[2],
            "pc_nn": out[3]}
