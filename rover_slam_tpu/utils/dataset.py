"""Dataset IO: EuRoC/TUM-VI layout readers backed by the native C++ runtime.

The compute path is JAX on TPU; the host-side IO path (CSV parse, image decode,
read-ahead) is the C++ shared library in rover_slam_tpu/native/ (built by its
Makefile), bound via ctypes — the reference does this work with OpenCV +
inline parsing in its example mains. Falls back to pure-Python parsing when the
library isn't built.
"""
from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libdataset_loader.so")
_lib = None


def _load_lib():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        try:
            subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                           capture_output=True)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None
    lib.csv_open.restype = ctypes.c_void_p
    lib.csv_open.argtypes = [ctypes.c_char_p, ctypes.c_int]
    lib.csv_size.restype = ctypes.c_long
    lib.csv_size.argtypes = [ctypes.c_void_p]
    lib.csv_timestamps.argtypes = [ctypes.c_void_p, ctypes.POINTER(ctypes.c_double)]
    lib.csv_values.argtypes = [ctypes.c_void_p, ctypes.POINTER(ctypes.c_double)]
    lib.csv_field.restype = ctypes.c_int
    lib.csv_field.argtypes = [ctypes.c_void_p, ctypes.c_long, ctypes.c_char_p,
                              ctypes.c_int]
    lib.csv_close.argtypes = [ctypes.c_void_p]
    lib.pgm_read.restype = ctypes.c_int
    lib.pgm_read.argtypes = [ctypes.c_char_p, ctypes.POINTER(ctypes.c_uint8),
                             ctypes.c_long, ctypes.POINTER(ctypes.c_int),
                             ctypes.POINTER(ctypes.c_int)]
    lib.prefetch_open.restype = ctypes.c_void_p
    lib.prefetch_open.argtypes = [ctypes.POINTER(ctypes.c_char_p),
                                  ctypes.c_long, ctypes.c_long]
    lib.prefetch_fetch.restype = ctypes.c_int
    lib.prefetch_fetch.argtypes = [ctypes.c_void_p, ctypes.c_long,
                                   ctypes.POINTER(ctypes.c_uint8), ctypes.c_long]
    lib.prefetch_width.restype = ctypes.c_int
    lib.prefetch_width.argtypes = [ctypes.c_void_p]
    lib.prefetch_height.restype = ctypes.c_int
    lib.prefetch_height.argtypes = [ctypes.c_void_p]
    lib.prefetch_close.argtypes = [ctypes.c_void_p]
    _lib = lib
    return lib


def native_available() -> bool:
    return _load_lib() is not None


def read_csv(path: str, numeric: bool):
    """Parse an EuRoC-style CSV. Returns (timestamps_s [N], filenames list) or
    (timestamps_s, values [N,6]) when numeric (IMU)."""
    lib = _load_lib()
    if lib is None:
        return _read_csv_py(path, numeric)
    h = lib.csv_open(path.encode(), 1 if numeric else 0)
    if not h:
        raise FileNotFoundError(path)
    try:
        n = lib.csv_size(h)
        ts = np.zeros(n, np.float64)
        lib.csv_timestamps(h, ts.ctypes.data_as(ctypes.POINTER(ctypes.c_double)))
        if numeric:
            vals = np.zeros((n, 6), np.float64)
            lib.csv_values(h, vals.ctypes.data_as(ctypes.POINTER(ctypes.c_double)))
            return ts, vals
        buf = ctypes.create_string_buffer(512)
        names = []
        for i in range(n):
            lib.csv_field(h, i, buf, 512)
            names.append(buf.value.decode())
        return ts, names
    finally:
        lib.csv_close(h)


def read_pgm(path: str) -> np.ndarray:
    lib = _load_lib()
    if lib is None:
        return _read_pgm_py(path)
    cap = 8192 * 8192
    buf = np.zeros(cap, np.uint8)
    w = ctypes.c_int()
    h = ctypes.c_int()
    rc = lib.pgm_read(path.encode(), buf.ctypes.data_as(
        ctypes.POINTER(ctypes.c_uint8)), cap, ctypes.byref(w), ctypes.byref(h))
    if rc != 0:
        raise IOError(f"pgm_read({path}) -> {rc}")
    return buf[: w.value * h.value].reshape(h.value, w.value).copy()


class ImagePrefetcher:
    """Threaded read-ahead image stream (decode overlaps TPU compute)."""

    def __init__(self, paths, depth: int = 8):
        lib = _load_lib()
        if lib is None:
            raise RuntimeError("native dataset loader not built")
        self._lib = lib
        self._paths = [p.encode() for p in paths]
        arr = (ctypes.c_char_p * len(self._paths))(*self._paths)
        self._h = lib.prefetch_open(arr, len(self._paths), depth)
        self._n = len(paths)

    def __len__(self):
        return self._n

    def get(self, idx: int) -> np.ndarray:
        cap = 8192 * 8192
        buf = np.zeros(cap, np.uint8)
        rc = self._lib.prefetch_fetch(
            self._h, idx, buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            cap)
        if rc != 0:
            raise IOError(f"prefetch_fetch({idx}) -> {rc}")
        w = self._lib.prefetch_width(self._h)
        h = self._lib.prefetch_height(self._h)
        return buf[: w * h].reshape(h, w).copy()

    def close(self):
        if self._h:
            self._lib.prefetch_close(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


def load_euroc_sequence(root: str):
    """EuRoC mav0 layout: cam0/data.csv + cam0/data/<ts>.png|pgm,
    imu0/data.csv. Returns dict with timestamps, image paths, imu arrays."""
    cam_csv = os.path.join(root, "cam0", "data.csv")
    imu_csv = os.path.join(root, "imu0", "data.csv")
    t_cam, names = read_csv(cam_csv, numeric=False)
    img_dir = os.path.join(root, "cam0", "data")
    paths = [os.path.join(img_dir, n) for n in names]
    out = {"t_cam": t_cam, "image_paths": paths}
    if os.path.exists(imu_csv):
        t_imu, vals = read_csv(imu_csv, numeric=True)
        out["t_imu"] = t_imu
        out["gyro"] = vals[:, 0:3]
        out["acc"] = vals[:, 3:6]
    return out


# ---------------------------------------------------------------------------
# Pure-python fallbacks
# ---------------------------------------------------------------------------

def _read_csv_py(path, numeric):
    ts, other = [], []
    with open(path) as f:
        for line in f:
            if line.startswith("#") or not line.strip():
                continue
            parts = line.strip().split(",")
            ts.append(float(parts[0]) * 1e-9)
            if numeric:
                vals = [float(x) for x in parts[1:7]]
                vals += [0.0] * (6 - len(vals))
                other.append(vals)
            else:
                other.append(parts[1].strip())
    if numeric:
        return np.asarray(ts), np.asarray(other)
    return np.asarray(ts), other


def _read_pgm_py(path):
    with open(path, "rb") as f:
        data = f.read()
    assert data[:2] == b"P5"
    # Header: magic, width, height, maxval — with '#' comments allowed.
    pos, tokens = 2, []
    while len(tokens) < 3:
        while pos < len(data) and data[pos:pos + 1].isspace():
            pos += 1
        if data[pos:pos + 1] == b"#":
            while pos < len(data) and data[pos:pos + 1] != b"\n":
                pos += 1
            continue
        start = pos
        while pos < len(data) and not data[pos:pos + 1].isspace():
            pos += 1
        tokens.append(int(data[start:pos]))
    pos += 1  # single whitespace after maxval
    w, h = tokens[0], tokens[1]
    return np.frombuffer(data[pos:pos + w * h], np.uint8).reshape(h, w).copy()
