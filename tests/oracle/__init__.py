"""ctypes wrapper around the reference-library test oracle.

Builds the reference C libraries (from /root/reference) and the oracle shim
on demand into /tmp/sift3d_oracle. Tests that need the oracle should call
get_oracle() and skip if it returns None.
"""

from __future__ import annotations

import ctypes
import os
import pathlib
import subprocess

import numpy as np

REF_DIR = os.environ.get("SIFT3D_REF_DIR", "/root/reference")
BUILD_DIR = pathlib.Path(os.environ.get("SIFT3D_ORACLE_BUILD",
                                        "/tmp/sift3d_oracle"))
_ORACLE_C = pathlib.Path(__file__).with_name("oracle.c")

_lib = None
_tried = False
_MININIFTI_SRC = pathlib.Path(__file__).with_name("mini_nifti")


def _build_mininifti() -> pathlib.Path | None:
    """Build the from-scratch nifti1_io shim (mini_nifti/) into
    BUILD_DIR/mininifti with the NIFTIConfig.cmake package layout, so the
    reference builds WITH_NIFTI and its CLIs can read/write .nii[.gz]."""
    out = BUILD_DIR / "mininifti"
    so = out / "lib" / "libniftiio.so"
    src = _MININIFTI_SRC / "mini_nifti.c"
    hdr = _MININIFTI_SRC / "nifti1_io.h"
    stamp = max(src.stat().st_mtime, hdr.stat().st_mtime)
    if so.exists() and so.stat().st_mtime >= stamp:
        return out
    (out / "lib").mkdir(parents=True, exist_ok=True)
    (out / "include").mkdir(parents=True, exist_ok=True)
    try:
        subprocess.run(
            ["gcc", "-O2", "-shared", "-fPIC", f"-I{_MININIFTI_SRC}",
             str(src), "-o", str(so), "-lz"],
            check=True, capture_output=True)
        # The reference's cmake/FindNIFTI.cmake (module mode, wins over
        # config mode) also demands nifti1.h and the nifticdf/znz libs;
        # satisfy it with a header alias and empty stub libraries.
        empty = out / "empty.c"
        empty.write_text("int mini_nifti_stub_;\n")
        for stub in ("libnifticdf.so", "libznz.so"):
            subprocess.run(
                ["gcc", "-O2", "-shared", "-fPIC", str(empty),
                 "-o", str(out / "lib" / stub)],
                check=True, capture_output=True)
    except (subprocess.CalledProcessError, FileNotFoundError):
        return None
    import shutil
    shutil.copy(hdr, out / "include" / "nifti1_io.h")
    shutil.copy(hdr, out / "include" / "nifti1.h")
    shutil.copy(_MININIFTI_SRC / "NIFTIConfig.cmake", out)
    return out


def _build() -> pathlib.Path | None:
    so = BUILD_DIR / "liboracle.so"
    ref_build = BUILD_DIR / "refbuild"
    nifti_marker = ref_build / ".with_nifti"
    if (so.exists() and so.stat().st_mtime >= _ORACLE_C.stat().st_mtime
            and nifti_marker.exists()):
        return so
    if not pathlib.Path(REF_DIR).is_dir():
        return None
    BUILD_DIR.mkdir(parents=True, exist_ok=True)
    mininifti = _build_mininifti()
    if mininifti is not None and not nifti_marker.exists():
        # Stale NIFTI-less build (the WITH_NIFTI cache var sticks at
        # FALSE once configured): wipe and reconfigure from scratch.
        import shutil
        shutil.rmtree(ref_build, ignore_errors=True)
    ref_build.mkdir(parents=True, exist_ok=True)
    lapack = "/lib/x86_64-linux-gnu/liblapack.so.3"
    blas = "/lib/x86_64-linux-gnu/libblas.so.3"
    nifti_flags = [] if mininifti is None else [
        "-DWITH_NIFTI=TRUE", f"-DNIFTI_DIR={mininifti}"]
    try:
        if not (ref_build / "lib" / "libsift3D.so").exists():
            subprocess.run(
                ["cmake", REF_DIR, "-DCMAKE_BUILD_TYPE=Release",
                 "-DBUILD_Matlab=OFF", "-DBUILD_EXAMPLES=OFF", "-G", "Ninja",
                 f"-DBLAS_LIBRARIES={blas}",
                 f"-DLAPACK_LIBRARIES={lapack};{blas}"] + nifti_flags,
                cwd=ref_build, check=True, capture_output=True)
            subprocess.run(["ninja"], cwd=ref_build, check=True,
                           capture_output=True)
            if mininifti is not None:
                nifti_marker.touch()
        subprocess.run(
            ["gcc", "-O2", "-shared", "-fPIC",
             f"-I{REF_DIR}/imutil", f"-I{REF_DIR}/sift3d", f"-I{REF_DIR}/reg",
             str(_ORACLE_C), "-o", str(so),
             f"-L{ref_build}/lib", "-lreg", "-lsift3D", "-limutil",
             lapack, blas, "-lz", "-lm", "-fopenmp",
             f"-Wl,-rpath,{ref_build}/lib"],
            check=True, capture_output=True)
    except (subprocess.CalledProcessError, FileNotFoundError):
        return None
    return so


def get_oracle():
    """Return the loaded oracle library, or None if unavailable."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    so = _build()
    if so is None:
        return None
    lib = ctypes.CDLL(str(so))
    f64p = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")
    f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
    c = ctypes
    lib.orc_detect.restype = c.c_int
    lib.orc_detect.argtypes = [f32p] + [c.c_int] * 3 + [c.c_double] * 5 + \
        [f64p, c.c_int]
    lib.orc_gpyr_dims.restype = c.c_int
    lib.orc_gpyr_dims.argtypes = [c.c_int, c.c_int,
                                  np.ctypeslib.ndpointer(np.int32)]
    lib.orc_get_gpyr.restype = c.c_int
    lib.orc_get_gpyr.argtypes = [c.c_int, c.c_int, f32p]
    lib.orc_get_dog.restype = c.c_int
    lib.orc_get_dog.argtypes = [c.c_int, c.c_int, f32p]
    lib.orc_num_octaves.restype = c.c_int
    lib.orc_extract.restype = c.c_int
    lib.orc_extract.argtypes = [f64p, c.c_int]
    lib.orc_gauss_blur.restype = c.c_int
    lib.orc_gauss_blur.argtypes = [f32p] + [c.c_int] * 3 + [c.c_double] * 5 + \
        [f32p]
    lib.orc_extract_raw.restype = c.c_int
    lib.orc_extract_raw.argtypes = [f32p] + [c.c_int] * 3 + \
        [c.c_double] * 3 + [f64p, c.c_int, f64p, c.c_int]
    lib.orc_dense.restype = c.c_int
    lib.orc_dense.argtypes = [f32p] + [c.c_int] * 3 + [c.c_double] * 3 + [f32p]
    lib.orc_inv_transform.restype = c.c_int
    lib.orc_inv_transform.argtypes = [f32p] + [c.c_int] * 3 + \
        [f64p, c.c_int, f32p]
    lib.orc_match.restype = c.c_int
    lib.orc_match.argtypes = [f32p, c.c_int, f32p, c.c_int, c.c_double, i32p]
    lib.orc_ransac.restype = c.c_int
    lib.orc_ransac.argtypes = [f64p, f64p, c.c_int, c.c_double, c.c_int,
                               c.c_uint, f64p]
    _lib = lib
    return _lib


class Oracle:
    """Convenience numpy-level interface over the ctypes oracle."""

    def __init__(self, lib):
        self.lib = lib

    def detect(self, vol_zyx: np.ndarray, units=(1.0, 1.0, 1.0),
               peak_thresh=0.1, corner_thresh=0.4, cap=100000):
        nz, ny, nx = vol_zyx.shape
        out = np.zeros((cap, 14), np.float64)
        n = self.lib.orc_detect(
            np.ascontiguousarray(vol_zyx, np.float32), nx, ny, nz,
            units[0], units[1], units[2], peak_thresh, corner_thresh,
            out, cap)
        if n < 0:
            raise RuntimeError("orc_detect failed")
        return out[:n]

    def gpyr_level(self, o, s):
        dims = np.zeros(3, np.int32)
        if self.lib.orc_gpyr_dims(o, s, dims) != 0:
            raise ValueError(f"no gpyr level ({o},{s})")
        nx, ny, nz = (int(d) for d in dims)
        out = np.zeros(nz * ny * nx, np.float32)
        self.lib.orc_get_gpyr(o, s, out)
        return out.reshape(nz, ny, nx)

    def dog_level(self, o, s):
        dims = np.zeros(3, np.int32)
        if self.lib.orc_gpyr_dims(o, s, dims) != 0:
            raise ValueError(f"no level ({o},{s})")
        nx, ny, nz = (int(d) for d in dims)
        out = np.zeros(nz * ny * nx, np.float32)
        self.lib.orc_get_dog(o, s, out)
        return out.reshape(nz, ny, nx)

    def extract(self, cap=100000):
        out = np.zeros((cap, 772), np.float64)
        n = self.lib.orc_extract(out, cap)
        if n < 0:
            raise RuntimeError("orc_extract failed")
        return out[:n]

    def gauss_blur(self, vol_zyx, units=(1.0, 1.0, 1.0), sigma=1.6, unit=1.0):
        nz, ny, nx = vol_zyx.shape
        out = np.zeros(nz * ny * nx, np.float32)
        r = self.lib.orc_gauss_blur(
            np.ascontiguousarray(vol_zyx, np.float32), nx, ny, nz,
            units[0], units[1], units[2], sigma, unit, out)
        if r < 0:
            raise RuntimeError("orc_gauss_blur failed")
        return out.reshape(nz, ny, nx)

    def extract_raw(self, vol_zyx: np.ndarray, kp_rows15: np.ndarray,
                    units=(1.0, 1.0, 1.0), cap=100000):
        """kp_rows15: (N, 15) [x y z o s sd R00..R22]."""
        nz, ny, nx = vol_zyx.shape
        out = np.zeros((cap, 772), np.float64)
        n = self.lib.orc_extract_raw(
            np.ascontiguousarray(vol_zyx, np.float32), nx, ny, nz,
            units[0], units[1], units[2],
            np.ascontiguousarray(kp_rows15, np.float64), len(kp_rows15),
            out, cap)
        if n < 0:
            raise RuntimeError("orc_extract_raw failed")
        return out[:n]

    def set_dense_rotate(self, flag: bool):
        self.lib.orc_set_dense_rotate(1 if flag else 0)

    def dense(self, vol_zyx: np.ndarray, units=(1.0, 1.0, 1.0)):
        nz, ny, nx = vol_zyx.shape
        out = np.zeros(12 * nz * ny * nx, np.float32)
        r = self.lib.orc_dense(
            np.ascontiguousarray(vol_zyx, np.float32), nx, ny, nz,
            units[0], units[1], units[2], out)
        if r != 0:
            raise RuntimeError("orc_dense failed")
        return out.reshape(12, nz, ny, nx)

    def inv_transform(self, vol_zyx: np.ndarray, A: np.ndarray,
                      interp="linear"):
        nz, ny, nx = vol_zyx.shape
        out = np.zeros(nz * ny * nx, np.float32)
        r = self.lib.orc_inv_transform(
            np.ascontiguousarray(vol_zyx, np.float32), nx, ny, nz,
            np.ascontiguousarray(A, np.float64),
            0 if interp == "linear" else 1, out)
        if r != 0:
            raise RuntimeError("orc_inv_transform failed")
        return out.reshape(nz, ny, nx)

    def match(self, d1: np.ndarray, d2: np.ndarray, nn_thresh=0.8):
        n1, n2 = len(d1), len(d2)
        out = np.zeros(n1, np.int32)
        r = self.lib.orc_match(
            np.ascontiguousarray(d1, np.float32), n1,
            np.ascontiguousarray(d2, np.float32), n2, nn_thresh, out)
        if r != 0:
            raise RuntimeError("orc_match failed")
        return out

    def ransac(self, src: np.ndarray, ref: np.ndarray, err_thresh=5.0,
               num_iter=500, seed=1):
        A = np.zeros((3, 4), np.float64)
        r = self.lib.orc_ransac(
            np.ascontiguousarray(src, np.float64),
            np.ascontiguousarray(ref, np.float64), len(src),
            err_thresh, num_iter, seed, A)
        if r != 0:
            raise RuntimeError("orc_ransac failed (no model found?)")
        return A


def get() -> Oracle | None:
    lib = get_oracle()
    return Oracle(lib) if lib is not None else None


def cli_bins() -> dict[str, pathlib.Path] | None:
    """Paths to the NIFTI-enabled reference CLI binaries
    (kpSift3D / regSift3D / denseSift3D), building them if needed.
    Returns None if the build is unavailable or was made without the
    mini-nifti shim (in which case the CLIs can't read any image)."""
    if _build() is None:
        return None
    ref_build = BUILD_DIR / "refbuild"
    if not (ref_build / ".with_nifti").exists():
        return None
    bins = {n: ref_build / "bin" / n
            for n in ("kpSift3D", "regSift3D", "denseSift3D")}
    return bins if all(p.exists() for p in bins.values()) else None
