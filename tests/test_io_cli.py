"""IO round-trips (Sift3DTest.m:440-763 analogs) and CLI smoke tests."""

import os



import numpy as np
import pytest

from sift3d_tpu.io import (im_read, im_write, FileDoesNotExistError,
                           UnsupportedFileTypeError)
from sift3d_tpu.io.volume import Volume
from sift3d_tpu.io.csv import (read_mat, write_mat, write_affine,
                               read_descriptors, write_descriptors)

from tests.conftest import make_blob_volume


def test_nifti_roundtrip_3d(tmp_path, rng):
    vol = rng.random((9, 7, 11)).astype(np.float32)
    path = str(tmp_path / "a.nii")
    im_write(path, Volume(vol, (1.5, 2.0, 0.5)))
    back = im_read(path)
    np.testing.assert_allclose(back.data, vol, atol=0)
    assert back.units == (1.5, 2.0, 0.5)


def test_nifti_roundtrip_gz_multichannel(tmp_path, rng):
    vol = rng.random((6, 5, 4, 3)).astype(np.float32)
    path = str(tmp_path / "b.nii.gz")
    im_write(path, Volume(vol))
    back = im_read(path)
    assert back.data.shape == (6, 5, 4, 3)
    np.testing.assert_allclose(back.data, vol, atol=0)


def test_nifti_roundtrip_2d(tmp_path, rng):
    # 2D image = one z slice (Sift3DTest.m:515-533).
    vol = rng.random((1, 8, 9)).astype(np.float32)
    path = str(tmp_path / "c.nii")
    im_write(path, Volume(vol))
    back = im_read(path)
    assert back.data.shape == (1, 8, 9)
    np.testing.assert_allclose(back.data, vol)


def test_nifti_scl_slope(tmp_path):
    # Hand-craft an int16 file with slope/inter; reader must apply them
    # (nifti.c:100-111).
    import struct
    nx, ny, nz = 4, 3, 2
    data = np.arange(nx * ny * nz, dtype=np.int16)
    hdr = bytearray(348)
    struct.pack_into("<i", hdr, 0, 348)
    struct.pack_into("<8h", hdr, 40, 3, nx, ny, nz, 1, 1, 1, 1)
    struct.pack_into("<h", hdr, 70, 4)        # int16
    struct.pack_into("<h", hdr, 72, 16)
    struct.pack_into("<8f", hdr, 76, 1, 2.0, 3.0, 4.0, 1, 1, 1, 1)
    struct.pack_into("<f", hdr, 108, 352.0)
    struct.pack_into("<f", hdr, 112, 2.5)     # slope
    struct.pack_into("<f", hdr, 116, -1.0)    # inter
    struct.pack_into("<4s", hdr, 344, b"n+1\x00")
    path = str(tmp_path / "s.nii")
    with open(path, "wb") as f:
        f.write(bytes(hdr) + b"\x00" * 4 + data.tobytes())
    v = im_read(path)
    want = data.astype(np.float64).reshape(nz, ny, nx) * 2.5 - 1.0
    np.testing.assert_allclose(v.data, want.astype(np.float32))
    assert v.units == (2.0, 3.0, 4.0)


def test_analyze_img_roundtrip(tmp_path, rng):
    """ANALYZE / NIFTI-pair .img write -> read round trip + dispatch
    (reference routes .img through the NIFTI reader, imutil.c:1181)."""
    from sift3d_tpu.io import im_read, im_write
    from sift3d_tpu.io.volume import Volume
    vol = rng.random((5, 6, 7)).astype(np.float32)
    path = str(tmp_path / "a.img")
    im_write(path, Volume(vol, (1.5, 2.0, 0.5)))
    assert (tmp_path / "a.hdr").exists()
    back = im_read(path)
    assert back.units == (1.5, 2.0, 0.5)
    np.testing.assert_array_equal(back.data, vol)


def test_analyze75_crafted_read(tmp_path, rng):
    """A crafted ANALYZE 7.5 pair (blank magic, funused scl fields) must
    read with slope/intercept ignored."""
    import struct
    from sift3d_tpu.io import im_read
    nx, ny, nz = 4, 3, 2
    data = (rng.random((nz, ny, nx)) * 100).astype(np.int16)
    hdr = bytearray(348)
    struct.pack_into("<i", hdr, 0, 348)
    struct.pack_into("<8h", hdr, 40, 3, nx, ny, nz, 1, 1, 1, 1)
    struct.pack_into("<h", hdr, 70, 4)            # int16
    struct.pack_into("<h", hdr, 72, 16)           # bitpix
    struct.pack_into("<8f", hdr, 76, 1.0, 2.0, 3.0, 4.0, 1, 1, 1, 1)
    # garbage in the NIFTI scl fields: funused in ANALYZE, must be ignored
    struct.pack_into("<f", hdr, 112, 7.5)
    struct.pack_into("<f", hdr, 116, -3.0)
    (tmp_path / "b.hdr").write_bytes(bytes(hdr))
    (tmp_path / "b.img").write_bytes(data.tobytes())
    v = im_read(str(tmp_path / "b.img"))
    assert v.data.shape == (nz, ny, nx)
    assert v.units == (2.0, 3.0, 4.0)
    np.testing.assert_array_equal(v.data, data.astype(np.float32))


def test_io_errors(tmp_path):
    with pytest.raises(FileDoesNotExistError):
        im_read(str(tmp_path / "missing.nii"))
    with pytest.raises(UnsupportedFileTypeError):
        im_write(str(tmp_path / "bad.xyz"),
                 Volume(np.zeros((2, 2, 2), np.float32)))
    with pytest.raises(ValueError):
        Volume(np.zeros((2, 2, 2), np.float32), units=(0, 1, 1))


def test_csv_roundtrip(tmp_path, rng):
    m = rng.random((5, 4))
    path = str(tmp_path / "m.csv")
    write_mat(path, m)
    with open(path) as f:
        first = f.readline()
    assert first.count(",") == 3 and first.endswith("\n")
    back = read_mat(path)
    np.testing.assert_allclose(back, m, atol=1e-6)   # %f has 6 decimals
    # gz variant
    write_mat(str(tmp_path / "m.csv.gz"), m)
    np.testing.assert_allclose(read_mat(str(tmp_path / "m.csv.gz")), m,
                               atol=1e-6)


def test_descriptor_csv_shape_check(tmp_path, rng):
    rows = rng.random((3, 771)).astype(np.float32)
    path = str(tmp_path / "d.csv")
    write_descriptors(path, rows)
    back = read_descriptors(path)
    assert back.shape == (3, 771)


def test_cli_kp_smoke(tmp_path):
    from sift3d_tpu.cli.kp import main
    vol = make_blob_volume((24, 24, 24), seed=5)
    inp = str(tmp_path / "in.nii.gz")
    im_write(inp, Volume(vol))
    keys = str(tmp_path / "keys.csv")
    desc = str(tmp_path / "desc.csv.gz")
    assert main(["--keys", keys, "--desc", desc, inp]) == 0
    k = read_mat(keys)
    assert k.shape[1] == 14 and len(k) > 0
    d = read_descriptors(desc)
    assert len(d) == len(k)


def test_cli_reg_smoke(tmp_path):
    from sift3d_tpu.cli.reg import main
    vol = make_blob_volume((40, 40, 40), seed=6)
    src = str(tmp_path / "src.nii")
    ref = str(tmp_path / "ref.nii")
    im_write(src, Volume(vol))
    im_write(ref, Volume(np.roll(vol, (1, -2, 2), axis=(0, 1, 2))))
    tform = str(tmp_path / "t.csv")
    matches = str(tmp_path / "m.csv")
    warped = str(tmp_path / "w.nii.gz")
    assert main(["--transform", tform, "--matches", matches,
                 "--warped", warped, src, ref]) == 0
    A = read_mat(tform)
    assert A.shape == (3, 4)
    np.testing.assert_allclose(A[:, :3], np.eye(3), atol=0.1)
    w = im_read(warped)
    assert w.data.shape == (40, 40, 40)


def test_cli_dense_smoke(tmp_path):
    from sift3d_tpu.cli.dense import main
    vol = make_blob_volume((12, 12, 12), seed=8)
    inp = str(tmp_path / "in.nii")
    im_write(inp, Volume(vol))
    out = str(tmp_path / "out%.nii")
    assert main([inp, out]) == 0
    for c in range(12):
        v = im_read(str(tmp_path / f"out{c}.nii"))
        assert v.data.shape == (12, 12, 12)


def test_match_from_descriptor_csv(tmp_path, rng):
    """matchSift3D workflow: match descriptors reloaded from CSV files."""
    from sift3d_tpu.api import descriptors_from_rows, match_descriptors
    d1 = rng.random((20, 768)).astype(np.float32)
    d1 /= np.linalg.norm(d1, axis=1, keepdims=True)
    d2 = np.concatenate([d1[:10], rng.random((15, 768)).astype(np.float32)])
    d2 /= np.linalg.norm(d2, axis=1, keepdims=True)
    rows1 = np.concatenate([rng.random((20, 3)), d1], axis=1)
    rows2 = np.concatenate([rng.random((25, 3)), d2], axis=1)
    p1, p2 = str(tmp_path / "d1.csv"), str(tmp_path / "d2.csv")
    write_descriptors(p1, rows1.astype(np.float32))
    write_descriptors(p2, rows2.astype(np.float32))
    D1 = descriptors_from_rows(read_descriptors(p1))
    D2 = descriptors_from_rows(read_descriptors(p2), capacity=32)
    m = match_descriptors(D1, D2)
    assert (m[:10] == np.arange(10)).all()
