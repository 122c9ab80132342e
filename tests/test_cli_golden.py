"""End-to-end CLI-vs-reference-CLI golden tests (VERDICT r3 missing #1).

The reference's own de-facto golden methodology compares a full CLI
invocation against an independent path at fixed tolerances
(wrappers/matlab/Sift3DTest.m:72-126 detectCliTest, :129-175
extractCliTest, :277-329 regCliTest). These tests run the reference's
ACTUAL kpSift3D / regSift3D / denseSift3D binaries (cli/kpSift3D.c:61,
regSift3D.c:100, denseSift3D.c:61; built with NIFTI enabled through the
from-scratch mini-nifti shim, tests/oracle/mini_nifti/) against our
cli/kp.py, cli/reg.py, cli/dense.py on the same synthetic NIFTI files,
comparing outputs at the reference's own tolerances:

- keypoint / descriptor CSV values within +-0.01 (Sift3DTest.m:64)
- affine linear part +-5e-2, translation +-5 voxels (Sift3DTest.m:319-324)

and asserting the CSV column format byte-compatibly (printf %f fields,
no header, same column count - imutil.c write_Mat_rm's csv branch).
"""

import csv
import gzip
import os
import re
import subprocess

import numpy as np
import pytest

from tests import oracle as oracle_mod

from benches.data import SHIFT, make_pairs, make_volume
from sift3d_tpu.cli import dense as cli_dense
from sift3d_tpu.cli import kp as cli_kp
from sift3d_tpu.cli import reg as cli_reg
from sift3d_tpu.io import nifti
from sift3d_tpu.io.volume import Volume

_FIELD_RE = re.compile(r"^-?\d+\.\d{6}$")   # printf("%f") fields


@pytest.fixture(scope="module")
def ref_bins():
    bins = oracle_mod.cli_bins()
    if bins is None:
        pytest.skip("reference CLI binaries unavailable")
    return bins


@pytest.fixture(scope="module")
def vol_pair(tmp_path_factory):
    """A 32^3 single volume (kp/dense tests) plus a 64^3 registration
    pair from the calibrated bench generator (benches/data.py - 32^3
    gives the reference's matcher too few points to fit a model)."""
    d = tmp_path_factory.mktemp("cli_golden")
    one = make_volume((32, 32, 32), nblob=40, seed=3)
    one_p = str(d / "one.nii.gz")
    nifti.write_nii(one_p, Volume(one))
    src, ref = make_pairs(1, (64, 64, 64))
    src_p = str(d / "src.nii.gz")
    ref_p = str(d / "ref.nii.gz")
    nifti.write_nii(src_p, Volume(src[0]))
    nifti.write_nii(ref_p, Volume(ref[0]))
    return d, one_p, src_p, ref_p


def _read_csv(path):
    op = gzip.open if path.endswith(".gz") else open
    with op(path, "rt") as f:
        rows = [[float(x) for x in row] for row in csv.reader(f) if row]
    return np.array(rows)


def _check_csv_format(path):
    """Reference CSV byte-format: no header, comma-separated %f fields."""
    op = gzip.open if path.endswith(".gz") else open
    with op(path, "rt") as f:
        lines = f.read().strip().split("\n")
    ncols = None
    for ln in lines:
        fields = ln.split(",")
        if ncols is None:
            ncols = len(fields)
        assert len(fields) == ncols, "ragged CSV"
        for fld in fields:
            assert _FIELD_RE.match(fld), f"field {fld!r} is not %f-format"
    return ncols


def _sorted_rows(a):
    return a[np.lexsort(a[:, :5].T)]


def test_kp_cli_golden(ref_bins, vol_pair):
    d, src_p, _, _ = vol_pair
    rk, rd_ = str(d / "ref_keys.csv"), str(d / "ref_desc.csv")
    ok, od = str(d / "our_keys.csv"), str(d / "our_desc.csv")
    subprocess.run([ref_bins["kpSift3D"], "--keys", rk, "--desc", rd_,
                    src_p], check=True, capture_output=True, timeout=600)
    assert cli_kp.main(["--keys", ok, "--desc", od, src_p]) == 0

    # Byte-level format compatibility of the CSV surface.
    assert _check_csv_format(ok) == _check_csv_format(rk) == 14
    assert _check_csv_format(od) == _check_csv_format(rd_) == 771

    keys_ref, keys_our = _read_csv(rk), _read_csv(ok)
    assert keys_ref.shape == keys_our.shape
    a, b = _sorted_rows(keys_our), _sorted_rows(keys_ref)
    # Tighter than the reference's own +-0.01 contract: coordinates,
    # octave, scale exactly as printed; orientation within 1e-3.
    np.testing.assert_array_equal(a[:, :5], b[:, :5])
    np.testing.assert_allclose(a[:, 5:], b[:, 5:], atol=1e-3)

    desc_ref, desc_our = _read_csv(rd_), _read_csv(od)
    assert desc_ref.shape == desc_our.shape
    a = desc_our[np.lexsort(desc_our[:, :3].T)]
    b = desc_ref[np.lexsort(desc_ref[:, :3].T)]
    np.testing.assert_array_equal(a[:, :3], b[:, :3])
    np.testing.assert_allclose(a[:, 3:], b[:, 3:], atol=0.01)


def test_reg_cli_golden(ref_bins, vol_pair):
    d, _, src_p, ref_p = vol_pair
    rm, rt = str(d / "ref_matches.csv"), str(d / "ref_tform.csv")
    rw = str(d / "ref_warped.nii.gz")
    om, ot = str(d / "our_matches.csv"), str(d / "our_tform.csv")
    ow = str(d / "our_warped.nii.gz")
    subprocess.run([ref_bins["regSift3D"], "--matches", rm,
                    "--transform", rt, "--warped", rw, src_p, ref_p],
                   check=True, capture_output=True, timeout=600)
    assert cli_reg.main(["--matches", om, "--transform", ot,
                         "--warped", ow, src_p, ref_p]) == 0

    assert _check_csv_format(om) == _check_csv_format(rm) == 6

    # Transform CSV: reference writes the 3x4 affine as rows (regSift3D.c
    # write_tform -> write_Mat_rm). Compare at the reference's own
    # equivalence contract (Sift3DTest.m:319-324).
    A_ref, A_our = _read_csv(rt), _read_csv(ot)
    assert A_ref.shape == A_our.shape == (3, 4)
    np.testing.assert_allclose(A_our[:, :3], A_ref[:, :3], atol=5e-2)
    np.testing.assert_allclose(A_our[:, 3], A_ref[:, 3], atol=5.0)
    # Both must also recover the known ground truth (benches/data.py:
    # ref(x) = src(x - SHIFT), so A = [I | (-SHIFT, 0, 0)]).
    truth = np.array([-float(SHIFT), 0.0, 0.0])
    np.testing.assert_allclose(A_our[:, :3], np.eye(3), atol=5e-2)
    np.testing.assert_allclose(A_our[:, 3], truth, atol=1.5)
    np.testing.assert_allclose(A_ref[:, 3], truth, atol=1.5)

    # Matches: deterministic given descriptors (both sides' descriptors
    # agree within 2e-3), but a borderline ratio-test pair can flip;
    # demand >= 90% set overlap both ways at the 0.01 CSV tolerance.
    m_ref, m_our = _read_csv(rm), _read_csv(om)

    def overlap(x, y):
        hits = 0
        for row in x:
            if np.any(np.all(np.abs(y - row) <= 0.01, axis=1)):
                hits += 1
        return hits / max(len(x), 1)

    assert overlap(m_ref, m_our) >= 0.9
    assert overlap(m_our, m_ref) >= 0.9

    # Warped volumes: same interpolation (trilinear), transforms within
    # the contract, so fields agree except near steep gradients; compare
    # the 95th percentile of |diff| on the unit-normalized data.
    w_ref = nifti.read_nii(rw).data
    w_our = nifti.read_nii(ow).data
    assert w_ref.shape == w_our.shape
    diff = np.abs(w_ref - w_our)
    assert np.quantile(diff, 0.95) < 0.05, np.quantile(diff, 0.95)


def test_dense_cli_golden(ref_bins, vol_pair):
    d, src_p, _, _ = vol_pair
    ref_pat = str(d / "ref_dense%.nii.gz")
    our_pat = str(d / "our_dense%.nii.gz")
    subprocess.run([ref_bins["denseSift3D"], src_p, ref_pat],
                   check=True, capture_output=True, timeout=600)
    assert cli_dense.main([src_p, our_pat]) == 0
    for c in range(12):
        rp = ref_pat.replace("%", str(c))
        op = our_pat.replace("%", str(c))
        assert os.path.exists(rp) and os.path.exists(op)
        a = nifti.read_nii(op).data
        b = nifti.read_nii(rp).data
        assert a.shape == b.shape
        np.testing.assert_allclose(a, b, atol=2e-3)
