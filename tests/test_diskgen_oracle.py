"""Oracle validation of io/diskgen against the *runnable* reference
artifacts: the statically-linked generator binary
``/root/reference/disk/a.out`` (the only executable piece of the
reference that runs in this image) and the shipped ``blackbody*.in``
spectrum files it produced (disk.f:32-121)."""
import os
import subprocess

import numpy as np
import pytest

from compton2d_tpu.io.diskgen import generate, read_tavecchio_table
from compton2d_tpu.io.legacy import external_spectrum

REF_DISK = "/root/reference/disk"
TAVE = os.path.join(REF_DISK, "tavecchio_Uext.dat")
G15 = os.path.join(REF_DISK, "blackbody_G15_4spectra.in")

needs_ref = pytest.mark.skipif(
    not os.path.exists(TAVE), reason="reference disk artifacts not present"
)


@needs_ref
def test_generate_matches_shipped_g15_file():
    """Bin-by-bin diff against the reference's own output for Gamma=15
    (all 5 columns, full 500-bin grid). The shipped file prints 6
    significant digits (disk.f:106 format e14.6)."""
    ref = np.loadtxt(G15)
    ours = generate(15.0, tavecchio_table=TAVE)
    assert ours.shape == ref.shape == (500, 5)
    # energy grid exact to print precision (e14.6 = 6 sig figs)
    np.testing.assert_allclose(ours[:, 0], ref[:, 0], rtol=1e-5)
    for col in range(1, 5):
        np.testing.assert_allclose(
            ours[:, col], ref[:, col], rtol=5e-6, atol=1e-29,
            err_msg=f"column {col}",
        )


@needs_ref
@pytest.mark.skipif(
    not os.access(os.path.join(REF_DISK, "a.out"), os.X_OK),
    reason="reference a.out not executable",
)
@pytest.mark.parametrize("gamma", [13.0, 25.0])
def test_generate_matches_reference_binary(tmp_path, gamma):
    """Run the actual reference generator and diff our table against its
    fresh output (not just the shipped files)."""
    for f in ("tavecchio_Uext.dat", "tavecchio_Uext_beamed.dat"):
        os.symlink(os.path.join(REF_DISK, f), tmp_path / f)
    r = subprocess.run(
        [os.path.join(REF_DISK, "a.out")],
        input=f"{gamma}\n", text=True, cwd=tmp_path,
        capture_output=True, timeout=120,
    )
    assert r.returncode == 0, r.stderr
    ref = np.loadtxt(tmp_path / "blackbody.in")
    ours = generate(gamma, tavecchio_table=TAVE)
    assert ours.shape == ref.shape
    for col in range(5):
        np.testing.assert_allclose(
            ours[:, col], ref[:, col], rtol=5e-6, atol=1e-29,
            err_msg=f"column {col}",
        )


@needs_ref
def test_external_spectrum_golden_on_shipped_file():
    """file_sp CDF semantics (imcsurf2d_para.f:621-682) evaluated on a
    reference-shipped input file: the Ghisellini-Madau normalization
    identity and an independent trapezoid cross-check of int_file."""
    from compton2d_tpu.config import ExternalRadiationConfig

    ext = ExternalRadiationConfig(
        g_bulk=15.0, R_blr=1.0e17, fr_blr=0.1, R_ir=2.5e18, fr_ir=0.6,
        R_disk=1.0e15, d_jet=1.0e17,
    )
    e, f_file, p_file, int_file = external_spectrum(G15, ext)
    assert len(e) == 500
    assert np.all(np.diff(p_file) >= -1e-12)
    assert abs(p_file[-1] - 1.0) < 1e-9

    # Ghisellini-Madau: integral of F_file must equal
    # (17/48pi) G^2 fr_blr Ltot/R_blr^2 + (1/4pi) G^2 fr_ir Ltot/R_ir^2
    # where Ltot is the disk-column integral with the sqrt(ratio)
    # median-grid correction (imcsurf2d_para.f:621-640)
    raw = np.loadtxt(G15)
    de = np.diff(raw[:, 0])
    ratio = np.sqrt(raw[1, 0] / raw[0, 0])
    ltot = np.sum(raw[:-1, 1] * de) / ratio
    g2 = 15.0**2
    expected = (
        17.0 / 48.0 / np.pi * g2 * 0.1 * ltot / 1.0e17**2
        + 0.25 / np.pi * g2 * 0.6 * ltot / 2.5e18**2
    )
    ftot = np.sum(f_file[:-1] * de) / ratio
    assert abs(ftot / expected - 1.0) < 1e-6

    # int_file: the piecewise-power-law segment sum must agree with a
    # log-trapezoid quadrature of the same F(E) to sub-percent
    trapz = np.trapezoid(f_file, e)
    assert abs(int_file / trapz - 1.0) < 2e-2


@needs_ref
def test_tavecchio_table_reader():
    t = read_tavecchio_table(TAVE)
    assert t.shape == (5402, 2)
    assert np.all(t[:, 0] > 0) and np.all(np.diff(t[:, 0]) > 0)
