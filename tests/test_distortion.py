"""FSI optical-distortion machinery (DistortionMatrix / ZemaxData /
DistortionPolynomial — behavioural port of rectify.py:426-839)."""
import numpy as np
import pytest

from euispice_coreg_tpu.core import transforms as tr


def synth_distortion(xf, yf):
    """Gentle synthetic optical distortion: field angles (deg) -> detector
    position (mm) with scale 10 mm/deg plus cubic barrel terms."""
    r2 = xf * xf + yf * yf
    return 10.0 * xf * (1 + 0.004 * r2), 10.0 * yf * (1 + 0.004 * r2)


def make_zemax_txt(path, n=24, maxfield=2.0):
    step = 2 * maxfield / n
    grid = np.linspace(-maxfield + step / 2, maxfield - step / 2, n)
    xf, yf = np.meshgrid(grid, grid)
    xc, yc = synth_distortion(xf, yf)
    lines = [
        "; Zemax distortion macro output",
        "; xchief ychief hx hy",
        f"; maxfield {maxfield}",   # comments[-5] (reference layout)
        f"; nsamples {n}",          # comments[-4]
        "; units deg / mm",
        "; synthetic fixture",
        "; ---",
    ]
    # comments[-5] -> maxfield, comments[-4] -> nsamples (reference layout)
    for a, b, hx, hy in zip(xc.ravel(), yc.ravel(),
                            (xf / maxfield).ravel(), (yf / maxfield).ravel()):
        lines.append(f"{float(a)!r} {float(b)!r} {float(hx)!r} {float(hy)!r}")
    path.write_text("\n".join(lines) + "\n")
    return str(path)


def test_zemax_txt_fit_and_roundtrip(tmp_path):
    f = make_zemax_txt(tmp_path / "zemax.txt")
    z = tr.DistortionMatrix.ZemaxData(f)
    assert z.nsamples == 24 and z.maxfield == 2.0
    c1, c2 = z.fit("field2pos")
    # fitted polynomial must reproduce the synthetic distortion closely
    got_x = tr.polyval2d(z.xfield, z.yfield, c1)
    got_y = tr.polyval2d(z.xfield, z.yfield, c2)
    np.testing.assert_allclose(got_x, z.xchief, atol=5e-3)
    np.testing.assert_allclose(got_y, z.ychief, atol=5e-3)

    # FITS round trip
    out = z.write_fits(str(tmp_path / "zemax.fits"))
    z2 = tr.DistortionMatrix.ZemaxData(out)
    np.testing.assert_allclose(z2.xchief, z.xchief, rtol=1e-12)
    np.testing.assert_allclose(z2.xfield, z.xfield, rtol=1e-12)


def test_distortion_matrix_rebuild_forward_inverse(tmp_path):
    f = make_zemax_txt(tmp_path / "zemax.txt")
    dm = tr.DistortionMatrix(f, rebuild=True)
    xf = np.array([0.0, 0.5, -1.0, 1.2])
    yf = np.array([0.0, -0.3, 0.8, -1.1])
    px, py = dm.forward(xf, yf)
    # known analytic truth through the instrument constants
    mmx, mmy = synth_distortion(xf, yf)
    np.testing.assert_allclose(px, mmx / 0.01 + 1535.5, atol=1.0)
    np.testing.assert_allclose(py, mmy / 0.01 + 1535.5, atol=1.0)
    # inverse(forward) round trip through the fitted pos2field polynomials
    xb, yb = dm.inverse(np.asarray(px), np.asarray(py))
    np.testing.assert_allclose(xb, xf, atol=5e-3)
    np.testing.assert_allclose(yb, yf, atol=5e-3)


def test_write_polynomials_ini_roundtrip(tmp_path):
    f = make_zemax_txt(tmp_path / "zemax.txt")
    z = tr.DistortionMatrix.ZemaxData(f)
    ini = str(tmp_path / "distortion.ini")
    z.write_polynomials(ini)

    dm = tr.DistortionMatrix(ini)
    assert float(dm.phys_pix_size) == pytest.approx(0.01)
    assert float(dm.ref_x_pix) == pytest.approx(1536)
    xf = np.array([0.4, -0.9])
    yf = np.array([-0.2, 1.0])
    px, py = dm.forward(xf, yf)
    mmx, mmy = synth_distortion(xf, yf)
    np.testing.assert_allclose(px, mmx / 0.01 + 1536, atol=1.0)
    np.testing.assert_allclose(py, mmy / 0.01 + 1536, atol=1.0)


def test_exact_fits_mode_and_plot(tmp_path):
    f = make_zemax_txt(tmp_path / "zemax.txt", n=32)
    z = tr.DistortionMatrix.ZemaxData(f)
    fits_path = z.write_fits(str(tmp_path / "zemax.fits"))
    dm = tr.DistortionMatrix(fits_path)
    assert dm.exact
    # exact mode interpolates the chief-ray grids directly
    xf = np.array([0.25, -0.75])
    yf = np.array([0.5, -0.25])
    px, py = dm.forward(xf, yf)
    mmx, mmy = synth_distortion(xf, yf)
    np.testing.assert_allclose(px, mmx / 0.01 + 1535.5, atol=2.0)
    np.testing.assert_allclose(py, mmy / 0.01 + 1535.5, atol=2.0)

    # quiver diagnostic (needs a polynomial 'scale'; use the ini-backed one)
    ini = str(tmp_path / "d.ini")
    z.write_polynomials(ini)
    import matplotlib

    matplotlib.use("Agg")
    fig = tr.DistortionMatrix(ini).plot(s=5)
    assert fig is not None
