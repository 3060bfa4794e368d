import numpy as np
import pytest

from euispice_coreg_tpu.core import wcs
from euispice_coreg_tpu.core.header import (
    Header,
    WCSParams,
    correct_pointing_header,
    ensure_pcij,
    pc_from_crota,
    wcs_params_from_header,
)


def hri_like_params(crota=0.75):
    pc11, pc12, pc21, pc22 = pc_from_crota(crota, 0.492, 0.492)
    return WCSParams(
        crval1=100.0 / 3600.0,
        crval2=200.0 / 3600.0,
        crpix1=1024.5,
        crpix2=1024.5,
        cdelt1=0.492 / 3600.0,
        cdelt2=0.492 / 3600.0,
        pc11=pc11,
        pc12=pc12,
        pc21=pc21,
        pc22=pc22,
    ).as_dict()


def test_tan_roundtrip():
    p = hri_like_params()
    px = np.linspace(0, 2047, 33)
    py = np.linspace(0, 2047, 31)
    pxg, pyg = np.meshgrid(px, py)
    lon, lat = wcs.tan_pixel_to_world(p, pxg, pyg)
    bx, by = wcs.tan_world_to_pixel(p, lon, lat)
    np.testing.assert_allclose(np.asarray(bx), pxg, atol=1e-6, rtol=1e-9)
    np.testing.assert_allclose(np.asarray(by), pyg, atol=1e-6, rtol=1e-9)


def test_tan_reference_point():
    """At CRPIX, world == CRVAL exactly."""
    p = hri_like_params()
    lon, lat = wcs.tan_pixel_to_world(p, p["crpix1"] - 1.0, p["crpix2"] - 1.0)
    assert float(lon) == pytest.approx(p["crval1"], abs=1e-12)
    assert float(lat) == pytest.approx(p["crval2"], abs=1e-12)


def test_tan_small_angle_linear():
    """For small FOV near the equator the TAN projection is locally linear:
    one pixel step along x corresponds to ~cdelt1 in longitude."""
    p = hri_like_params(crota=0.0)
    lon0, lat0 = wcs.tan_pixel_to_world(p, 1023.5, 1023.5)
    lon1, lat1 = wcs.tan_pixel_to_world(p, 1024.5, 1023.5)
    assert float(lon1 - lon0) == pytest.approx(p["cdelt1"], rel=1e-6)
    assert float(lat1 - lat0) == pytest.approx(0.0, abs=1e-9)


def test_tan_crota_rotates():
    p0 = hri_like_params(crota=0.0)
    p90 = hri_like_params(crota=90.0)
    lon0, lat0 = wcs.tan_pixel_to_world(p0, 1124.5, 1023.5)  # +100 px along x
    lon90, lat90 = wcs.tan_pixel_to_world(p90, 1124.5, 1023.5)
    # under CROTA=90 (PC=[[0,-1],[1,0]]) the +x pixel direction maps to the
    # +y world direction
    assert float(lat90 - p90["crval2"]) == pytest.approx(
        float(lon0) - p0["crval1"], rel=1e-4
    )


def test_world_to_pixel_far_side_nan():
    p = hri_like_params()
    bx, by = wcs.tan_world_to_pixel(p, 180.0, 0.0)  # antipode: unprojectable
    assert np.isnan(float(bx)) and np.isnan(float(by))


def test_tan_gnomonic_radial_law():
    """Pure-projection check against the analytic gnomonic law:
    a point at angular distance g from the tangent point lands at radial
    intermediate distance R = (180/pi) tan(g)."""
    p = WCSParams(
        crval1=0.0, crval2=0.0, crpix1=1.0, crpix2=1.0,
        cdelt1=1.0, cdelt2=1.0, pc11=1.0, pc12=0.0, pc21=0.0, pc22=1.0,
    ).as_dict()
    g = 10.0  # deg away along the equator
    bx, by = wcs.tan_world_to_pixel(p, g, 0.0)
    expected = np.degrees(np.tan(np.radians(g)))
    assert float(bx) == pytest.approx(expected, rel=1e-12)
    assert float(by) == pytest.approx(0.0, abs=1e-9)


def test_car_linear():
    p = WCSParams(
        crval1=120.0, crval2=0.0, crpix1=50.0, crpix2=40.0,
        cdelt1=0.1, cdelt2=0.1, pc11=1.0, pc12=0.0, pc21=0.0, pc22=1.0,
        kind="car",
    ).as_dict()
    lon, lat = wcs.car_pixel_to_world(p, 59.0, 49.0)
    assert float(lon) == pytest.approx(121.0)
    assert float(lat) == pytest.approx(1.0)
    bx, by = wcs.car_world_to_pixel(p, 121.0, 1.0)
    assert float(bx) == pytest.approx(59.0)
    assert float(by) == pytest.approx(49.0)


# ---------------------------------------------------------------------------
# header math
# ---------------------------------------------------------------------------

def make_header(crota=0.75, with_pc=True, cunit="arcsec"):
    hdr = Header({
        "NAXIS1": 2048, "NAXIS2": 2048,
        "CRVAL1": 100.0, "CRVAL2": 200.0,
        "CRPIX1": 1024.5, "CRPIX2": 1024.5,
        "CDELT1": 0.492, "CDELT2": 0.492,
        "CUNIT1": cunit, "CUNIT2": cunit,
        "CTYPE1": "HPLN-TAN", "CTYPE2": "HPLT-TAN",
        "CROTA": crota,
    })
    if with_pc:
        pc11, pc12, pc21, pc22 = pc_from_crota(crota, 0.492, 0.492)
        hdr["PC1_1"], hdr["PC1_2"], hdr["PC2_1"], hdr["PC2_2"] = pc11, pc12, pc21, pc22
    return hdr


def test_ensure_pcij_creates_matrix():
    hdr = make_header(with_pc=False)
    ensure_pcij(hdr)
    rho = np.deg2rad(0.75)
    assert hdr["PC1_1"] == pytest.approx(np.cos(rho))
    assert hdr["PC1_2"] == pytest.approx(-np.sin(rho))


def test_ensure_pcij_requires_rotation_info():
    hdr = make_header(with_pc=False)
    del hdr["CROTA"]
    with pytest.raises(ValueError):
        ensure_pcij(hdr)
    ensure_pcij(hdr, force_crota_0=True)
    assert hdr["CROTA"] == 0.0
    assert hdr["PC1_1"] == 1.0


def test_correct_pointing_header_crval_shift():
    hdr = make_header()
    correct_pointing_header(hdr, lag_crval1=24.0, lag_crval2=6.0,
                            lag_cdelt1=None, lag_cdelt2=None, lag_crota=None)
    assert hdr["CRVAL1"] == pytest.approx(124.0)
    assert hdr["CRVAL2"] == pytest.approx(206.0)
    # no cdelt/crota lag: PC untouched
    rho = np.deg2rad(0.75)
    assert hdr["PC1_1"] == pytest.approx(np.cos(rho))


def test_correct_pointing_header_crota_rebuilds_pc():
    hdr = make_header(crota=0.0)
    correct_pointing_header(hdr, lag_crval1=0.0, lag_crval2=0.0,
                            lag_cdelt1=None, lag_cdelt2=None, lag_crota=1.0)
    rho = np.deg2rad(1.0)
    assert hdr["CROTA"] == pytest.approx(1.0)
    assert hdr["PC1_1"] == pytest.approx(np.cos(rho))
    assert hdr["PC2_1"] == pytest.approx(np.sin(rho))


def test_correct_pointing_header_cdelt_units():
    hdr = make_header(cunit="deg", crota=0.0)
    hdr["CDELT1"] = 0.01
    hdr["CDELT2"] = 0.01
    correct_pointing_header(hdr, lag_crval1=None, lag_crval2=None,
                            lag_cdelt1=36.0, lag_cdelt2=None, lag_crota=None)
    # 36 arcsec = 0.01 deg
    assert hdr["CDELT1"] == pytest.approx(0.02)


def test_wcs_params_from_header_units():
    hdr = make_header()
    p = wcs_params_from_header(hdr)
    assert p.crval1 == pytest.approx(100.0 / 3600.0)
    assert p.cdelt1 == pytest.approx(0.492 / 3600.0)
    assert p.kind == "tan"


def test_ensure_pcij_from_cd_matrix():
    """CD-matrix headers normalize to CDELT + PC + CROTA
    (CDi_j = CDELTi * PCi_j); a rotated CD round-trips the world grid."""
    import numpy as np

    from euispice_coreg_tpu.core.header import Header, ensure_pcij, pc_from_crota
    from euispice_coreg_tpu.utils import coords

    crota, cd1, cd2 = 12.5, 3.0, 2.0
    pc11, pc12, pc21, pc22 = pc_from_crota(crota, cd1, cd2)
    base = {
        "NAXIS1": 32, "NAXIS2": 32, "CRVAL1": 100.0, "CRVAL2": 50.0,
        "CRPIX1": 16.5, "CRPIX2": 16.5, "CUNIT1": "arcsec",
        "CUNIT2": "arcsec", "CTYPE1": "HPLN-TAN", "CTYPE2": "HPLT-TAN",
    }
    hdr_pc = Header({**base, "CDELT1": cd1, "CDELT2": cd2, "CROTA": crota,
                     "PC1_1": pc11, "PC1_2": pc12, "PC2_1": pc21,
                     "PC2_2": pc22})
    hdr_cd = Header({**base,
                     "CD1_1": cd1 * pc11, "CD1_2": cd1 * pc12,
                     "CD2_1": cd2 * pc21, "CD2_2": cd2 * pc22})
    ensure_pcij(hdr_cd)
    assert abs(hdr_cd["CDELT1"] - cd1) < 1e-9 * cd1 + 1e-9
    assert abs(hdr_cd["CDELT2"] - cd2) < 1e-9 * cd2 + 1e-9
    for k in ("PC1_1", "PC1_2", "PC2_1", "PC2_2"):
        assert abs(hdr_cd[k] - hdr_pc[k]) < 1e-9, k

    lon1, lat1 = coords.header_world_grid(hdr_pc)
    lon2, lat2 = coords.header_world_grid(hdr_cd)
    np.testing.assert_allclose(lon2, lon1, atol=1e-9)
    np.testing.assert_allclose(lat2, lat1, atol=1e-9)


def test_ensure_pcij_cd_matrix_edge_cases():
    """Flip/skew CD matrices are rejected loudly (the CROTA-based shift math
    cannot represent them); partial CD matrices fall through to the normal
    CROTA/ValueError path."""
    import pytest

    from euispice_coreg_tpu.core.header import Header, ensure_pcij

    base = {"NAXIS1": 8, "NAXIS2": 8, "CRVAL1": 0.0, "CRVAL2": 0.0,
            "CRPIX1": 4.0, "CRPIX2": 4.0, "CUNIT1": "arcsec",
            "CUNIT2": "arcsec"}

    # axis flip (negative determinant): exact PC stored (CRVAL-only flows
    # keep PC verbatim and stay correct), loud warning about cdelt/crota lags
    import warnings as _w

    hdr = Header({**base, "CD1_1": -1.5, "CD2_2": 1.5})
    with _w.catch_warnings(record=True) as rec:
        _w.simplefilter("always")
        ensure_pcij(hdr)
    assert any("mirrored" in str(r.message) for r in rec)
    assert hdr["PC1_1"] == -1.0 and hdr["PC2_2"] == 1.0
    assert hdr["CDELT1"] == 1.5 and hdr["CDELT2"] == 1.5

    # skew: exact PC stored + warning
    hdr = Header({**base, "CD1_1": 1.0, "CD1_2": 0.3, "CD2_1": 0.0,
                  "CD2_2": 1.0})
    with _w.catch_warnings(record=True) as rec:
        _w.simplefilter("always")
        ensure_pcij(hdr)
    assert any("mirrored" in str(r.message) for r in rec)

    # partial CD (CD2_2 missing): informative ValueError, not KeyError
    hdr = Header({**base, "CD1_1": 1.5, "CDELT1": 1.5, "CDELT2": 1.5})
    with pytest.raises(ValueError, match="CROTA"):
        ensure_pcij(hdr)
