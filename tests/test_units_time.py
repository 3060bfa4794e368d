import numpy as np
import pytest

from euispice_coreg_tpu.utils import units, timeutils


def test_convert_roundtrip():
    v = 123.456
    assert units.convert(v, "arcsec", "deg") == pytest.approx(v / 3600.0)
    assert units.convert(units.convert(v, "arcsec", "rad"), "rad", "arcsec") == pytest.approx(v)
    assert units.convert(v, "deg", "deg") == v


def test_ang2pipi_matches_reference_formula():
    # reference: -((-ang + 180) % 360 - 180)   (Util.py:76-80)
    angs = np.array([-720.0, -365.0, -180.0, -179.9, 0.0, 179.9, 180.0, 359.0, 720.5])
    got = units.ang2pipi_deg(angs)
    expected = -((-angs + 180.0) % 360.0 - 180.0)
    np.testing.assert_allclose(got, expected)
    assert np.all(got <= 180.0)
    assert np.all(got > -180.0)


def test_ang2pipi_arcsec_units():
    v = 3600.0 * 190.0  # 190 deg in arcsec
    assert units.ang2pipi(v, "arcsec") == pytest.approx(-170.0 * 3600.0)


def test_time_parse_and_diff():
    t1 = "2022-03-17T09:50:45.281"
    t2 = "2022-03-17T09:50:40.281"
    assert timeutils.time_diff_seconds(t1, t2) == pytest.approx(5.0)
    assert timeutils.time_diff_days("2022-03-18T09:50:45", t1) == pytest.approx(
        1.0 - 0.281 / 86400.0
    )


def test_time_format_roundtrip():
    t = "2022-03-17T09:50:45.281"
    s = timeutils.parse_fits_time(t)
    assert timeutils.format_fits_time(s) == t


def test_time_date_only():
    assert timeutils.time_diff_seconds("2022-03-18", "2022-03-17") == pytest.approx(86400.0)
