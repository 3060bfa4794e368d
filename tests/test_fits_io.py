import numpy as np
import pytest

from euispice_coreg_tpu.core.header import Header
from euispice_coreg_tpu.io import fits
from euispice_coreg_tpu.io.native import rice_decode, rice_encode


def test_primary_roundtrip(tmp_path):
    data = np.arange(120, dtype=np.float32).reshape(10, 12) * 1.5
    hdr = Header({
        "CRVAL1": 12.5, "CUNIT1": "arcsec", "DATE-OBS": "2022-03-17T09:50:45.281",
        "WAVELNTH": 174, "FLAG": True, "NOTE": "it's a test",
    })
    path = tmp_path / "x.fits"
    fits.write(path, [fits.PrimaryHDU(data=data, header=hdr)])
    hdul = fits.open(path)
    assert len(hdul) == 1
    got = hdul[0]
    np.testing.assert_array_equal(got.data, data)
    assert got.header["CRVAL1"] == 12.5
    assert got.header["CUNIT1"] == "arcsec"
    assert got.header["DATE-OBS"] == "2022-03-17T09:50:45.281"
    assert got.header["WAVELNTH"] == 174
    assert got.header["FLAG"] is True
    assert got.header["NOTE"] == "it's a test"


def test_multi_hdu_and_extname(tmp_path):
    d0 = np.zeros((4, 4), dtype=np.int16)
    d1 = np.ones((3, 5), dtype=np.float64)
    d2 = np.full((2, 2), 7, dtype=np.int32)
    path = tmp_path / "m.fits"
    fits.write(path, [
        fits.PrimaryHDU(data=d0),
        fits.ImageHDU(data=d1, name="He II 304"),
        fits.ImageHDU(data=d2, name="OTHER"),
    ])
    hdul = fits.open(path)
    assert len(hdul) == 3
    np.testing.assert_array_equal(hdul["He II 304"].data, d1)
    np.testing.assert_array_equal(hdul[-1].data, d2)
    assert hdul[1].header["EXTNAME"] == "He II 304"


def test_bscale_bzero_blank():
    # hand-craft a scaled int16 file (the writer always stores physical
    # values, so scaling keys only ever appear in externally produced files)
    raw = np.array([[0, 100], [200, -5]], dtype=">i2")
    cards = [
        fits._make_card("SIMPLE", True),
        fits._make_card("BITPIX", 16),
        fits._make_card("NAXIS", 2),
        fits._make_card("NAXIS1", 2),
        fits._make_card("NAXIS2", 2),
        fits._make_card("BSCALE", 0.5),
        fits._make_card("BZERO", 10.0),
        fits._make_card("BLANK", -5),
    ]
    blob = fits._serialize_header(cards)
    payload = raw.tobytes()
    blob += payload + b"\x00" * ((-len(payload)) % fits.BLOCK)
    got = fits.open(blob)[0].data
    assert got[0, 0] == pytest.approx(10.0)
    assert got[0, 1] == pytest.approx(60.0)
    assert np.isnan(got[1, 1])


def test_3d_and_4d_cubes(tmp_path):
    cube = np.arange(2 * 3 * 4 * 5, dtype=np.float32).reshape(2, 3, 4, 5)
    path = tmp_path / "c.fits"
    fits.write(path, [fits.PrimaryHDU(data=cube)])
    got = fits.open(path)[0].data
    np.testing.assert_array_equal(got, cube)
    assert got.shape == (2, 3, 4, 5)


def test_rice_roundtrip_random():
    rng = np.random.default_rng(0)
    for n in [1, 5, 32, 33, 1000, 4096]:
        a = rng.integers(-30000, 30000, size=n).astype(np.int32)
        comp = rice_encode(a)
        back = rice_decode(comp, n)
        np.testing.assert_array_equal(back, a)


def test_rice_compresses_smooth_data():
    x = np.linspace(0, 10, 10000)
    a = (1000 * np.sin(x) + 5).astype(np.int32)
    comp = rice_encode(a)
    assert comp.size < a.nbytes / 3  # smooth data compresses well


def test_rice_constant_and_extreme():
    a = np.zeros(100, dtype=np.int32)
    np.testing.assert_array_equal(rice_decode(rice_encode(a), 100), a)
    b = np.array([2**31 - 1, -2**31, 0, 1, -1] * 20, dtype=np.int32)
    np.testing.assert_array_equal(rice_decode(rice_encode(b), b.size), b)


def test_compressed_hdu_roundtrip(tmp_path):
    rng = np.random.default_rng(1)
    img = rng.integers(0, 4000, size=(64, 48)).astype(np.int32)
    hdr = Header({"DATE-OBS": "2022-03-17T00:00:00", "DETECTOR": "FSI"})
    path = tmp_path / "comp.fits"
    fits.write(path, [
        fits.PrimaryHDU(),
        fits.CompImageHDU(data=img, header=hdr, name="IMG"),
    ])
    hdul = fits.open(path)
    got = hdul["IMG"]
    np.testing.assert_array_equal(got.data, img)
    assert got.header["DETECTOR"] == "FSI"
    assert got.header["ZNAXIS1"] == 48
    assert got.header["ZNAXIS2"] == 64


def test_compressed_hdu_tiled(tmp_path):
    rng = np.random.default_rng(2)
    img = rng.integers(-100, 100, size=(33, 21)).astype(np.int32)
    path = tmp_path / "tiled.fits"
    fits.write(path, [
        fits.PrimaryHDU(),
        fits.CompImageHDU(data=img, name="T", tile_shape=(8, 16)),
    ])
    got = fits.open(path)["T"].data
    np.testing.assert_array_equal(got, img)


def test_bytesio_and_bytes_input(tmp_path):
    d = np.eye(3, dtype=np.float32)
    path = tmp_path / "b.fits"
    fits.write(path, [fits.PrimaryHDU(data=d)])
    blob = open(path, "rb").read()
    np.testing.assert_array_equal(fits.open(blob)[0].data, d)
