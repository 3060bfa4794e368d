import pathlib

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


# ---------------------------------------------------------------------------
# extended tile-compression coverage (GZIP codecs, quantized floats, dither,
# whole-file gzip) — what astropy/cfitsio provide underneath the reference
# ---------------------------------------------------------------------------

def _smooth_float_image(ny=37, nx=53, seed=3):
    rng = np.random.default_rng(seed)
    y, x = np.mgrid[0:ny, 0:nx]
    img = (100.0 + 10.0 * np.sin(x / 7.0) * np.cos(y / 5.0)
           + rng.normal(0, 0.5, size=(ny, nx)))
    return img.astype(np.float32)


def test_gzip1_gzip2_integer_roundtrip(tmp_path):
    data = (np.arange(35 * 41).reshape(35, 41) % 251).astype(np.int32)
    for ctype in ("GZIP_1", "GZIP_2"):
        path = tmp_path / f"g_{ctype}.fits"
        fits.write(path, [fits.PrimaryHDU(),
                          fits.CompImageHDU(data=data, name="W",
                                            compression_type=ctype,
                                            tile_shape=(8, 16))])
        got = fits.open(path)[1]
        assert isinstance(got, fits.CompImageHDU)
        np.testing.assert_array_equal(got.data, data)


@pytest.mark.parametrize("method", ["NO_DITHER", "SUBTRACTIVE_DITHER_1",
                                    "SUBTRACTIVE_DITHER_2"])
def test_quantized_float_rice_roundtrip(tmp_path, method):
    data = _smooth_float_image()
    data[5, 7] = np.nan
    data[20, 30] = np.nan
    if method == "SUBTRACTIVE_DITHER_2":
        data[3, 3] = 0.0  # exact zeros survive dither-2 bit-exactly
    path = tmp_path / "q.fits"
    qlevel = 32.0
    fits.write(path, [fits.PrimaryHDU(),
                      fits.CompImageHDU(data=data, name="W",
                                        quantize_level=qlevel,
                                        quantize_method=method,
                                        dither_seed=7,
                                        tile_shape=(4, 53))])
    got = fits.open(path)[1].data
    assert got.dtype == np.float32
    assert np.isnan(got[5, 7]) and np.isnan(got[20, 30])
    fin = np.isfinite(data)
    # quantization error bounded by one step = noise3/qlevel (~0.5/32)
    err = np.abs(got[fin] - data[fin])
    assert err.max() < 0.15
    if method == "SUBTRACTIVE_DITHER_2":
        assert got[3, 3] == 0.0


def test_quantized_float_gzip_tiles(tmp_path):
    data = _smooth_float_image(seed=11)
    path = tmp_path / "qg.fits"
    fits.write(path, [fits.PrimaryHDU(),
                      fits.CompImageHDU(data=data, name="W",
                                        compression_type="GZIP_2",
                                        quantize_level=64.0,
                                        quantize_method="SUBTRACTIVE_DITHER_1",
                                        tile_shape=(7, 53))])
    got = fits.open(path)[1].data
    assert np.abs(got - data).max() < 0.1


def test_flat_tile_lossless_fallback(tmp_path):
    # a constant tile has zero background noise -> cannot be quantized ->
    # must round-trip bit-exactly through the GZIP_COMPRESSED_DATA column
    data = _smooth_float_image(ny=24, nx=32, seed=5)
    data[8:16, :] = 42.125
    path = tmp_path / "fb.fits"
    fits.write(path, [fits.PrimaryHDU(),
                      fits.CompImageHDU(data=data, name="W",
                                        tile_shape=(8, 32))])
    got = fits.open(path)[1].data
    np.testing.assert_array_equal(got[8:16, :], np.float32(42.125))
    assert np.abs(got - data).max() < 0.1


def test_dither_sequence_matches_convention():
    # first values of the Park-Miller sequence mandated by the tiled-image
    # convention (seed 1, a=16807, m=2^31-1): 16807/m, 282475249/m, ...
    from euispice_coreg_tpu.io import tile_compression as tc

    rv = tc._dither_randoms()
    m = 2147483647.0
    np.testing.assert_allclose(rv[0], 16807.0 / m, rtol=1e-12)
    np.testing.assert_allclose(rv[1], 282475249.0 / m, rtol=1e-12)
    np.testing.assert_allclose(rv[2], 1622650073.0 / m, rtol=1e-12)
    assert rv.shape == (10000,)
    assert (rv > 0).all() and (rv < 1).all()


def test_whole_file_gzip(tmp_path):
    import gzip

    data = np.arange(64, dtype=np.int16).reshape(8, 8)
    plain = tmp_path / "p.fits"
    fits.write(plain, [fits.PrimaryHDU(data=data)])
    gz = tmp_path / "p.fits.gz"
    gz.write_bytes(gzip.compress(plain.read_bytes()))
    got = fits.open(gz)[0].data
    np.testing.assert_array_equal(got, data)


def test_corrected_fits_preserves_compression(tmp_path):
    # reference Util.py:143-150: corrected windows are re-wrapped by input
    # class — CompImageHDU stays compressed, data cast to <f4
    from euispice_coreg_tpu.hdrshift import AlignmentResults

    data = (_smooth_float_image(ny=16, nx=16, seed=9) * 10).astype(np.int32)
    hdr = Header({"CRVAL1": 10.0, "CRVAL2": 5.0, "CRPIX1": 8.0, "CRPIX2": 8.0,
                  "CDELT1": 1.0, "CDELT2": 1.0, "CUNIT1": "arcsec",
                  "CUNIT2": "arcsec", "CROTA": 0.0, "NAXIS1": 16, "NAXIS2": 16})
    src = tmp_path / "in.fits"
    fits.write(src, [fits.PrimaryHDU(),
                     fits.CompImageHDU(data=data, header=hdr, name="W")])

    corr = np.zeros((3, 3, 1, 1, 1, 1))
    corr[1, 1] = 1.0
    res = AlignmentResults(corr, [-1, 0, 1], [-1, 0, 1], None, None, None,
                           unit_lag="arcsec", image_to_align_path=str(src),
                           image_to_align_window=1)
    out = tmp_path / "out.fits"
    res.write_corrected_fits(window_list_to_apply_shift=["W"],
                             path_to_l3_output=str(out))
    hdul = fits.open(out)
    got = hdul["W"]
    assert isinstance(got, fits.CompImageHDU)
    assert got.data.dtype == np.float32
    assert np.abs(got.data - data.astype(np.float32)).max() < 0.5


def test_rewrite_preserves_compression_settings(tmp_path):
    """Re-writing an opened CompImageHDU keeps the file's ZCMPTYPE/ZQUANTIZ/
    NOISEBIT/tiles instead of reverting to writer defaults."""
    data = _smooth_float_image(ny=24, nx=40, seed=2)
    p1 = tmp_path / "a.fits"
    fits.write(p1, [fits.PrimaryHDU(),
                    fits.CompImageHDU(data=data, name="W",
                                      compression_type="GZIP_1",
                                      quantize_level=64.0,
                                      quantize_method="SUBTRACTIVE_DITHER_1",
                                      dither_seed=11,
                                      tile_shape=(6, 40))])
    hdu = fits.open(p1)[1]
    assert hdu.compression_type == "GZIP_1"
    assert hdu.quantize_method == "SUBTRACTIVE_DITHER_1"
    assert hdu.quantize_level == 64.0
    assert hdu.dither_seed == 11
    assert tuple(hdu.tile_shape) == (6, 40)
    p2 = tmp_path / "b.fits"
    fits.write(p2, [fits.PrimaryHDU(), hdu])
    hdr2 = fits.open(p2)[1].header
    assert str(hdr2["ZCMPTYPE"]).strip() == "GZIP_1"
    assert str(hdr2["ZQUANTIZ"]).strip() == "SUBTRACTIVE_DITHER_1"
    assert int(hdr2["ZDITHER0"]) == 11
    got2 = fits.open(p2)[1].data
    # second generation re-quantizes the first generation's values: error
    # stays bounded by ~2 quantization steps
    assert np.abs(got2 - data).max() < 0.1


def test_quantize_level_zero_is_lossless(tmp_path):
    data = _smooth_float_image(ny=16, nx=32, seed=4)
    p = tmp_path / "l.fits"
    fits.write(p, [fits.PrimaryHDU(),
                   fits.CompImageHDU(data=data, name="W", quantize_level=0.0,
                                     tile_shape=(4, 32))])
    got = fits.open(p)[1].data
    np.testing.assert_array_equal(got, data)


def test_column_descr_bit_array():
    from euispice_coreg_tpu.io import tile_compression as tc

    hdr = Header({"TFIELDS": 3, "TTYPE1": "COMPRESSED_DATA", "TFORM1": "1PB(99)",
                  "TTYPE2": "FLAGS", "TFORM2": "16X",
                  "TTYPE3": "ZSCALE", "TFORM3": "1D"})
    cols, rowsize = tc._column_descr(hdr)
    assert cols["COMPRESSED_DATA"] == (0, "PB")
    assert cols["FLAGS"] == (8, "X")
    assert cols["ZSCALE"] == (10, "D")  # 16 bits -> 2 bytes
    assert rowsize == 18


def test_tile_randoms_match_scalar_reference():
    from euispice_coreg_tpu.io import tile_compression as tc

    rv = tc._dither_randoms()

    def scalar(row, dither0, npix):
        iseed = int((dither0 - 1 + row) % tc.N_RANDOM)
        irand = int(rv[iseed] * 500.0)
        out = np.empty(npix)
        for i in range(npix):
            out[i] = rv[irand]
            irand += 1
            if irand == tc.N_RANDOM:
                iseed = (iseed + 1) % tc.N_RANDOM
                irand = int(rv[iseed] * 500.0)
        return out

    for row, d0, n in [(0, 1, 7), (3, 42, 25_000), (9999, 9999, 12_345)]:
        np.testing.assert_array_equal(tc._tile_randoms(row, d0, n),
                                      scalar(row, d0, n))


def test_rice_truncated_stream_raises():
    """A truncated RICE stream must raise, not silently decode garbage
    (the bit reader tracks reads past the stream end)."""
    rng = np.random.default_rng(3)
    vals = rng.integers(-30000, 30000, size=1024).astype(np.int32)
    comp = rice_encode(vals, 32, 4)
    np.testing.assert_array_equal(rice_decode(comp, 1024, 32, 4), vals)
    with pytest.raises(RuntimeError):
        rice_decode(comp[: len(comp) // 2], 1024, 32, 4)
    with pytest.raises(RuntimeError):
        rice_decode(np.zeros(0, dtype=np.uint8), 16, 32, 4)


# ---------------------------------------------------------------------------
# HCOMPRESS_1 (native codec, io/native/hcompress.cpp)
# ---------------------------------------------------------------------------

def test_hcompress_codec_roundtrip_shapes():
    from euispice_coreg_tpu.io.native import hcomp_decode, hcomp_encode

    rng = np.random.default_rng(5)
    for shape in [(64, 64), (37, 53), (5, 9), (1, 16), (31, 1)]:
        a = (rng.normal(size=shape) * 500).astype(np.int32)
        comp = hcomp_encode(a, scale=0)
        dec, nx, ny = hcomp_decode(comp, a.size)
        assert (nx, ny) == shape
        np.testing.assert_array_equal(dec, a)


def test_hcompress_lossy_scale_bounded():
    from euispice_coreg_tpu.io.native import hcomp_decode, hcomp_encode

    rng = np.random.default_rng(6)
    y, x = np.mgrid[0:96, 0:96]
    a = (800 * np.exp(-((x - 40) ** 2 + (y - 50) ** 2) / 500)
         + rng.normal(0, 2, size=(96, 96))).astype(np.int32)
    lossless = hcomp_encode(a, scale=0)
    lossy = hcomp_encode(a, scale=16)
    assert len(lossy) < len(lossless)
    dec, _, _ = hcomp_decode(lossy, a.size)
    assert np.abs(dec.astype(np.int64) - a).max() <= 16


def test_hcompress_integer_hdu_roundtrip(tmp_path):
    rng = np.random.default_rng(7)
    img = rng.integers(-500, 3000, size=(48, 40)).astype(np.int32)
    path = tmp_path / "hc.fits"
    fits.write(path, [fits.PrimaryHDU(),
                      fits.CompImageHDU(data=img, name="W",
                                        compression_type="HCOMPRESS_1")])
    got = fits.open(path)["W"]
    assert got.header["ZCMPTYPE"] == "HCOMPRESS_1"
    np.testing.assert_array_equal(got.data, img)


def test_hcompress_tiled_hdu_roundtrip(tmp_path):
    rng = np.random.default_rng(8)
    img = rng.integers(0, 1000, size=(50, 35)).astype(np.int32)
    path = tmp_path / "hct.fits"
    fits.write(path, [fits.PrimaryHDU(),
                      fits.CompImageHDU(data=img, name="W",
                                        compression_type="HCOMPRESS_1",
                                        tile_shape=(16, 35))])
    np.testing.assert_array_equal(fits.open(path)["W"].data, img)


def test_hcompress_quantized_float_roundtrip(tmp_path):
    data = _smooth_float_image(seed=13)
    data[4, 6] = np.nan
    path = tmp_path / "hcq.fits"
    fits.write(path, [fits.PrimaryHDU(),
                      fits.CompImageHDU(data=data, name="W",
                                        compression_type="HCOMPRESS_1",
                                        quantize_level=32.0,
                                        tile_shape=(8, 53))])
    got = fits.open(path)["W"].data
    assert got.dtype == np.float32
    assert np.isnan(got[4, 6])
    fin = np.isfinite(data)
    assert np.abs(got[fin] - data[fin]).max() < 0.15


def test_hcompress_alignment_end_to_end(tmp_path):
    """A RICE-era flow with HCOMPRESS windows through the full public API."""
    import fixtures as fx
    from euispice_coreg_tpu.hdrshift.alignment import Alignment

    dl, hl, ds, hs = fx.make_helioprojective_pair(true_shift_arcsec=(8.0, -4.0))
    p_large = str(tmp_path / "large.fits")
    p_small = str(tmp_path / "small_hc.fits")
    fits.write(p_large, [fits.PrimaryHDU(data=dl.astype(np.float32),
                                         header=hl)])
    comp = fits.CompImageHDU(data=ds.astype(np.float32), header=hs,
                             name="HRI", compression_type="HCOMPRESS_1")
    comp.quantize_level = 64.0
    fits.write(p_small, [fits.PrimaryHDU(), comp])
    A = Alignment(
        large_fov_known_pointing=p_large, small_fov_to_correct=p_small,
        lag_crval1=np.arange(-2, 19, 2.0), lag_crval2=np.arange(-14, 7, 2.0),
        lag_cdelt1=None, lag_cdelt2=None, lag_crota=None,
        small_fov_window="HRI", large_fov_window=0)
    corr = A.align_using_helioprojective(return_type="corr")
    mi = np.unravel_index(np.nanargmax(corr), corr.shape)
    assert A.lag_crval1[mi[0]] == pytest.approx(8.0)
    assert A.lag_crval2[mi[1]] == pytest.approx(-4.0)


def test_hcompress_dither2_zero_pixels_roundtrip(tmp_path):
    """SUBTRACTIVE_DITHER_2's ZERO_VALUE sentinel cannot ride the
    H-transform: tiles with exact zeros must fall back losslessly instead
    of silently corrupting (code-review r2 finding #1)."""
    data = _smooth_float_image(seed=17)
    data[3, 3] = 0.0
    data[10, 20] = 0.0
    path = tmp_path / "hcz.fits"
    fits.write(path, [fits.PrimaryHDU(),
                      fits.CompImageHDU(data=data, name="W",
                                        compression_type="HCOMPRESS_1",
                                        quantize_level=32.0,
                                        quantize_method="SUBTRACTIVE_DITHER_2",
                                        tile_shape=(8, 53))])
    got = fits.open(path)["W"].data
    assert got[3, 3] == 0.0 and got[10, 20] == 0.0
    fin = np.isfinite(data)
    assert np.abs(got[fin] - data[fin]).max() < 0.15


def test_hcompress_int_dynamic_range_guard(tmp_path):
    """Integer images beyond the H-transform's int32 range must fail loudly
    at write time, not corrupt silently (code-review r2 finding #2)."""
    big = (np.arange(33 * 65, dtype=np.int64).reshape(33, 65) % 3
           * (1 << 27)).astype(np.int32)
    with pytest.raises(ValueError, match="HCOMPRESS_1 cannot"):
        fits.write(tmp_path / "hcbig.fits",
                   [fits.PrimaryHDU(),
                    fits.CompImageHDU(data=big, name="W",
                                      compression_type="HCOMPRESS_1")])


def test_hcompress_truncated_stream_rejected():
    """A stream shorter than the 25-byte header must error, not overread."""
    from euispice_coreg_tpu.io.native import hcomp_decode, hcomp_encode

    comp = hcomp_encode(np.arange(64, dtype=np.int32).reshape(8, 8))
    with pytest.raises(ValueError):
        hcomp_decode(comp[:23], 64)


# ---------------------------------------------------------------------------
# PLIO_1 (IRAF line-list masks, native codec io/native/plio.cpp)
# ---------------------------------------------------------------------------

def _plio_cases():
    rng = np.random.default_rng(21)
    return [
        np.array([0, 0, 0, 5, 5, 5, 0, 0, 1, 2, 3], dtype=np.int32),
        np.zeros(100, dtype=np.int32),
        np.full(300, 7, dtype=np.int32),
        np.arange(5000, dtype=np.int32),              # long increasing ramp
        np.concatenate([np.zeros(9000, np.int32), [3]]),   # >4095 zero run
        np.concatenate([np.full(9000, 9, np.int32), [0]]),  # >4095 hi run
        np.array([(1 << 24) - 1, (1 << 24) - 1, 0, 1], dtype=np.int32),
        np.array([100, 90, 90, 80, 0, 5], dtype=np.int32),  # decrements
        # (np.concatenate above promotes to int64; normalized below)
        rng.integers(0, 5, size=4096).astype(np.int32),     # mask-like
        rng.integers(0, 1 << 20, size=513).astype(np.int32),  # wide range
    ]


def _plio_cases_i32():
    return [np.ascontiguousarray(a, dtype=np.int32) for a in _plio_cases()]


def test_plio_codec_roundtrip():
    from euispice_coreg_tpu.io.native import plio_decode, plio_encode

    for a in _plio_cases():
        ll = plio_encode(a)
        np.testing.assert_array_equal(plio_decode(ll, a.size), a)


def test_plio_golden_cfitsio_streams():
    """Byte-exact decode of streams captured from libcfitsio's pl_p2li
    (the canonical PLIO encoder) — hermetic: vectors embedded here."""
    from euispice_coreg_tpu.io.native import plio_decode

    goldens = [
        ([0, 7, -100, 14, 0, 0, 0, 8196, 3, 16387, 12292, 20483, 24577,
          24577],
         [0, 0, 0, 5, 5, 5, 0, 0, 1, 2, 3]),
        ([0, 7, -100, 9, 0, 0, 0, 8198, 16387], [7, 7, 7]),
        ([0, 7, -100, 8, 0, 0, 0, 10], [0] * 10),
        ([0, 7, -100, 16, 0, 0, 0, 16386, 8193, 16387, 5792, 24, 16386,
          4138, 0, 20484],
         [1, 1, 2, 2, 2, 100000, 100000, 0, 0, 0, 42]),
        ([0, 7, -100, 13, 0, 0, 0, 8191, 4095, 16386, 4097, 0, 20482],
         [(1 << 24) - 1, (1 << 24) - 1, 0, 1]),
        ([0, 7, -100, 13, 0, 0, 0, 24675, 12298, 16386, 28682, 12363,
          20482],
         [100, 90, 90, 80, 0, 5]),
    ]
    for ll, expect in goldens:
        got = plio_decode(np.array(ll, dtype=np.int16), len(expect))
        np.testing.assert_array_equal(got, np.array(expect, dtype=np.int32))


def test_plio_cross_validate_against_cfitsio():
    """When libcfitsio is present, fuzz both directions against the
    canonical codec: cfitsio decodes our streams, we decode cfitsio's."""
    import ctypes

    from euispice_coreg_tpu.io.native import plio_decode, plio_encode

    lib = None
    for name in ("libcfitsio.so", "libcfitsio.so.10", "libcfitsio.so.9"):
        try:
            lib = ctypes.CDLL(name)
            break
        except OSError:
            continue
    if lib is None or not hasattr(lib, "pl_p2li"):
        pytest.skip("libcfitsio not available")
    lib.pl_p2li.restype = ctypes.c_int
    lib.pl_p2li.argtypes = [ctypes.c_void_p, ctypes.c_int, ctypes.c_void_p,
                            ctypes.c_int]
    lib.pl_l2pi.restype = ctypes.c_int
    lib.pl_l2pi.argtypes = [ctypes.c_void_p, ctypes.c_int, ctypes.c_void_p,
                            ctypes.c_int]

    for a in _plio_cases_i32():
        # theirs -> ours
        buf = np.zeros(a.size * 4 + 64, dtype=np.int16)
        n = lib.pl_p2li(a.ctypes.data, 1, buf.ctypes.data, a.size)
        assert n > 0
        np.testing.assert_array_equal(plio_decode(buf[:n], a.size), a)
        # ours -> theirs
        ll = plio_encode(a)
        out = np.zeros(a.size, dtype=np.int32)
        m = lib.pl_l2pi(np.ascontiguousarray(ll).ctypes.data, 1,
                        out.ctypes.data, a.size)
        assert m == a.size
        np.testing.assert_array_equal(out, a)


def test_plio_hdu_roundtrip(tmp_path):
    rng = np.random.default_rng(22)
    img = rng.integers(0, 8, size=(57, 43)).astype(np.int32)  # mask-like
    path = tmp_path / "plio.fits"
    fits.write(path, [fits.PrimaryHDU(),
                      fits.CompImageHDU(data=img, name="MASK",
                                        compression_type="PLIO_1")])
    got = fits.open(path)["MASK"]
    assert got.header["ZCMPTYPE"] == "PLIO_1"
    np.testing.assert_array_equal(got.data, img)


def test_plio_tiled_hdu_roundtrip(tmp_path):
    rng = np.random.default_rng(23)
    img = (rng.random(size=(50, 37)) < 0.2).astype(np.int32) * 4095
    path = tmp_path / "pliot.fits"
    fits.write(path, [fits.PrimaryHDU(),
                      fits.CompImageHDU(data=img, name="MASK",
                                        compression_type="PLIO_1",
                                        tile_shape=(16, 20))])
    np.testing.assert_array_equal(fits.open(path)["MASK"].data, img)


def test_plio_range_and_float_guards(tmp_path):
    from euispice_coreg_tpu.io.native import plio_encode

    with pytest.raises(ValueError, match=r"PLIO_1"):
        plio_encode(np.array([-1], dtype=np.int32))
    with pytest.raises(ValueError, match=r"PLIO_1"):
        plio_encode(np.array([1 << 24], dtype=np.int32))
    with pytest.raises(ValueError, match="integer mask"):
        fits.write(tmp_path / "bad.fits",
                   [fits.PrimaryHDU(),
                    fits.CompImageHDU(data=np.ones((8, 8), np.float32),
                                      name="W", compression_type="PLIO_1")])


# ---------------------------------------------------------------------------
# HCOMPRESS_1 cross-validation against libcfitsio (the canonical codec)
# ---------------------------------------------------------------------------

def _load_cfitsio():
    import ctypes

    for name in ("libcfitsio.so", "libcfitsio.so.10", "libcfitsio.so.9"):
        try:
            return ctypes.CDLL(name)
        except OSError:
            continue
    return None


def test_hcompress_golden_cfitsio_stream():
    """Byte-exact parity with a stream captured from a genuine
    cfitsio-written FITS file (5x8 NON-square tile, the case where the
    dim-word convention matters) — hermetic: vector embedded here.
    Dims are embedded (rows, cols) and the decoded flat order is the
    tile's row-major pixel order."""
    from euispice_coreg_tpu.io.native import hcomp_decode, hcomp_encode

    img = (np.arange(40, dtype=np.int32).reshape(5, 8) * 3 % 17)
    stream = bytes.fromhex(
        "dd990000000500000008000000000000000000000090060505f47ef9a0170801"
        "6c0ffbfeffbee087fe606e667fde986a07f86a7fc047ff7fdff0118020574"
        "0ad00")
    arr2d, nx, ny = hcomp_decode(np.frombuffer(stream, dtype=np.uint8), 40)
    assert (nx, ny) == (5, 8)  # (rows, cols), cfitsio convention
    np.testing.assert_array_equal(np.asarray(arr2d).reshape(5, 8), img)
    assert np.asarray(hcomp_encode(img, 0)).tobytes() == stream


def test_hcompress_cross_validate_against_cfitsio():
    """Fuzz both directions against cfitsio's raw codec entry points:
    cfitsio decodes our streams, we decode cfitsio's, many shapes incl.
    odd/odd and extreme aspect ratios.  ctypes traps learned the hard
    way: fits_hcompress H-transforms its input IN PLACE (pass a copy),
    and *nbytes is in/out (the output buffer size on input — 0 hangs)."""
    import ctypes

    from euispice_coreg_tpu.io.native import hcomp_decode, hcomp_encode

    lib = _load_cfitsio()
    if lib is None or not hasattr(lib, "fits_hcompress"):
        pytest.skip("libcfitsio not available")
    c_int, byref = ctypes.c_int, ctypes.byref
    lib.fits_hcompress.restype = c_int
    lib.fits_hcompress.argtypes = [ctypes.c_void_p, c_int, c_int, c_int,
                                   ctypes.c_void_p,
                                   ctypes.POINTER(ctypes.c_long),
                                   ctypes.POINTER(c_int)]
    lib.fits_hdecompress.restype = c_int
    lib.fits_hdecompress.argtypes = [ctypes.c_void_p, c_int, ctypes.c_void_p,
                                     ctypes.POINTER(c_int),
                                     ctypes.POINTER(c_int),
                                     ctypes.POINTER(c_int),
                                     ctypes.POINTER(c_int)]

    def cf_enc(tile):
        # cfitsio's tile writer (imcomp_compress_tile) passes the tile's
        # dims in this order for a row-major buffer — verified against a
        # real fits_set_compression_type-written file.
        a = np.array(tile, dtype=np.int32)  # fresh copy: mutated in place
        buf = ctypes.create_string_buffer(a.size * 8 + 1024)
        nb = ctypes.c_long(len(buf))
        st = c_int(0)
        r = lib.fits_hcompress(a.ctypes.data, a.shape[1], a.shape[0], 0,
                               buf, byref(nb), byref(st))
        assert r == 0 and st.value == 0, (r, st.value)
        return bytes(buf.raw[:nb.value])

    def cf_dec(stream, npix):
        out = np.zeros(npix, dtype=np.int32)
        ny = c_int(0)
        nx = c_int(0)
        sc = c_int(0)
        st = c_int(0)
        r = lib.fits_hdecompress(stream, 0, out.ctypes.data, byref(ny),
                                 byref(nx), byref(sc), byref(st))
        assert r == 0 and st.value == 0, (r, st.value)
        return out

    rng = np.random.default_rng(31)
    shapes = [(4, 6), (5, 5), (5, 8), (7, 64), (64, 7), (17, 32), (33, 33),
              (13, 21), (128, 5), (9, 9), (30, 45), (16, 128)]
    for shape in shapes:
        lo, hi = sorted(rng.integers(-60000, 60000, size=2))
        a = rng.integers(lo, hi + 1, size=shape).astype(np.int32)
        # theirs -> ours
        s = cf_enc(a)
        dec, nx, ny = hcomp_decode(np.frombuffer(s, dtype=np.uint8), a.size)
        assert (nx, ny) == shape
        np.testing.assert_array_equal(np.asarray(dec).reshape(shape), a)
        # ours -> theirs, and byte-identity
        mine = np.asarray(hcomp_encode(a.copy(), 0)).tobytes()
        assert mine == s, f"stream not byte-identical for {shape}"
        np.testing.assert_array_equal(cf_dec(mine, a.size).reshape(shape), a)


def test_hcompress_real_cfitsio_file_bidirectional(tmp_path):
    """Full-file interop both ways: a FITS written through cfitsio's own
    tile-compression path (non-square tiles with partial edge tiles) reads
    back exactly through our reader, and a file written by OUR
    CompImageHDU writer reads back exactly through cfitsio."""
    import ctypes

    lib = _load_cfitsio()
    if lib is None or not hasattr(lib, "ffinit"):
        pytest.skip("libcfitsio not available")
    c_int, byref = ctypes.c_int, ctypes.byref
    lib.ffinit.argtypes = [ctypes.POINTER(ctypes.c_void_p), ctypes.c_char_p,
                           ctypes.POINTER(c_int)]
    lib.ffopen.argtypes = [ctypes.POINTER(ctypes.c_void_p), ctypes.c_char_p,
                           c_int, ctypes.POINTER(c_int)]
    lib.fits_set_compression_type.argtypes = [ctypes.c_void_p, c_int,
                                              ctypes.POINTER(c_int)]
    lib.fits_set_tile_dim.argtypes = [ctypes.c_void_p, c_int, ctypes.c_void_p,
                                      ctypes.POINTER(c_int)]
    lib.fits_set_hcomp_scale.argtypes = [ctypes.c_void_p, ctypes.c_float,
                                         ctypes.POINTER(c_int)]
    lib.ffcrim.argtypes = [ctypes.c_void_p, c_int, c_int, ctypes.c_void_p,
                           ctypes.POINTER(c_int)]
    lib.ffpprk.argtypes = [ctypes.c_void_p, c_int, ctypes.c_longlong,
                           ctypes.c_longlong, ctypes.c_void_p,
                           ctypes.POINTER(c_int)]
    lib.ffgpvk.argtypes = [ctypes.c_void_p, c_int, ctypes.c_longlong,
                           ctypes.c_longlong, c_int, ctypes.c_void_p,
                           ctypes.POINTER(c_int), ctypes.POINTER(c_int)]
    lib.ffclos.argtypes = [ctypes.c_void_p, ctypes.POINTER(c_int)]

    rows, cols = 37, 52
    rng = np.random.default_rng(41)
    img = rng.integers(-2000, 3000, size=(rows, cols)).astype(np.int32)

    # --- cfitsio writes, we read ---
    path_cf = str(tmp_path / "cf_hcomp.fits").encode()
    f = ctypes.c_void_p()
    st = c_int(0)
    lib.ffinit(byref(f), b"!" + path_cf, byref(st))
    assert st.value == 0
    lib.fits_set_compression_type(f, 41, byref(st))  # HCOMPRESS_1
    assert st.value == 0
    tdim = (ctypes.c_long * 2)(20, 16)  # ZTILE1=20 cols, ZTILE2=16 rows
    lib.fits_set_tile_dim(f, 2, tdim, byref(st))
    assert st.value == 0
    lib.fits_set_hcomp_scale(f, ctypes.c_float(0.0), byref(st))
    assert st.value == 0
    naxes = (ctypes.c_long * 2)(cols, rows)
    lib.ffcrim(f, 32, 2, naxes, byref(st))
    assert st.value == 0
    lib.ffpprk(f, 0, 1, rows * cols, img.ctypes.data, byref(st))
    assert st.value == 0
    lib.ffclos(f, byref(st))
    assert st.value == 0

    hdu = fits.open(path_cf.decode())[1]
    assert hdu.header["ZCMPTYPE"] == "HCOMPRESS_1"
    np.testing.assert_array_equal(np.asarray(hdu.data, dtype=np.int64), img)

    # --- we write, cfitsio reads ---
    path_us = str(tmp_path / "us_hcomp.fits")
    fits.write(path_us, [fits.PrimaryHDU(),
                         fits.CompImageHDU(data=img, name="IMG",
                                           compression_type="HCOMPRESS_1")])
    lib.ffmahd.argtypes = [ctypes.c_void_p, c_int, ctypes.POINTER(c_int),
                           ctypes.POINTER(c_int)]
    f2 = ctypes.c_void_p()
    st = c_int(0)
    lib.ffopen(byref(f2), path_us.encode(), 0, byref(st))
    assert st.value == 0, st.value
    hdutype = c_int(0)
    lib.ffmahd(f2, 2, byref(hdutype), byref(st))  # the compressed image HDU
    assert st.value == 0, st.value
    out = np.zeros(rows * cols, dtype=np.int32)
    anynul = c_int(0)
    lib.ffgpvk(f2, 0, 1, rows * cols, 0, out.ctypes.data, byref(anynul),
               byref(st))
    assert st.value == 0, st.value
    lib.ffclos(f2, byref(st))
    np.testing.assert_array_equal(out.reshape(rows, cols), img)


@pytest.mark.parametrize("ctype", ["RICE_1", "GZIP_1", "GZIP_2", "PLIO_1"])
def test_cfitsio_reads_our_compressed_files(tmp_path, ctype):
    """Every ZCMPTYPE our writer emits must be readable by cfitsio (the
    engine under astropy) — guards the mandated BINTABLE keyword order
    (TFIELDS 8th) and the per-codec stream conventions."""
    import ctypes

    lib = _load_cfitsio()
    if lib is None or not hasattr(lib, "ffopen"):
        pytest.skip("libcfitsio not available")
    c_int, byref = ctypes.c_int, ctypes.byref
    lib.ffopen.argtypes = [ctypes.POINTER(ctypes.c_void_p), ctypes.c_char_p,
                           c_int, ctypes.POINTER(c_int)]
    lib.ffmahd.argtypes = [ctypes.c_void_p, c_int, ctypes.POINTER(c_int),
                           ctypes.POINTER(c_int)]
    lib.ffgpvk.argtypes = [ctypes.c_void_p, c_int, ctypes.c_longlong,
                           ctypes.c_longlong, c_int, ctypes.c_void_p,
                           ctypes.POINTER(c_int), ctypes.POINTER(c_int)]
    lib.ffclos.argtypes = [ctypes.c_void_p, ctypes.POINTER(c_int)]

    rows, cols = 29, 41
    rng = np.random.default_rng(43)
    if ctype == "PLIO_1":
        img = rng.integers(0, 12, size=(rows, cols)).astype(np.int32)
    else:
        img = rng.integers(-900, 1200, size=(rows, cols)).astype(np.int32)
    path = str(tmp_path / f"us_{ctype.lower()}.fits")
    fits.write(path, [fits.PrimaryHDU(),
                      fits.CompImageHDU(data=img, name="IMG",
                                        compression_type=ctype)])
    f = ctypes.c_void_p()
    st = c_int(0)
    lib.ffopen(byref(f), path.encode(), 0, byref(st))
    assert st.value == 0, st.value
    hdutype = c_int(0)
    lib.ffmahd(f, 2, byref(hdutype), byref(st))
    assert st.value == 0, st.value
    out = np.zeros(rows * cols, dtype=np.int32)
    anynul = c_int(0)
    lib.ffgpvk(f, 0, 1, rows * cols, 0, out.ctypes.data, byref(anynul),
               byref(st))
    assert st.value == 0, st.value
    lib.ffclos(f, byref(st))
    np.testing.assert_array_equal(out.reshape(rows, cols), img)


def test_native_decoders_survive_malformed_streams():
    """Fuzz the C++ decoders with garbage, truncations, and bit flips:
    they must raise (or decode to something) — never crash or scribble.
    A longer 18k-case run of this generator passed during development;
    this is the fast regression slice."""
    from euispice_coreg_tpu.io.native import (hcomp_decode, hcomp_encode,
                                              plio_decode, plio_encode,
                                              rice_decode, rice_encode)

    rng = np.random.default_rng(0)

    def try_dec(fn, *args):
        try:
            fn(*args)
        except Exception:
            pass  # clean rejection is the expected path

    for _ in range(120):
        npix = int(rng.integers(1, 513))
        junk = rng.integers(0, 256,
                            size=int(rng.integers(1, 400))).astype(np.uint8)
        try_dec(rice_decode, junk, npix, 32, 4)
        try_dec(hcomp_decode, junk, npix)
        try_dec(plio_decode, junk[: (junk.size // 2) * 2].view(np.int16), npix)

    for _ in range(60):
        n = int(rng.integers(4, 200))
        a = rng.integers(-3000, 3000, size=n).astype(np.int32)
        r = rice_encode(a, 32, 4)
        try_dec(rice_decode, r[: int(rng.integers(0, r.size))], n, 32, 4)
        rf = r.copy()
        rf[int(rng.integers(0, rf.size))] ^= 1 << int(rng.integers(0, 8))
        try_dec(rice_decode, rf, n, 32, 4)

        rows, cols = int(rng.integers(2, 20)), int(rng.integers(2, 20))
        h = hcomp_encode(
            rng.integers(-500, 500, size=(rows, cols)).astype(np.int32), 0)
        try_dec(hcomp_decode, h[: int(rng.integers(0, h.size))], rows * cols)
        hf = h.copy()
        hf[int(rng.integers(0, hf.size))] ^= 1 << int(rng.integers(0, 8))
        try_dec(hcomp_decode, hf, rows * cols)

        m = rng.integers(0, 9, size=int(rng.integers(1, 300))).astype(np.int32)
        p = plio_encode(m)
        try_dec(plio_decode, p[: int(rng.integers(0, p.size))], m.size)
        pf = np.array(p, dtype=np.int16)
        pf[int(rng.integers(0, pf.size))] ^= np.int16(
            1 << int(rng.integers(0, 15)))
        try_dec(plio_decode, pf, m.size)


def test_fits_open_survives_corrupted_files():
    """Whole-file fuzz: truncations, bit flips, and garbage through
    fits.open + data decode must raise cleanly (or tolerate benign pixel
    corruption) — never crash or hang.  Fast slice of a 1000-case run."""
    rng = np.random.default_rng(1)
    img = rng.integers(0, 1000, size=(24, 31)).astype(np.int32)
    f32 = rng.normal(size=(16, 18)).astype(np.float32)
    buf = fits.serialize([fits.PrimaryHDU(data=f32),
                          fits.CompImageHDU(data=img, name="C",
                                            compression_type="RICE_1",
                                            tile_shape=(8, 16))]) \
        if hasattr(fits, "serialize") else None
    if buf is None:
        import tempfile
        import os
        with tempfile.TemporaryDirectory() as td:
            p = os.path.join(td, "v.fits")
            fits.write(p, [fits.PrimaryHDU(data=f32),
                           fits.CompImageHDU(data=img, name="C",
                                             compression_type="RICE_1",
                                             tile_shape=(8, 16))])
            buf = open(p, "rb").read()

    def attempt(blob):
        try:
            for h in fits.open(blob):
                _ = h.data
        except Exception:
            pass

    for _ in range(40):
        attempt(buf[: int(rng.integers(0, len(buf)))])
    for _ in range(40):
        b = bytearray(buf)
        for _k in range(int(rng.integers(1, 8))):
            b[int(rng.integers(0, len(b)))] ^= 1 << int(rng.integers(0, 8))
        attempt(bytes(b))
    for _ in range(20):
        attempt(bytes(rng.integers(0, 256, size=int(
            rng.integers(0, 6000))).astype(np.uint8)))


def test_hcompress_dims_mismatch_rejected():
    """A stream whose embedded dims multiply to npix but disagree with the
    tile shape must raise, not reshape to silently garbled pixels."""
    from euispice_coreg_tpu.io.native import hcomp_encode
    from euispice_coreg_tpu.io.tile_compression import _decode_tile_ints

    a = np.arange(4 * 6, dtype=np.int32).reshape(4, 6)
    s = np.asarray(hcomp_encode(a, 0)).tobytes()  # embeds (4, 6)
    # correct tile shape decodes
    got = _decode_tile_ints(s, 24, "HCOMPRESS_1", 32, 4, zbitpix=32,
                            quantized=False, tile_hw=(4, 6))
    np.testing.assert_array_equal(got.reshape(4, 6), a)
    # swapped tile shape is a loud error
    with pytest.raises(ValueError, match="dims"):
        _decode_tile_ints(s, 24, "HCOMPRESS_1", 32, 4, zbitpix=32,
                          quantized=False, tile_hw=(6, 4))


# ---------------------------------------------------------------------------
# committed cfitsio fixtures: float quantization interop pinned across rounds
# (tools/gen_fits_fixtures.py regenerates them where libcfitsio exists)
# ---------------------------------------------------------------------------

_FIXDIR = pathlib.Path(__file__).parent / "data"


@pytest.mark.parametrize("stem", ["cfitsio_hcomp_float_d1",
                                  "cfitsio_rice_float_d1"])
def test_float_quantized_cfitsio_fixture(stem):
    """Bit-exact decode of cfitsio-written float32 images (HCOMPRESS_1 and
    RICE_1, quantize level 16, SUBTRACTIVE_DITHER_1, ZDITHER0=4242, one
    all-NaN tile, partial edge tiles) against cfitsio's OWN decode of the
    same file, both committed.  Hermetic: pins the full quantized-float
    read path — dither RNG sequence, per-tile ZSCALE/ZZERO, gzip fallback
    for the unquantizable all-NaN tile — with no libcfitsio at runtime.

    The scene deliberately has NO isolated in-tile NaNs: under
    SUBTRACTIVE_DITHER_1 cfitsio's writer dithers the NULL code along with
    the data (NULL_VALUE + rand - 0.5 rounds to INT32_MIN for rand < 0.5),
    so even cfitsio's own reader returns garbage at such pixels — there is
    no interop ground truth for that case (see tools/gen_fits_fixtures.py).
    Mirrors the reference's reliance on astropy/cfitsio for compressed
    files (/root/reference/euispice_coreg/utils/Util.py)."""
    hdu = fits.open(str(_FIXDIR / f"{stem}.fits"))[1]
    expected = np.load(_FIXDIR / f"{stem}_expected.npy")
    got = np.asarray(hdu.data, dtype=np.float32)
    fin = np.isfinite(expected)
    assert np.array_equal(fin, np.isfinite(got))
    np.testing.assert_array_equal(got[fin], expected[fin])
    # quantization error vs the analytic scene stays ~1 step
    assert hdu.header["ZDITHER0"] == 4242


@pytest.mark.parametrize("ctype", ["HCOMPRESS_1", "RICE_1"])
def test_float_quantized_write_bytes_stable(tmp_path, ctype):
    """Our writer's compressed float output is byte-stable across rounds:
    the exact emitted file is committed as a golden and compared
    byte-for-byte (quantization decisions, dither sequence, codec streams,
    header serialization).  Regenerate after INTENTIONAL format changes:
    EUICOREG_REGEN_GOLDENS=1 python -m pytest tests/test_fits_io.py -k
    write_bytes_stable."""
    import os

    rng = np.random.default_rng(23)
    y, x = np.mgrid[0:37, 0:52]
    img = (1500.0 + 80.0 * np.sin(x / 7.0) * np.cos(y / 5.0)
           + rng.normal(scale=4.0, size=(37, 52))).astype(np.float32)
    img[0:16, 20:40] = np.nan      # all-NaN tile -> lossless fallback
    img[20, 5] = np.nan            # in-tile NaN: OUR writer handles it
    path = tmp_path / f"w_{ctype}.fits"
    fits.write(path, [fits.PrimaryHDU(),
                      fits.CompImageHDU(data=img, name="W",
                                        compression_type=ctype,
                                        tile_shape=(16, 20),
                                        quantize_level=16.0,
                                        quantize_method="SUBTRACTIVE_DITHER_1",
                                        dither_seed=4242)])
    got = path.read_bytes()

    golden = _FIXDIR / f"writer_{ctype.lower()}_float_golden.fits"
    if os.environ.get("EUICOREG_REGEN_GOLDENS") == "1" or not golden.exists():
        golden.write_bytes(got)
    assert got == golden.read_bytes(), (
        f"{ctype} float write drifted from the committed golden; if the "
        "change is intentional regenerate with EUICOREG_REGEN_GOLDENS=1")

    # and the round-trip keeps exact NaN footprint incl. the in-tile NaN
    back = np.asarray(fits.open(str(path))[1].data)
    assert np.array_equal(np.isfinite(back), np.isfinite(img))
    fin = np.isfinite(img)
    assert np.abs(back[fin] - img[fin]).max() < 1.5
