"""End-to-end lag-search engine tests on synthetic pairs with known shifts."""
import numpy as np
import pytest

import fixtures as fx
from euispice_coreg_tpu.hdrshift.alignment import Alignment
from euispice_coreg_tpu.hdrshift.results import AlignmentResults


def make_alignment(tmp_path, true_shift=(8.0, -4.0), **kwargs):
    dl, hl, ds, hs = fx.make_helioprojective_pair(true_shift_arcsec=true_shift)
    p_large, p_small = fx.write_pair_fits(tmp_path, dl, hl, ds, hs)
    defaults = dict(
        large_fov_known_pointing=p_large,
        small_fov_to_correct=p_small,
        lag_crval1=np.arange(-2, 19, 2.0),
        lag_crval2=np.arange(-14, 7, 2.0),
        lag_cdelt1=None,
        lag_cdelt2=None,
        lag_crota=None,
        small_fov_window=0,
        large_fov_window=0,
    )
    defaults.update(kwargs)
    return Alignment(**defaults)


def test_helioprojective_recovers_integer_shift(tmp_path):
    A = make_alignment(tmp_path, true_shift=(8.0, -4.0))
    corr = A.align_using_helioprojective(method="correlation", return_type="corr")
    assert corr.shape == (11, 11, 1, 1, 1, 1)
    mi = np.unravel_index(np.nanargmax(corr), corr.shape)
    assert A.lag_crval1[mi[0]] == pytest.approx(8.0)
    assert A.lag_crval2[mi[1]] == pytest.approx(-4.0)


def test_helioprojective_results_object(tmp_path):
    A = make_alignment(tmp_path, true_shift=(8.0, -4.0))
    res = A.align_using_helioprojective(method="correlation")
    assert isinstance(res, AlignmentResults)
    # Gaussian sub-pixel fit should land within half a lag step of truth
    assert res.shift_arcsec[0] == pytest.approx(8.0, abs=1.0)
    assert res.shift_arcsec[1] == pytest.approx(-4.0, abs=1.0)


@pytest.mark.slow
def test_helioprojective_subpixel_shift(tmp_path):
    A = make_alignment(tmp_path, true_shift=(8.6, -3.4))
    res = A.align_using_helioprojective(method="correlation")
    assert res.shift_arcsec[0] == pytest.approx(8.6, abs=0.7)
    assert res.shift_arcsec[1] == pytest.approx(-3.4, abs=0.7)


def test_crota_lag_recovery(tmp_path):
    dl, hl, ds, hs = fx.make_helioprojective_pair(
        true_shift_arcsec=(0.0, 0.0), true_dcrota_deg=1.0
    )
    p_large, p_small = fx.write_pair_fits(tmp_path, dl, hl, ds, hs)
    A = Alignment(
        large_fov_known_pointing=p_large,
        small_fov_to_correct=p_small,
        lag_crval1=np.array([0.0]),
        lag_crval2=np.array([0.0]),
        lag_cdelt1=None,
        lag_cdelt2=None,
        lag_crota=np.arange(-2.0, 2.5, 0.5),
        small_fov_window=0,
        large_fov_window=0,
    )
    corr = A.align_using_helioprojective(return_type="corr")
    mi = np.unravel_index(np.nanargmax(corr), corr.shape)
    assert A.lag_crota[mi[4]] == pytest.approx(1.0)


def test_residus_method_runs(tmp_path):
    A = make_alignment(tmp_path)
    corr = A.align_using_helioprojective(method="residus_masked", return_type="corr")
    # residue is a distance: best lag has the MINIMUM value
    mi = np.unravel_index(np.nanargmin(corr), corr.shape)
    assert A.lag_crval1[mi[0]] == pytest.approx(8.0)
    assert A.lag_crval2[mi[1]] == pytest.approx(-4.0)


def test_thresholds_nan_small_fov(tmp_path):
    A = make_alignment(tmp_path, small_fov_value_min=1e9)
    with pytest.raises(ValueError, match="all small FOV to nan"):
        A.align_using_helioprojective(return_type="corr")


@pytest.mark.slow
def test_mesh_sharded_matches_single_device(tmp_path):
    A1 = make_alignment(tmp_path, use_device_mesh=False)
    corr1 = A1.align_using_helioprojective(return_type="corr")
    A2 = make_alignment(tmp_path, use_device_mesh=True)
    assert A2.mesh is not None and A2.mesh.devices.size == 8
    corr2 = A2.align_using_helioprojective(return_type="corr")
    # sharded FFT reductions reorder float32 sums: tiny tolerance
    np.testing.assert_allclose(corr1, corr2, rtol=1e-5, atol=1e-6)


@pytest.mark.slow
def test_float32_vs_float64_argmax(tmp_path):
    A1 = make_alignment(tmp_path, compute_dtype="float64")
    c64 = A1.align_using_helioprojective(return_type="corr")
    A2 = make_alignment(tmp_path, compute_dtype="float32")
    c32 = A2.align_using_helioprojective(return_type="corr")
    assert np.unravel_index(np.nanargmax(c64), c64.shape) == \
        np.unravel_index(np.nanargmax(c32), c32.shape)
    np.testing.assert_allclose(c32, c64, atol=2e-4)


@pytest.mark.slow
def test_initial_carrington_recovery(tmp_path):
    # CAR-frame pair: plain linear WCS in carrington lon/lat
    from euispice_coreg_tpu.utils import coords

    hdr_large = fx.make_header((160, 160), (30.0, 30.0), (120.0 * 3600, 0.0),
                               0.0, ctype=("CRLN-CAR", "CRLT-CAR"))
    lon, lat = coords.header_world_grid(hdr_large, wrap=False)
    data_large = fx.scene_carrington(lon, lat)

    true_shift = (40.0, -20.0)
    hdr_true = fx.make_header((64, 64), (15.0, 15.0),
                              (120.3 * 3600, 0.1 * 3600), 0.0,
                              ctype=("CRLN-CAR", "CRLT-CAR"))
    lon_s, lat_s = coords.header_world_grid(hdr_true, wrap=False)
    data_small = fx.scene_carrington(lon_s, lat_s)
    hdr_small = fx.make_header(
        (64, 64), (15.0, 15.0),
        (120.3 * 3600 - true_shift[0], 0.1 * 3600 - true_shift[1]), 0.0,
        ctype=("CRLN-CAR", "CRLT-CAR"))

    p_large, p_small = fx.write_pair_fits(tmp_path, data_large, hdr_large,
                                          data_small, hdr_small)
    A = Alignment(
        large_fov_known_pointing=p_large,
        small_fov_to_correct=p_small,
        lag_crval1=np.arange(20.0, 61.0, 10.0),
        lag_crval2=np.arange(-40.0, 1.0, 10.0),
        lag_cdelt1=None, lag_cdelt2=None, lag_crota=None,
        small_fov_window=0, large_fov_window=0,
    )
    corr = A.align_using_initial_carrington(return_type="corr")
    mi = np.unravel_index(np.nanargmax(corr), corr.shape)
    assert A.lag_crval1[mi[0]] == pytest.approx(true_shift[0])
    assert A.lag_crval2[mi[1]] == pytest.approx(true_shift[1])


def test_carrington_fa_recovery(tmp_path):
    dl, hl, ds, hs = fx.make_carrington_pair(true_shift_arcsec=(20.0, -10.0))
    p_large, p_small = fx.write_pair_fits(tmp_path, dl, hl, ds, hs)
    A = Alignment(
        large_fov_known_pointing=p_large,
        small_fov_to_correct=p_small,
        lag_crval1=np.arange(0.0, 41.0, 5.0),
        lag_crval2=np.arange(-30.0, 11.0, 5.0),
        lag_cdelt1=None, lag_cdelt2=None, lag_crota=None,
        small_fov_window=0, large_fov_window=0,
    )
    corr = A.align_using_carrington(
        lonlims=(115.0, 125.0), latlims=(-2.0, 8.0), shape=(128, 128),
        return_type="corr",
    )
    assert corr.shape == (9, 9, 1, 1, 1, 1)
    mi = np.unravel_index(np.nanargmax(corr), corr.shape)
    assert A.lag_crval1[mi[0]] == pytest.approx(20.0)
    assert A.lag_crval2[mi[1]] == pytest.approx(-10.0)


def test_write_corrected_fits_roundtrip(tmp_path):
    from euispice_coreg_tpu.io import fits

    A = make_alignment(tmp_path, true_shift=(8.0, -4.0))
    res = A.align_using_helioprojective()
    out = str(tmp_path / "corrected.fits")
    res.write_corrected_fits(window_list_to_apply_shift=[0], path_to_l3_output=out)
    hdul = fits.open(out)
    orig = fits.open(str(tmp_path / "small.fits"))
    shift1 = hdul[0].header["CRVAL1"] - orig[0].header["CRVAL1"]
    shift2 = hdul[0].header["CRVAL2"] - orig[0].header["CRVAL2"]
    assert shift1 == pytest.approx(res.shift_arcsec[0])
    assert shift2 == pytest.approx(res.shift_arcsec[1])
    # data untouched
    np.testing.assert_allclose(hdul[0].data, orig[0].data, rtol=1e-6)


def test_return_corrected_header(tmp_path):
    A = make_alignment(tmp_path, true_shift=(8.0, -4.0))
    res = A.align_using_helioprojective()
    hdr = res.return_corrected_header(window=0)
    from euispice_coreg_tpu.io import fits

    orig = fits.open(str(tmp_path / "small.fits"))[0].header
    assert hdr["CRVAL1"] - orig["CRVAL1"] == pytest.approx(res.shift_arcsec[0])


def test_remove_fov_limits_runs(tmp_path):
    A = make_alignment(tmp_path)
    corr = A.align_using_helioprojective(
        return_type="corr",
        remove_fov_limits=[[100.0, 140.0], [60.0, 100.0]],
    )
    mi = np.unravel_index(np.nanargmax(corr), corr.shape)
    # alignment still works with the center box removed
    assert A.lag_crval1[mi[0]] == pytest.approx(8.0)


@pytest.mark.slow
def test_fov_limits_crops(tmp_path):
    A = make_alignment(tmp_path)
    corr = A.align_using_helioprojective(
        return_type="corr",
        fov_limits=[[-20.0, 260.0], [-100.0, 250.0]],
    )
    mi = np.unravel_index(np.nanargmax(corr), corr.shape)
    assert A.lag_crval1[mi[0]] == pytest.approx(8.0)
    assert A.lag_crval2[mi[1]] == pytest.approx(-4.0)


def test_multiple_lag_solar_r(tmp_path):
    """Multiple solar radii work (the reference crashes, SURVEY.md 2.3):
    helioprojective ignores the value, so planes must be identical."""
    A = make_alignment(tmp_path, lag_solar_r=[1.0, 1.004])
    corr = A.align_using_helioprojective(return_type="corr")
    assert corr.shape[-1] == 2
    np.testing.assert_array_equal(corr[..., 0], corr[..., 1])


def test_carrington_multiple_solar_r(tmp_path):
    import fixtures as fx2

    dl, hl, ds, hs = fx2.make_carrington_pair(true_shift_arcsec=(20.0, -10.0))
    p_large, p_small = fx2.write_pair_fits(tmp_path, dl, hl, ds, hs)
    A = Alignment(
        large_fov_known_pointing=p_large, small_fov_to_correct=p_small,
        lag_crval1=np.array([0.0, 20.0]), lag_crval2=np.array([-10.0, 0.0]),
        lag_cdelt1=None, lag_cdelt2=None, lag_crota=None,
        lag_solar_r=[1.0, 1.004],
        small_fov_window=0, large_fov_window=0,
    )
    corr = A.align_using_carrington(
        lonlims=(115.0, 125.0), latlims=(-2.0, 8.0), shape=(128, 128),
        return_type="corr")
    assert corr.shape == (2, 2, 1, 1, 1, 2)
    # the two radius planes are genuinely different computations
    assert not np.array_equal(corr[..., 0], corr[..., 1])
    # the true lag (20, -10) wins within each radius plane
    for k in range(2):
        mi = np.unravel_index(np.nanargmax(corr[..., k]), corr[..., k].shape)
        assert (mi[0], mi[1]) == (1, 0)


@pytest.mark.slow
def test_device_cache_reuse_and_invalidation(tmp_path):
    """devcache: repeat alignments from the same file reuse one device
    buffer; thresholds/mutations and file rewrites invalidate it."""
    from euispice_coreg_tpu.utils import devcache

    devcache.clear()
    dl, hl, ds, hs = fx.make_helioprojective_pair(true_shift_arcsec=(8.0, -4.0))
    p_large, p_small = fx.write_pair_fits(tmp_path, dl, hl, ds, hs)

    def make(**kw):
        return Alignment(
            large_fov_known_pointing=p_large, small_fov_to_correct=p_small,
            lag_crval1=np.arange(6.0, 10.1, 1.0),
            lag_crval2=np.arange(-6.0, -1.9, 1.0),
            lag_cdelt1=None, lag_cdelt2=None, lag_crota=None,
            small_fov_window=0, large_fov_window=0, **kw,
        )

    A1 = make()
    A1._load_pair()
    d1 = A1._large_dev()
    A2 = make()
    A2._load_pair()
    d2 = A2._large_dev()
    assert d1 is d2  # same file -> same cached device buffer

    # thresholds mutate the host array -> key invalidated, fresh upload
    A3 = make(small_fov_value_min=0.0)
    A3._load_pair()
    s_before = A3._small_dev()
    A3._apply_thresholds()
    assert A3._small_key is None
    s_after = A3._small_dev()
    assert s_after is not s_before

    # rewriting the file changes (mtime, size) -> fresh upload
    fx.write_pair_fits(tmp_path, dl * 2.0, hl, ds, hs)
    A4 = make()
    A4._load_pair()
    d4 = A4._large_dev()
    assert d4 is not d1
    np.testing.assert_allclose(np.asarray(d4),
                               (dl * 2.0).astype(np.asarray(d4).dtype),
                               rtol=1e-6)

    # results stay correct through the cached path
    res = make().align_using_helioprojective()
    assert abs(res.shift_arcsec[0] - 8.0) < 1.0
    assert abs(res.shift_arcsec[1] + 4.0) < 1.0
    devcache.clear()


def test_invalid_reprojection_order_rejected(tmp_path):
    with pytest.raises(ValueError, match="reprojection_order"):
        Alignment(
            large_fov_known_pointing="x.fits", small_fov_to_correct="y.fits",
            lag_crval1=[0.0], lag_crval2=[0.0],
            lag_cdelt1=None, lag_cdelt2=None, lag_crota=None,
            reprojection_order=5)


def test_write_corrected_fits_no_match_publishes_nothing(tmp_path):
    """A window list matching no HDU must raise BEFORE publishing: an
    uncorrected copy on disk would be trusted as done by resume= flows
    (jitter_correction resume=True skips existing outputs)."""
    A = make_alignment(tmp_path, true_shift=(8.0, -4.0))
    res = A.align_using_helioprojective()
    out = tmp_path / "corrected.fits"
    with pytest.raises(ValueError, match="has not corrected"):
        res.write_corrected_fits(window_list_to_apply_shift=["NO_SUCH_WINDOW"],
                                 path_to_l3_output=str(out))
    assert not out.exists()
