"""Pallas fused warp+score kernel vs the reference-exact gather engine
(interpret mode on CPU)."""
import numpy as np
import pytest

import fixtures as fx
from euispice_coreg_tpu.core.header import get_crota, wcs_params_from_header
from euispice_coreg_tpu.engine import lag_search, pallas_warp
from euispice_coreg_tpu.utils import coords


def build_inputs(seed=0):
    dl, hl, ds, hs = fx.make_helioprojective_pair(
        true_shift_arcsec=(8.0, -4.0), small_naxis=(512, 512),
        small_cdelt=(2.0, 2.0), seed=seed
    )
    lon, lat = coords.header_world_grid(hs)
    xg, yg = coords.world_to_pixel_of_header(hl, lon, lat)
    ref_img = lag_search.resample_to_grid(dl, xg, yg, order=2,
                                          compute_dtype="float64")
    base = {**wcs_params_from_header(hs).as_dict(), "crota": get_crota(hs)}
    return ds, ref_img, lon, lat, base


@pytest.mark.parametrize("l5", [[0.0], [0.75]])
@pytest.mark.slow
def test_pallas_matches_general(l5):
    ds, ref_img, lon, lat, base = build_inputs()
    l1 = np.arange(0, 17, 8.0) / 3600.0
    l2 = np.arange(-12, 5, 8.0) / 3600.0

    general = lag_search.evaluate_lag_grid(
        ds, ref_img, lon, lat, base, l1, l2, [0.0], [0.0], l5,
        order=2, compute_dtype="float32", allow_fast=False,
    )
    got = pallas_warp.evaluate_lag_grid_pallas(
        ds, ref_img, lon, lat, base, l1, l2, [0.0], [0.0], l5,
        order=2, interpret=True,
    )
    assert got is not None
    np.testing.assert_allclose(got, general, atol=2e-4)
    assert np.unravel_index(np.nanargmax(got), got.shape) == \
        np.unravel_index(np.nanargmax(general), general.shape)


def test_pallas_with_nans_in_inputs():
    ds, ref_img, lon, lat, base = build_inputs()
    ds[10:20, 30:40] = np.nan
    ref_img = ref_img.copy()
    ref_img[50:60, 5:15] = np.nan
    l1 = np.array([0.0, 8.0 / 3600.0])
    l2 = np.array([-4.0 / 3600.0, 0.0])
    general = lag_search.evaluate_lag_grid(
        ds, ref_img, lon, lat, base, l1, l2, [0.0], [0.0], [0.0],
        order=2, compute_dtype="float32", allow_fast=False,
    )
    got = pallas_warp.evaluate_lag_grid_pallas(
        ds, ref_img, lon, lat, base, l1, l2, [0.0], [0.0], [0.0],
        order=2, interpret=True,
    )
    np.testing.assert_allclose(got, general, atol=2e-4)


def test_pallas_gating():
    ds, ref_img, lon, lat, base = build_inputs()
    # residus not supported -> None
    out = pallas_warp.evaluate_lag_grid_pallas(
        ds, ref_img, lon, lat, base, [0.0], [0.0], [0.0], [0.0], [0.0],
        order=2, method="residus", interpret=True)
    assert out is None
    # huge rotation lag -> residual bound exceeded -> None
    out = pallas_warp.evaluate_lag_grid_pallas(
        ds, ref_img, lon, lat, base, [0.0], [0.0], [0.0], [0.0], [45.0],
        order=2, interpret=True)
    assert out is None


def test_alignment_pallas_mode(tmp_path):
    """End-to-end Alignment with lag_search_mode='pallas' (interpret on CPU
    is too slow for 512^2 full API; use direct engine equivalence above —
    here just check the mode wires through and falls back gracefully on a
    tiny image where pallas preconditions fail)."""
    import fixtures as fx2
    from euispice_coreg_tpu.hdrshift.alignment import Alignment

    dl, hl, ds, hs = fx2.make_helioprojective_pair(true_shift_arcsec=(8.0, -4.0))
    p_large, p_small = fx2.write_pair_fits(tmp_path, dl, hl, ds, hs)
    A = Alignment(
        large_fov_known_pointing=p_large, small_fov_to_correct=p_small,
        lag_crval1=np.arange(4.0, 13.0, 2.0), lag_crval2=np.arange(-8.0, 1.0, 2.0),
        small_fov_window=0, large_fov_window=0,
        lag_search_mode="pallas",
    )
    corr = A.align_using_helioprojective(return_type="corr")
    mi = np.unravel_index(np.nanargmax(corr), corr.shape)
    assert A.lag_crval1[mi[0]] == 8.0
