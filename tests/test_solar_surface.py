"""Native solar-surface reprojection (the reference's sunpy branch,
alignment.py:939-985, rebuilt without sunpy) and the
``method_carrington_reprojection="sunpy"`` alignment mode."""
import numpy as np
import pytest

import fixtures as fx
from euispice_coreg_tpu.engine import carrington as carr
from euispice_coreg_tpu.hdrshift.alignment import Alignment


def hdr_at(crln_obs, date_obs, crval=(0.0, 0.0), naxis=(128, 128),
           cdelt=(10.0, 10.0), crota=0.0):
    extra = dict(fx.CARR_EXTRA)
    extra["CRLN_OBS"] = crln_obs
    hdr = fx.make_header(naxis, cdelt, crval, crota, extra=extra)
    hdr["DATE-OBS"] = date_obs
    return hdr


def test_reproject_identity_same_header():
    """dt = 0, identical WCS: order-1 sampling at integer coords is exact."""
    hdr = hdr_at(120.0, "2022-03-17T09:50:45")
    view = fx.render_carrington_view(hdr, 1.0)
    out = carr.reproject_solar_surface(view, hdr, hdr, d_solar_r=1.0, order=1)
    # FOV-edge pixels can fall a float-epsilon outside [0, n-1] after the
    # unproject/project round trip (-> cval NaN); check the interior
    c = np.s_[1:-1, 1:-1]
    assert np.isfinite(out[c]).all()
    np.testing.assert_allclose(out[c], view[c], rtol=1e-5)


def test_reproject_tracks_observer_motion_rigid():
    """A scene fixed in the Carrington frame, viewed 4 days apart from a
    moved observer: 'rigid' propagation must map view1 onto view2."""
    h1 = hdr_at(120.0, "2022-03-17T09:50:45")
    h2 = hdr_at(126.0, "2022-03-21T09:50:45", crval=(30.0, -20.0), crota=2.0)
    v1 = fx.render_carrington_view(h1, 1.0)
    v2 = fx.render_carrington_view(h2, 1.0)
    out = carr.reproject_solar_surface(v1, h1, h2, d_solar_r=1.0, order=2,
                                       rot_model="rigid")
    c = np.s_[30:98, 30:98]  # central crop, away from FOV edges
    assert np.isfinite(out[c]).all()
    np.testing.assert_allclose(out[c], v2[c], atol=0.03)


def test_reproject_howard_differential_drift():
    """Features drifting at the Howard rate between the two times are
    recovered exactly by rot_model='howard' (and NOT by 'rigid')."""
    from euispice_coreg_tpu.utils import coords

    h1 = hdr_at(120.0, "2022-03-17T09:50:45")
    h2 = hdr_at(124.0, "2022-03-23T09:50:45", crval=(-25.0, 40.0))
    dt_days = 6.0
    v1 = fx.render_carrington_view(h1, 1.0)

    # render the t2 view of the drifted scene: a feature at (lon, lat) at t1
    # sits at lon + drift(lat)*dt at t2
    sc2 = carr.header_spherical_scalars(h2, 1.0)
    px, py = coords.pixel_grid(int(h2["NAXIS1"]), int(h2["NAXIS2"]))
    lon2, lat2 = carr.spherical_unproject(px, py, sc2)
    drift = carr.surface_rotation_drift_deg(lat2, dt_days, "howard")
    v2 = np.where(np.isfinite(lon2),
                  fx.scene_carrington(lon2 - drift, lat2), np.nan)

    out = carr.reproject_solar_surface(v1, h1, h2, d_solar_r=1.0, order=2,
                                       rot_model="howard")
    c = np.s_[30:98, 30:98]
    # 0.05 covers the order-2 (prefilter=False) smoothing bias on the
    # steepest blobs; a 1-px geometric error would show up at ~1.0
    np.testing.assert_allclose(out[c], v2[c], atol=0.05)

    # at 40 deg latitude over 6 days the differential drift is ~1.4 deg;
    # rigid propagation must visibly miss
    rigid = carr.reproject_solar_surface(v1, h1, h2, d_solar_r=1.0, order=2,
                                         rot_model="rigid")
    assert np.nanmax(np.abs(rigid[c] - v2[c])) > 0.3


@pytest.mark.slow
def test_align_sunpy_mode_recovers_shift(tmp_path):
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
        method_carrington_reprojection="sunpy", return_type="corr")
    assert corr.shape == (9, 9, 1, 1, 1, 1)
    mi = np.unravel_index(np.nanargmax(corr), corr.shape)
    assert A.lag_crval1[mi[0]] == pytest.approx(20.0)
    assert A.lag_crval2[mi[1]] == pytest.approx(-10.0)
    # no lonlims/latlims/shape/reference_date required (reference docstring)


def test_align_sunpy_mode_results_object(tmp_path):
    dl, hl, ds, hs = fx.make_carrington_pair(true_shift_arcsec=(20.0, -10.0))
    p_large, p_small = fx.write_pair_fits(tmp_path, dl, hl, ds, hs)
    A = Alignment(
        large_fov_known_pointing=p_large,
        small_fov_to_correct=p_small,
        lag_crval1=np.arange(10.0, 31.0, 5.0),
        lag_crval2=np.arange(-20.0, 1.0, 5.0),
        small_fov_window=0, large_fov_window=0,
    )
    res = A.align_using_carrington(method_carrington_reprojection="sunpy")
    assert abs(res.shift_arcsec[0] - 20.0) < 2.5
    assert abs(res.shift_arcsec[1] + 10.0) < 2.5


def test_bad_reprojection_method_raises(tmp_path):
    dl, hl, ds, hs = fx.make_carrington_pair()
    p_large, p_small = fx.write_pair_fits(tmp_path, dl, hl, ds, hs)
    A = Alignment(large_fov_known_pointing=p_large,
                  small_fov_to_correct=p_small,
                  lag_crval1=[0.0], lag_crval2=[0.0],
                  small_fov_window=0, large_fov_window=0)
    with pytest.raises(ValueError, match="either 'fa' or 'sunpy'"):
        A.align_using_carrington(lonlims=(115.0, 125.0), latlims=(-2.0, 8.0),
                                 shape=(64, 64),
                                 method_carrington_reprojection="nope")
