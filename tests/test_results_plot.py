"""AlignmentResults (Gaussian fit, persistence) and plotting smoke tests."""
import matplotlib

matplotlib.use("Agg")

import numpy as np
import pytest

import fixtures as fx
from euispice_coreg_tpu.hdrshift.results import AlignmentResults, twoD_Gaussian


def synthetic_corr(x0=5.3, y0=2.6, nx=11, ny=6):
    """Gaussian correlation bump with sub-pixel peak, like the reference's
    hardcoded hypercube test (test_AlignmentResults.py:33-126)."""
    x, y = np.meshgrid(np.arange(nx), np.arange(ny), indexing="ij")
    corr = 0.3 + 0.6 * np.exp(-(((x - x0) ** 2) / 4.0 + ((y - y0) ** 2) / 3.0))
    return corr.reshape(nx, ny, 1, 1, 1, 1)


def make_results(x0=5.3, y0=2.6):
    corr = synthetic_corr(x0=x0, y0=y0)
    return AlignmentResults(
        corr=corr,
        lag_crval1=np.arange(15, 26, 1.0),
        lag_crval2=np.arange(5, 11, 1.0),
        lag_cdelt1=[0.0],
        lag_cdelt2=[0.0],
        lag_crota=[0.75],
        unit_lag="arcsec",
    )


def test_gaussian_subpixel_fit():
    res = make_results(x0=5.3, y0=2.6)
    # lag axes start at 15 / 5 with unit steps: peak -> 15+5.3, 5+2.6
    assert res.shift_arcsec[0] == pytest.approx(20.3, abs=0.02)
    assert res.shift_arcsec[1] == pytest.approx(7.6, abs=0.02)
    assert res.shift_arcsec[4] == 0.75
    assert res.max_index[0] == 5
    assert res.max_index[1] == 3


def test_argmax_fallback_small_grid():
    corr = np.zeros((1, 1, 1, 1, 1, 1))
    corr[0, 0, 0, 0, 0, 0] = 0.9
    with pytest.warns(UserWarning, match="not enough points"):
        res = AlignmentResults(
            corr=corr, lag_crval1=[24.0], lag_crval2=[6.0],
            lag_cdelt1=[0.0], lag_cdelt2=[0.0], lag_crota=[0.0],
            unit_lag="arcsec",
        )
    assert res.shift_arcsec[0] == 24.0
    assert res.shift_arcsec[1] == 6.0


def test_unit_conversion_deg():
    corr = synthetic_corr()
    res = AlignmentResults(
        corr=corr,
        lag_crval1=np.arange(15, 26, 1.0) / 3600.0,
        lag_crval2=np.arange(5, 11, 1.0) / 3600.0,
        lag_cdelt1=[0.0], lag_cdelt2=[0.0], lag_crota=[0.0],
        unit_lag="deg",
    )
    assert res.shift_arcsec[0] == pytest.approx(20.3, abs=0.05)


def test_twoD_gaussian_shape():
    xy = (np.array([0.0, 1.0]), np.array([0.0, 1.0]))
    out = twoD_Gaussian(xy, 1.0, 0.0, 0.0, 1.0, 1.0, 0.5)
    assert out.shape == (2,)
    assert out[0] == pytest.approx(1.5)


def test_save_load_roundtrip(tmp_path):
    res = make_results()
    p = str(tmp_path / "result.npz")
    res.save(p)
    back = AlignmentResults.load(p)
    np.testing.assert_array_equal(back.corr, res.corr)
    assert back.shift_arcsec == pytest.approx(res.shift_arcsec)
    assert back.unit_lag == "arcsec"


def test_plot_correlation_smoke(tmp_path):
    res = make_results()
    out = str(tmp_path / "corr.png")
    res.plot_correlation(path_save_figure=out)
    import os

    assert os.path.getsize(out) > 1000


@pytest.mark.slow
def test_plot_co_alignment_smoke(tmp_path):
    from euispice_coreg_tpu.hdrshift.alignment import Alignment

    dl, hl, ds, hs = fx.make_helioprojective_pair()
    p_large, p_small = fx.write_pair_fits(tmp_path, dl, hl, ds, hs)
    A = Alignment(
        large_fov_known_pointing=p_large, small_fov_to_correct=p_small,
        lag_crval1=np.arange(4.0, 13.0, 2.0), lag_crval2=np.arange(-8.0, 1.0, 2.0),
        small_fov_window=0, large_fov_window=0,
    )
    res = A.align_using_helioprojective()
    out = str(tmp_path / "coalign.png")
    res.plot_co_alignment(path_save_figure=out)
    import os

    assert os.path.getsize(out) > 1000


def test_plot_co_alignment_sunpy_mode_smoke(tmp_path):
    """type_plot='sunpy' backed by the native solar-surface reprojection
    (needs observer keywords -> Carrington pair fixture)."""
    from euispice_coreg_tpu.plot import plot

    dl, hl, ds, hs = fx.make_carrington_pair(true_shift_arcsec=(20.0, -10.0))
    p_large, p_small = fx.write_pair_fits(tmp_path, dl, hl, ds, hs)
    out = str(tmp_path / "coalign_ss.pdf")
    figs = plot.plot_co_alignment(
        p_large, 0, p_small, 0, shift_arcsec=(20.0, -10.0, 0.0, 0.0, 0.0),
        path_save_figure=out, type_plot="sunpy")
    import os

    assert len(figs) == 3
    assert os.path.getsize(out) > 1000


def test_plot_fov_and_simple_plot_smoke(tmp_path):
    from euispice_coreg_tpu.plot import plot

    hdr = fx.make_header((64, 64), (10.0, 10.0))
    data = fx.render_helioprojective(hdr)
    out1 = str(tmp_path / "fov.png")
    plot.plot_fov(data, path_save=out1)
    out2 = str(tmp_path / "simple.png")
    plot.simple_plot(hdr, data, path_save=out2)
    import os

    assert os.path.getsize(out1) > 1000
    assert os.path.getsize(out2) > 1000


def test_iterative_context_raster(tmp_path):
    """Smoke + correctness: iterative raster rebuild per lag recovers the
    injected shift on a small grid."""
    from euispice_coreg_tpu.hdrshift.alignment_spice import (
        AlignementSpiceIterativeContextRaster,
    )
    from euispice_coreg_tpu.io import fits
    from euispice_coreg_tpu.utils import timeutils

    paths = []
    t0 = timeutils.parse_fits_time("2022-03-17T09:45:00")
    for k in range(2):
        hdr = fx.make_header((196, 196), (12.0, 12.0), (0.0, 0.0), 0.0)
        hdr["DATE-AVG"] = timeutils.format_fits_time(t0 + 150.0 * k)
        data = fx.render_helioprojective(hdr)
        p = str(tmp_path / f"it_imager_{k}.fits")
        fits.write(p, [fits.PrimaryHDU(data=data.astype(np.float32), header=hdr)])
        paths.append(p)

    hdr_true = fx.make_spice_l2_header(crval_arcsec=(120.0, 80.0))
    cube = fx.render_spice_l2_cube(hdr_true)
    hdr_given = fx.make_spice_l2_header(crval_arcsec=(116.0, 80.0))
    p_spice = str(tmp_path / "solo_L2_it_spice.fits")
    fits.write(p_spice, [fits.PrimaryHDU(data=cube.astype(np.float32),
                                         header=hdr_given)])

    A = AlignementSpiceIterativeContextRaster(
        large_fov_list_paths=paths,
        small_fov_to_correct=p_spice,
        threshold_time=600.0,
        lag_crval1=np.array([0.0, 4.0, 8.0]),
        lag_crval2=np.array([0.0]),
        large_fov_window=0,
        small_fov_window=0,
    )
    corr = A.align_using_helioprojective(return_type="corr")
    mi = np.unravel_index(np.nanargmax(corr), corr.shape)
    assert A.lag_crval1[mi[0]] == pytest.approx(4.0)


def test_simple_plot_sunpy_maplike(tmp_path):
    """Native simple_plot_sunpy accepts (data, header) pairs, HDUs and
    .data/.meta map-likes (reference plot.py:228-257 takes a sunpy Map)."""
    import os

    from euispice_coreg_tpu.plot import plot

    hdr = fx.make_header((48, 48), (10.0, 10.0))
    data = fx.render_helioprojective(hdr)

    out1 = str(tmp_path / "sp1.png")
    plot.simple_plot_sunpy((data, hdr), path_save=out1)
    assert os.path.getsize(out1) > 1000

    class MapLike:
        pass

    m = MapLike()
    m.data = data
    m.meta = {k: hdr[k] for k in hdr}
    out2 = str(tmp_path / "sp2.png")
    plot.PlotFunctions.simple_plot_sunpy(m, path_save=out2, cmap="viridis")
    assert os.path.getsize(out2) > 1000
