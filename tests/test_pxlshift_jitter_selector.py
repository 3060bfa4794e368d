"""pxlshift, jitter correction, selector, and selector-driven SPICE tests."""
import os

import numpy as np
import pytest

import fixtures as fx
from euispice_coreg_tpu.io import fits
from euispice_coreg_tpu.pxlshift import AlignmentPixels
from euispice_coreg_tpu.selector import Selector, SelectorEui, SelectorSpice
from euispice_coreg_tpu.utils import timeutils


# ---------------------------------------------------------------------------
# pxlshift
# ---------------------------------------------------------------------------

def make_pxl_pair(tmp_path, dx_px=3, dy_px=-2):
    """Large/small pair with a known integer-pixel offset at equal plate
    scale (ratio 1) for exact recovery."""
    hdr_large = fx.make_header((160, 160), (10.0, 10.0), (0.0, 0.0), 0.0)
    data_large = fx.render_helioprojective(hdr_large)

    # small = central crop of large, shifted by (dy, dx)
    h, w = 64, 64
    l0 = int((160 - h - 1) / 2)
    l1 = int((160 - w - 1) / 2)
    small = data_large[l0 + dy_px : l0 + dy_px + h, l1 + dx_px : l1 + dx_px + w]
    hdr_small = fx.make_header((w, h), (10.0, 10.0), (0.0, 0.0), 0.0)

    p_large = str(tmp_path / "pxl_large.fits")
    p_small = str(tmp_path / "pxl_small.fits")
    fits.write(p_large, [fits.PrimaryHDU(data=data_large.astype(np.float64),
                                         header=hdr_large)])
    fits.write(p_small, [fits.PrimaryHDU(data=small.astype(np.float64),
                                         header=hdr_small)])
    return p_large, p_small


def test_pxlshift_recovers_integer_shift(tmp_path):
    p_large, p_small = make_pxl_pair(tmp_path, dx_px=3, dy_px=-2)
    A = AlignmentPixels(p_large, 0, p_small, 0)
    lag_dx = np.arange(-6, 7)
    lag_dy = np.arange(-6, 7)
    corr = A.find_best_parameters(lag_dx, lag_dy, lag_drot=[0.0])
    assert corr.shape == (13, 13, 1)
    mi = np.unravel_index(np.nanargmax(corr), corr.shape)
    assert lag_dx[mi[0]] == 3
    assert lag_dy[mi[1]] == -2
    # exact match at the true offset: r == 1
    assert corr[mi] == pytest.approx(1.0, abs=1e-6)


def test_pxlshift_rotation_axis(tmp_path):
    p_large, p_small = make_pxl_pair(tmp_path, dx_px=0, dy_px=0)
    A = AlignmentPixels(p_large, 0, p_small, 0)
    corr = A.find_best_parameters(np.arange(-2, 3), np.arange(-2, 3),
                                  lag_drot=[-2.0, 0.0, 2.0])
    mi = np.unravel_index(np.nanargmax(corr), corr.shape)
    assert mi[2] == 1  # zero rotation wins


def test_pxlshift_rotation_fleet_mesh(tmp_path):
    """mesh= shards the rotation axis: one fleet call, same hypercube as
    the per-rotation loop (3 rotations pad to the 8-device CPU mesh)."""
    import jax
    from jax.sharding import Mesh

    p_large, p_small = make_pxl_pair(tmp_path, dx_px=3, dy_px=-2)
    A = AlignmentPixels(p_large, 0, p_small, 0)
    lag_dx, lag_dy = np.arange(-4, 5), np.arange(-4, 5)
    drots = [-2.0, 0.0, 2.0]
    loop = A.find_best_parameters(lag_dx, lag_dy, lag_drot=drots)

    B = AlignmentPixels(p_large, 0, p_small, 0)
    mesh = Mesh(np.array(jax.devices()[:8]), axis_names=("lags",))
    fleet = B.find_best_parameters(lag_dx, lag_dy, lag_drot=drots, mesh=mesh)
    assert fleet.shape == loop.shape == (9, 9, 3)
    # same _surfaces_at numerics per rotation, just batched/sharded — but a
    # different FFT pad size m, so exact sums agree to FP roundoff only
    np.testing.assert_allclose(fleet, loop, atol=1e-9)
    assert np.unravel_index(np.nanargmax(fleet), fleet.shape) == \
        np.unravel_index(np.nanargmax(loop), loop.shape)


def test_pxlshift_out_of_bounds_raises(tmp_path):
    p_large, p_small = make_pxl_pair(tmp_path)
    A = AlignmentPixels(p_large, 0, p_small, 0)
    with pytest.raises(ValueError, match="outside FSI"):
        A.find_best_parameters(np.array([1000]), np.array([0]), [0.0])


def test_pxlshift_matches_reference_formula(tmp_path):
    """Spot-check one offset against the direct sliding-window Pearson."""
    p_large, p_small = make_pxl_pair(tmp_path, dx_px=3, dy_px=-2)
    A = AlignmentPixels(p_large, 0, p_small, 0)
    corr = A.find_best_parameters(np.array([1]), np.array([2]), [0.0])
    slc = A.slc_small_ref
    window = A.data_large[slc[0].start + 2 : slc[0].stop + 2,
                          slc[1].start + 1 : slc[1].stop + 1]
    small = A.data_small
    mask = np.isfinite(window) & np.isfinite(small)
    a, b = window[mask], small[mask]
    ca, cb = a - a.mean(), b - b.mean()
    expected = np.sum(ca * cb) / np.sqrt(np.sum(ca**2) * np.sum(cb**2))
    assert corr[0, 0, 0] == pytest.approx(expected, rel=1e-6)


# ---------------------------------------------------------------------------
# jitter correction
# ---------------------------------------------------------------------------

@pytest.mark.slow
def test_jitter_correction_helioprojective(tmp_path):
    from euispice_coreg_tpu.jitter_correction import jitter_correction_imagers

    # movie of 4 frames, frames 1..3 jittered by known offsets
    offsets = [(0.0, 0.0), (4.0, -2.0), (-2.0, 4.0), (2.0, 2.0)]
    paths = []
    t0 = timeutils.parse_fits_time("2022-03-17T09:00:00")
    for k, (ox, oy) in enumerate(offsets):
        hdr_true = fx.make_header((128, 128), (8.0, 8.0), (0.0, 0.0), 0.0)
        hdr_true["DATE-AVG"] = timeutils.format_fits_time(t0 + 60 * k)
        data = fx.render_helioprojective(hdr_true)
        hdr_wrong = hdr_true.copy()
        hdr_wrong["CRVAL1"] = hdr_true["CRVAL1"] - ox
        hdr_wrong["CRVAL2"] = hdr_true["CRVAL2"] - oy
        p = str(tmp_path / f"movie_{k}.fits")
        fits.write(p, [fits.PrimaryHDU(data=data.astype(np.float32),
                                       header=hdr_wrong)])
        paths.append(p)

    outdir = tmp_path / "corrected"
    os.makedirs(outdir)
    results = jitter_correction_imagers(
        list_files_input=paths,
        path_files_output=str(outdir),
        lag_crval1=np.arange(-6.0, 7.0, 1.0),
        lag_crval2=np.arange(-6.0, 7.0, 1.0),
        lag_cdelt1=None, lag_cdelt2=None, lag_crota=None,
        sublist_length=10, overlap=1,
        window_files_input=0,
        alignement_method="helioprojective",
    )
    # anchor copied verbatim, others corrected
    assert os.path.isfile(outdir / "movie_0.fits")
    for k, (ox, oy) in enumerate(offsets[1:], start=1):
        hdul = fits.open(str(outdir / f"movie_{k}.fits"))
        orig = fits.open(paths[k])
        d1 = hdul[0].header["CRVAL1"] - orig[0].header["CRVAL1"]
        d2 = hdul[0].header["CRVAL2"] - orig[0].header["CRVAL2"]
        assert d1 == pytest.approx(ox, abs=0.5)
        assert d2 == pytest.approx(oy, abs=0.5)


# ---------------------------------------------------------------------------
# selector
# ---------------------------------------------------------------------------

class StubSelector(Selector):
    """Selector over canned per-day index pages (no network)."""

    def __init__(self, pages):
        super().__init__(release_url_basis="https://example.org/release/L2")
        self.pages = pages

    def _fetch_index(self, url):
        return self.pages.get(url, "<html></html>")


DAY1 = "https://example.org/release/L2/2022/03/17"
DAY2 = "https://example.org/release/L2/2022/03/18"

PAGES = {
    DAY1: """
    <html><body>
    <a href="solo_L2_eui-fsi174-image_20220317T095045281_V01.fits">f1</a>
    <a href="solo_L2_eui-fsi174-image_20220317T105045281_V01.fits">f2</a>
    <a href="solo_L2_eui-hrieuv174-image_20220317T095045277_V01.fits">h1</a>
    <a href="readme.txt">x</a>
    </body></html>""",
    DAY2: """
    <html><body>
    <a href="solo_L2_eui-fsi174-image_20220318T095045281_V01.fits">f3</a>
    </body></html>""",
}


def test_selector_time_interval():
    sel = StubSelector(PAGES)
    urls, times = sel.get_url_from_time_interval(
        "2022-03-17T09:00:00", "2022-03-18T12:00:00")
    assert len(urls) == 4
    assert all(u.startswith("https://example.org/release/L2/2022/03/1") for u in urls)
    # strictly inside the interval
    t1 = timeutils.parse_fits_time("2022-03-17T09:00:00")
    assert np.all(times >= t1)


def test_selector_filename_filter():
    sel = StubSelector(PAGES)
    urls, _ = sel.get_url_from_time_interval(
        "2022-03-17T09:00:00", "2022-03-18T12:00:00", file_name_str="fsi174")
    assert len(urls) == 3
    urls, _ = sel.get_url_from_time_interval(
        "2022-03-17T09:00:00", "2022-03-17T10:00:00", file_name_str="fsi174")
    assert len(urls) == 1


def test_selector_eui_url_construction():
    sel = SelectorEui(release=5.0, level=2)
    assert sel.release_url_basis == (
        "https://www.sidc.be/EUI/data/releases/202204_release_5.0/L2")
    sel2 = SelectorSpice(release=4.0, level=2)
    assert "release-4.0/level2" in sel2.release_url_basis


def test_selector_time_parsing():
    t = Selector._find_time_from_file(
        "solo_L2_eui-fsi174-image_20220317T095045281_V01.fits")
    assert t == timeutils.parse_fits_time("2022-03-17T09:50:45")


# ---------------------------------------------------------------------------
# selector-driven SPICE alignment (offline, stub selector over local files)
# ---------------------------------------------------------------------------

def test_alignment_spice_selector(tmp_path):
    from euispice_coreg_tpu.hdrshift.alignment_spice_selector import (
        AlignmentSpiceSelector,
    )

    # local imager series acting as the "archive"
    paths = []
    t0 = timeutils.parse_fits_time("2022-03-17T09:45:00")
    for k in range(3):
        hdr = fx.make_header((196, 196), (12.0, 12.0), (0.0, 0.0), 0.0)
        hdr["DATE-AVG"] = timeutils.format_fits_time(t0 + 120.0 * k)
        data = fx.render_helioprojective(hdr)
        p = str(tmp_path / f"solo_L2_eui-fsi304-image_20220317T0{945 + 2 * k}00000_V01.fits")
        fits.write(p, [fits.PrimaryHDU(data=data.astype(np.float32), header=hdr)])
        paths.append(p)

    class LocalSelector:
        def get_url_from_time_interval(self, t1, t2, file_name_str=None):
            return np.asarray(paths), np.asarray([t0, t0 + 120, t0 + 240])

    hdr_spice = fx.make_spice_l2_header(crval_arcsec=(112.0, 84.0))
    cube = fx.render_spice_l2_cube(fx.make_spice_l2_header(crval_arcsec=(120.0, 80.0)))
    p_spice = str(tmp_path / "solo_L2_spice.fits")
    fits.write(p_spice, [fits.PrimaryHDU(data=cube.astype(np.float32),
                                         header=hdr_spice)])

    A = AlignmentSpiceSelector(
        small_fov_to_correct=p_spice,
        lag_crval1=np.arange(0.0, 17.0, 2.0),
        lag_crval2=np.arange(-12.0, 5.0, 2.0),
        small_fov_window=0,
        threshold_time=600.0,
        folder_path_synras=str(tmp_path),
        selector=LocalSelector(),
    )
    corr = A.align_using_helioprojective(return_type="corr")
    mi = np.unravel_index(np.nanargmax(corr), corr.shape)
    assert A.lag_crval1[mi[0]] == pytest.approx(8.0)
    assert A.lag_crval2[mi[1]] == pytest.approx(-4.0)


@pytest.mark.slow
def test_align_movie_to_reference(tmp_path):
    from euispice_coreg_tpu.jitter_correction.jitter_correction import (
        align_movie_to_reference,
    )

    hdr_ref = fx.make_header((128, 128), (8.0, 8.0), (0.0, 0.0), 0.0)
    data_ref = fx.render_helioprojective(hdr_ref)
    p_ref = str(tmp_path / "movie_ref.fits")
    fits.write(p_ref, [fits.PrimaryHDU(data=data_ref.astype(np.float32),
                                       header=hdr_ref)])

    offsets = [(2.0, -4.0), (-4.0, 2.0), (4.0, 4.0)]
    paths = []
    for k, (ox, oy) in enumerate(offsets):
        hdr = hdr_ref.copy()
        hdr["CRVAL1"] = hdr_ref["CRVAL1"] - ox
        hdr["CRVAL2"] = hdr_ref["CRVAL2"] - oy
        p = str(tmp_path / f"mf_{k}.fits")
        fits.write(p, [fits.PrimaryHDU(data=data_ref.astype(np.float32),
                                       header=hdr)])
        paths.append(p)

    outdir = tmp_path / "movie_out"
    os.makedirs(outdir)
    results = align_movie_to_reference(
        paths, p_ref, path_files_output=str(outdir),
        lag_crval1=np.arange(-6.0, 7.0, 2.0),
        lag_crval2=np.arange(-6.0, 7.0, 2.0),
        window_files_input=0, reference_window=0,
    )
    assert len(results) == 3
    for k, (ox, oy) in enumerate(offsets):
        assert results[k].shift_arcsec[0] == pytest.approx(ox, abs=1.0)
        assert results[k].shift_arcsec[1] == pytest.approx(oy, abs=1.0)
        assert os.path.isfile(outdir / f"mf_{k}.fits")


@pytest.mark.slow
def test_align_movie_to_reference_fleet(tmp_path):
    """mesh= fleet path: one sharded engine call, same results as the
    per-frame loop (frame axis over the 8-device CPU mesh; F=5 pads)."""
    import jax
    from jax.sharding import Mesh

    from euispice_coreg_tpu.jitter_correction.jitter_correction import (
        align_movie_to_reference,
    )

    hdr_ref = fx.make_header((96, 96), (8.0, 8.0), (0.0, 0.0), 0.0)
    data_ref = fx.render_helioprojective(hdr_ref)
    p_ref = str(tmp_path / "fleet_ref.fits")
    fits.write(p_ref, [fits.PrimaryHDU(data=data_ref.astype(np.float32),
                                       header=hdr_ref)])

    offsets = [(2.0, -4.0), (-4.0, 2.0), (4.0, 4.0), (0.0, 0.0), (-2.0, -2.0)]
    paths = []
    for k, (ox, oy) in enumerate(offsets):
        hdr = hdr_ref.copy()
        hdr["CRVAL1"] = hdr_ref["CRVAL1"] - ox
        hdr["CRVAL2"] = hdr_ref["CRVAL2"] - oy
        data = data_ref.copy()
        if k == 2:
            data[40:50, 10:20] = np.nan  # masked blob in one frame
        p = str(tmp_path / f"fleet_{k}.fits")
        fits.write(p, [fits.PrimaryHDU(data=data.astype(np.float32),
                                       header=hdr)])
        paths.append(p)

    lags = np.arange(-6.0, 7.0, 2.0)
    serial = align_movie_to_reference(
        paths, p_ref, lag_crval1=lags, lag_crval2=lags,
        window_files_input=0, reference_window=0)

    outdir = tmp_path / "fleet_out"
    os.makedirs(outdir)
    mesh = Mesh(np.array(jax.devices()[:8]), axis_names=("lags",))
    fleet = align_movie_to_reference(
        paths, p_ref, lag_crval1=lags, lag_crval2=lags,
        window_files_input=0, reference_window=0,
        path_files_output=str(outdir), mesh=mesh)

    assert len(fleet) == len(offsets)
    for k, (ox, oy) in enumerate(offsets):
        assert fleet[k].shift_arcsec[0] == pytest.approx(ox, abs=1.0)
        assert fleet[k].shift_arcsec[1] == pytest.approx(oy, abs=1.0)
        assert np.nanargmax(fleet[k].corr) == np.nanargmax(serial[k].corr)
        np.testing.assert_allclose(
            np.asarray(fleet[k].corr, dtype=np.float64),
            np.asarray(serial[k].corr, dtype=np.float64), atol=2e-4)
        assert os.path.isfile(outdir / f"fleet_{k}.fits")


def test_align_movie_resume(tmp_path):
    """align_movie_to_reference(resume=True) skips frames whose corrected
    output exists; returned dict keeps ORIGINAL frame indices."""
    from euispice_coreg_tpu.jitter_correction.jitter_correction import (
        align_movie_to_reference,
    )

    hdr_ref = fx.make_header((64, 64), (8.0, 8.0), (0.0, 0.0), 0.0)
    data_ref = fx.render_helioprojective(hdr_ref)
    p_ref = str(tmp_path / "mr_ref.fits")
    fits.write(p_ref, [fits.PrimaryHDU(data=data_ref.astype(np.float32),
                                       header=hdr_ref)])
    paths = []
    for k, ox in enumerate([2.0, -2.0]):
        hdr = hdr_ref.copy()
        hdr["CRVAL1"] = hdr_ref["CRVAL1"] - ox
        p = str(tmp_path / f"mr_{k}.fits")
        fits.write(p, [fits.PrimaryHDU(data=data_ref.astype(np.float32),
                                       header=hdr)])
        paths.append(p)

    outdir = tmp_path / "mr_out"
    os.makedirs(outdir)
    kwargs = dict(lag_crval1=np.arange(-4.0, 5.0, 2.0),
                  lag_crval2=np.arange(-4.0, 5.0, 2.0),
                  window_files_input=0, reference_window=0,
                  path_files_output=str(outdir))
    first = align_movie_to_reference(paths, p_ref, **kwargs)
    assert sorted(first) == [0, 1]
    os.remove(outdir / "mr_0.fits")
    second = align_movie_to_reference(paths, p_ref, resume=True, **kwargs)
    assert sorted(second) == [0]  # frame 1 skipped; original index kept
    assert os.path.isfile(outdir / "mr_0.fits")


def test_jitter_correction_resume(tmp_path):
    """resume=True re-aligns only frames whose corrected output is missing."""
    from euispice_coreg_tpu.jitter_correction import jitter_correction_imagers

    offsets = [(0.0, 0.0), (4.0, -2.0), (-2.0, 4.0)]
    paths = []
    t0 = timeutils.parse_fits_time("2022-03-17T09:00:00")
    for k, (ox, oy) in enumerate(offsets):
        hdr_true = fx.make_header((96, 96), (8.0, 8.0), (0.0, 0.0), 0.0)
        hdr_true["DATE-AVG"] = timeutils.format_fits_time(t0 + 60 * k)
        data = fx.render_helioprojective(hdr_true)
        hdr_wrong = hdr_true.copy()
        hdr_wrong["CRVAL1"] = hdr_true["CRVAL1"] - ox
        hdr_wrong["CRVAL2"] = hdr_true["CRVAL2"] - oy
        p = str(tmp_path / f"jr_{k}.fits")
        fits.write(p, [fits.PrimaryHDU(data=data.astype(np.float32),
                                       header=hdr_wrong)])
        paths.append(p)

    outdir = tmp_path / "resume_out"
    os.makedirs(outdir)
    kwargs = dict(
        list_files_input=paths, path_files_output=str(outdir),
        lag_crval1=np.arange(-6.0, 7.0, 2.0),
        lag_crval2=np.arange(-6.0, 7.0, 2.0),
        lag_cdelt1=None, lag_cdelt2=None, lag_crota=None,
        sublist_length=10, overlap=1, window_files_input=0,
        alignement_method="helioprojective",
    )
    first = jitter_correction_imagers(**kwargs)
    assert sorted(first) == [1, 2]

    os.remove(outdir / "jr_2.fits")
    second = jitter_correction_imagers(resume=True, **kwargs)
    assert sorted(second) == [2]  # frame 1 skipped, frame 2 re-aligned
    assert os.path.isfile(outdir / "jr_2.fits")
    assert second[2].shift_arcsec[0] == pytest.approx(-2.0, abs=1.0)
    assert second[2].shift_arcsec[1] == pytest.approx(4.0, abs=1.0)

    # overlap > 1: overlap frames are aligned by TWO sublists and an
    # existing output cannot reveal which pass wrote it — resume must
    # always re-align them (here sublists [0,1,2] / [1,2]: frame 2 is
    # doubly aligned, so it re-runs even where its output exists)
    outdir2 = tmp_path / "resume_overlap"
    os.makedirs(outdir2)
    kwargs2 = dict(kwargs, path_files_output=str(outdir2),
                   sublist_length=1, overlap=2)
    first2 = jitter_correction_imagers(**kwargs2)
    assert sorted(first2) == [1, 2]
    os.remove(outdir2 / "jr_2.fits")
    second2 = jitter_correction_imagers(resume=True, **kwargs2)
    assert 2 in second2
    assert os.path.isfile(outdir2 / "jr_2.fits")


@pytest.mark.slow
def test_jitter_correction_fleet_mesh(tmp_path):
    """jitter_correction_imagers(mesh=): each sublist runs as one fleet
    search; corrected headers match the serial pipeline's."""
    import jax
    from jax.sharding import Mesh

    from euispice_coreg_tpu.jitter_correction import jitter_correction_imagers

    offsets = [(0.0, 0.0), (4.0, -2.0), (-2.0, 4.0), (2.0, 2.0), (0.0, 4.0)]
    paths = []
    t0 = timeutils.parse_fits_time("2022-03-17T09:00:00")
    for k, (ox, oy) in enumerate(offsets):
        hdr_true = fx.make_header((96, 96), (8.0, 8.0), (0.0, 0.0), 0.0)
        hdr_true["DATE-AVG"] = timeutils.format_fits_time(t0 + 60 * k)
        data = fx.render_helioprojective(hdr_true)
        hdr_wrong = hdr_true.copy()
        hdr_wrong["CRVAL1"] = hdr_true["CRVAL1"] - ox
        hdr_wrong["CRVAL2"] = hdr_true["CRVAL2"] - oy
        p = str(tmp_path / f"jf_{k}.fits")
        fits.write(p, [fits.PrimaryHDU(data=data.astype(np.float32),
                                       header=hdr_wrong)])
        paths.append(p)

    # sublist_length=2, overlap=1 -> the second sublist's reference is a
    # corrected frame written by the first (sequential dependency kept)
    kwargs = dict(
        list_files_input=paths,
        lag_crval1=np.arange(-6.0, 7.0, 1.0),
        lag_crval2=np.arange(-6.0, 7.0, 1.0),
        lag_cdelt1=None, lag_cdelt2=None, lag_crota=None,
        sublist_length=2, overlap=1,
        window_files_input=0,
        alignement_method="helioprojective",
    )
    out_serial = tmp_path / "corr_serial"
    os.makedirs(out_serial)
    serial = jitter_correction_imagers(path_files_output=str(out_serial),
                                       **kwargs)

    out_fleet = tmp_path / "corr_fleet"
    os.makedirs(out_fleet)
    mesh = Mesh(np.array(jax.devices()[:8]), axis_names=("lags",))
    fleet = jitter_correction_imagers(
        path_files_output=str(out_fleet), mesh=mesh, **kwargs)

    assert os.path.isfile(out_fleet / "jf_0.fits")
    assert sorted(fleet) == [1, 2, 3, 4]
    # Engine parity is pinned on the correlation surfaces (~1e-7 between
    # the serial and fleet paths here).  The reference-spec Gaussian
    # sub-pixel fit (no baseline term, sigma bounds to 1000) is
    # ill-conditioned on this fixture's near-flat Pearson peak — a 1e-8
    # surface perturbation can move the fitted center ~0.05 px — so the
    # FIT is asserted against the injected truth, not serial-vs-fleet.
    for k, (ox, oy) in enumerate(offsets):
        if k == 0:
            continue
        assert np.nanargmax(np.asarray(fleet[k].corr)) == \
            np.nanargmax(np.asarray(serial[k].corr))
        np.testing.assert_allclose(
            np.asarray(fleet[k].corr, dtype=np.float64),
            np.asarray(serial[k].corr, dtype=np.float64), atol=1e-5)
        assert fleet[k].shift_arcsec[0] == pytest.approx(ox, abs=1.0)
        assert fleet[k].shift_arcsec[1] == pytest.approx(oy, abs=1.0)
        assert os.path.isfile(out_fleet / f"jf_{k}.fits")


def test_align_movie_fleet_falls_back_on_exact_mode(tmp_path):
    """lag_search_mode='exact' must bypass the fleet fast path."""
    import jax
    from jax.sharding import Mesh

    from euispice_coreg_tpu.jitter_correction.jitter_correction import (
        align_movie_to_reference,
    )

    hdr_ref = fx.make_header((96, 96), (8.0, 8.0), (0.0, 0.0), 0.0)
    data_ref = fx.render_helioprojective(hdr_ref)
    p_ref = str(tmp_path / "fb_ref.fits")
    fits.write(p_ref, [fits.PrimaryHDU(data=data_ref.astype(np.float32),
                                       header=hdr_ref)])
    hdr = hdr_ref.copy()
    hdr["CRVAL1"] = hdr_ref["CRVAL1"] - 2.0
    p = str(tmp_path / "fb_0.fits")
    fits.write(p, [fits.PrimaryHDU(data=data_ref.astype(np.float32),
                                   header=hdr)])

    mesh = Mesh(np.array(jax.devices()[:8]), axis_names=("lags",))
    res = align_movie_to_reference(
        [p], p_ref, lag_crval1=np.arange(-4.0, 5.0, 2.0),
        lag_crval2=np.arange(-4.0, 5.0, 2.0),
        window_files_input=0, reference_window=0,
        mesh=mesh, lag_search_mode="exact")
    assert res[0].shift_arcsec[0] == pytest.approx(2.0, abs=1.0)
