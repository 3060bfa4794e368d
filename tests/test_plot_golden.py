"""Plot image-regression tests against committed golden PNGs.

The reference pins its figures pixel-by-pixel via PIL.ImageChops against
goldens committed next to the tests
(`/root/reference/euispice_coreg/hdrshift/test/test_AlignmentResults.py:14-30`);
round-1 smoke tests only asserted that figures render, so a wrong
colormap/slice/axis-order silently passed.  These tests render the
deterministic fixtures and compare decoded RGB pixels with a small
tolerance (text antialiasing varies across matplotlib point releases).

Regenerate goldens after an INTENTIONAL visual change with:
    EUICOREG_REGEN_GOLDENS=1 python -m pytest tests/test_plot_golden.py
"""
import os

import matplotlib

matplotlib.use("Agg")

import matplotlib.pyplot as plt
import numpy as np
import pytest

import fixtures as fx

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "goldens")
REGEN = os.environ.get("EUICOREG_REGEN_GOLDENS") == "1"

# pixels differing by more than this (0-255) count as "changed"
PIX_TOL = 12
# fraction of changed pixels allowed (antialiasing/text hinting jitter)
FRAC_TOL = 0.02


def read_png(path):
    return (plt.imread(path)[..., :3] * 255).astype(np.int16)


def assert_matches_golden(png_path, name):
    golden = os.path.join(GOLDEN_DIR, name)
    if REGEN or not os.path.exists(golden):
        os.makedirs(GOLDEN_DIR, exist_ok=True)
        import shutil

        shutil.copyfile(png_path, golden)
        if not REGEN:
            pytest.skip(f"golden {name} created; rerun to compare")
        return
    got = read_png(png_path)
    want = read_png(golden)
    assert got.shape == want.shape, (
        f"{name}: figure geometry changed {want.shape} -> {got.shape}")
    diff = np.abs(got - want).max(axis=-1)
    frac = float((diff > PIX_TOL).mean())
    assert frac < FRAC_TOL, (
        f"{name}: {frac * 100:.2f}% of pixels changed by more than "
        f"{PIX_TOL}/255 (max diff {diff.max()})")


@pytest.fixture(scope="module")
def aligned(tmp_path_factory):
    from euispice_coreg_tpu.hdrshift.alignment import Alignment

    td = tmp_path_factory.mktemp("golden_pair")
    dl, hl, ds, hs = fx.make_helioprojective_pair(true_shift_arcsec=(8.0, -4.0))
    p_large, p_small = fx.write_pair_fits(td, dl, hl, ds, hs)
    A = Alignment(
        large_fov_known_pointing=p_large, small_fov_to_correct=p_small,
        lag_crval1=np.arange(2.0, 15.0, 2.0),
        lag_crval2=np.arange(-10.0, 3.0, 2.0),
        small_fov_window=0, large_fov_window=0,
    )
    res = A.align_using_helioprojective()
    return p_large, p_small, res


def test_plot_correlation_golden(aligned, tmp_path):
    _, _, res = aligned
    out = str(tmp_path / "corr.png")
    res.plot_correlation(path_save_figure=out)
    assert_matches_golden(out, "plot_correlation.png")


@pytest.mark.parametrize("mode", ["compare_plot", "successive_plot"])
def test_plot_co_alignment_golden(aligned, tmp_path, mode):
    from euispice_coreg_tpu.plot import plot

    p_large, p_small, res = aligned
    out = str(tmp_path / f"coalign_{mode}.png")
    plot.plot_co_alignment(
        p_large, 0, p_small, 0, shift_arcsec=res.shift_arcsec,
        path_save_figure=out, type_plot=mode)
    assert_matches_golden(out, f"coalign_{mode}.png")


def test_plot_co_alignment_sunpy_golden(tmp_path):
    from euispice_coreg_tpu.plot import plot

    dl, hl, ds, hs = fx.make_carrington_pair(true_shift_arcsec=(20.0, -10.0))
    p_large, p_small = fx.write_pair_fits(tmp_path, dl, hl, ds, hs)
    out = str(tmp_path / "coalign_sunpy.png")
    plot.plot_co_alignment(
        p_large, 0, p_small, 0, shift_arcsec=(20.0, -10.0, 0.0, 0.0, 0.0),
        path_save_figure=out, type_plot="sunpy")
    # multi-page mode: each page saved with a _k suffix
    for k in range(3):
        assert_matches_golden(str(tmp_path / f"coalign_sunpy_{k}.png"),
                              f"coalign_sunpy_{k}.png")


def test_plot_fov_golden(tmp_path):
    from euispice_coreg_tpu.plot import plot

    hdr = fx.make_header((64, 64), (10.0, 10.0))
    data = fx.render_helioprojective(hdr)
    out = str(tmp_path / "fov.png")
    plot.plot_fov(data, path_save=out)
    assert_matches_golden(out, "plot_fov.png")


def test_golden_detects_colormap_change(aligned, tmp_path):
    """Sanity: a deliberately wrong rendering FAILS the comparison (the
    regression has teeth)."""
    golden = os.path.join(GOLDEN_DIR, "plot_correlation.png")
    if not os.path.exists(golden):
        pytest.skip("golden not generated yet")
    _, _, res = aligned
    out = str(tmp_path / "corr_bad.png")
    res.plot_correlation(path_save_figure=out)
    img = read_png(out)
    bad = 255 - img  # inverted colors stand in for a colormap regression
    want = read_png(golden)
    if bad.shape != want.shape:
        return  # geometry change would also be caught
    diff = np.abs(bad - want).max(axis=-1)
    assert (diff > PIX_TOL).mean() >= FRAC_TOL
