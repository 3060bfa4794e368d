"""Alignment(path_save_figure=...) saves in-alignment diagnostic figures.

The reference saves the reprojected large/small FOV and compare figures
during ``align_using_*`` when ``path_save_figure`` is set
(``/root/reference/euispice_coreg/hdrshift/alignment.py:988-1012`` for the
projected searches, 903-927 for the Carrington fa branch, 955-972 for the
sunpy branch).  Regression: the kwarg used to be stored but never consumed.
"""
import glob
import os

import matplotlib

matplotlib.use("Agg")

import numpy as np
import pytest

import fixtures as fx
from euispice_coreg_tpu.hdrshift import Alignment


def _small_lag_alignment(tmp_path, figdir, **fx_kwargs):
    dl, hl, ds, hs = fx.make_helioprojective_pair(
        true_shift_arcsec=(8.0, -4.0), **fx_kwargs)
    p_large, p_small = fx.write_pair_fits(tmp_path, dl, hl, ds, hs)
    return Alignment(
        large_fov_known_pointing=p_large,
        small_fov_to_correct=p_small,
        lag_crval1=np.array([4.0, 8.0, 12.0]),
        lag_crval2=np.array([-4.0]),
        small_fov_window=0, large_fov_window=0,
        path_save_figure=str(figdir),
    )


def test_helioprojective_saves_figures(tmp_path):
    figdir = tmp_path / "figs"
    A = _small_lag_alignment(tmp_path, figdir)
    A.align_using_helioprojective(return_type="corr")
    assert os.path.getsize(str(figdir / "large_fov_before_cut.pdf")) > 1000
    for stem in ("large_fov_2022*", "small_fov_2022*", "compare_plot_2022*"):
        hits = glob.glob(str(figdir / (stem + ".pdf")))
        assert len(hits) == 1, f"missing figure {stem}"
        assert os.path.getsize(hits[0]) > 1000


def test_carrington_fa_saves_figures(tmp_path):
    figdir = tmp_path / "figs_carr"
    dl, hl, ds, hs = fx.make_carrington_pair(true_shift_arcsec=(20.0, -10.0))
    p_large, p_small = fx.write_pair_fits(tmp_path, dl, hl, ds, hs)
    A = Alignment(
        large_fov_known_pointing=p_large,
        small_fov_to_correct=p_small,
        lag_crval1=np.array([15.0, 20.0, 25.0]),
        lag_crval2=np.array([-10.0]),
        small_fov_window=0, large_fov_window=0,
        path_save_figure=str(figdir),
    )
    A.align_using_carrington(
        lonlims=(115.0, 125.0), latlims=(-2.0, 8.0), shape=(128, 128),
        return_type="corr")
    for stem in ("image_large_2022*", "image_small_2022*"):
        hits = glob.glob(str(figdir / (stem + ".pdf")))
        assert len(hits) == 1, f"missing figure {stem}"
        assert os.path.getsize(hits[0]) > 1000


def test_sunpy_branch_saves_figures(tmp_path):
    figdir = tmp_path / "figs_ss"
    dl, hl, ds, hs = fx.make_carrington_pair(true_shift_arcsec=(20.0, -10.0))
    p_large, p_small = fx.write_pair_fits(tmp_path, dl, hl, ds, hs)
    A = Alignment(
        large_fov_known_pointing=p_large,
        small_fov_to_correct=p_small,
        lag_crval1=np.array([15.0, 20.0, 25.0]),
        lag_crval2=np.array([-10.0]),
        small_fov_window=0, large_fov_window=0,
        path_save_figure=str(figdir),
    )
    A.align_using_carrington(method_carrington_reprojection="sunpy",
                             return_type="corr")
    for stem in ("image_small_2022*", "image_large_2022*",
                 "image_large_rep_2022*"):
        hits = glob.glob(str(figdir / (stem + ".pdf")))
        assert len(hits) >= 1, f"missing figure {stem}"
        assert os.path.getsize(hits[0]) > 1000


def test_no_figures_without_kwarg(tmp_path):
    """Default path_save_figure=None must not write anything."""
    A = _small_lag_alignment(tmp_path, tmp_path / "unused")
    A.path_save_figure = None
    A.align_using_helioprojective(return_type="corr")
    assert not os.path.exists(str(tmp_path / "unused"))
