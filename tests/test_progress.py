"""Console progress bar: unit behavior + public-API wiring (VERDICT r1 #9)."""
import sys

import numpy as np

import fixtures as fx
from euispice_coreg_tpu.utils import obs


def test_progress_bar_renders_in_scope(capsys):
    with obs.console_progress_bar(True):
        p = obs.Progress(total=4, label="demo")
        for _ in range(4):
            p.step()
    err = capsys.readouterr().err
    assert "|" in err and "demo" in err and "4/4" in err


def test_progress_bar_silent_outside_scope(capsys):
    p = obs.Progress(total=2, label="quiet")
    p.step()
    p.step()
    assert "|" not in capsys.readouterr().err


def test_progress_callback_fires():
    calls = []
    p = obs.Progress(total=3, label="cb", cb=lambda d, t, l: calls.append(d))
    for _ in range(3):
        p.step()
    assert calls == [1, 2, 3]


def test_alignment_displays_progress_bar(tmp_path, monkeypatch, capsys):
    from euispice_coreg_tpu.engine import lag_search
    from euispice_coreg_tpu.hdrshift.alignment import Alignment

    # shrink the chunk so the 11x11 test grid spans several chunks
    monkeypatch.setattr(lag_search, "CHUNK_SELECT", 32)
    monkeypatch.setattr(lag_search, "CHUNK_GATHER", 32)

    dl, hl, ds, hs = fx.make_helioprojective_pair(true_shift_arcsec=(8.0, -4.0))
    p_large, p_small = fx.write_pair_fits(tmp_path, dl, hl, ds, hs)
    A = Alignment(
        large_fov_known_pointing=p_large, small_fov_to_correct=p_small,
        lag_crval1=np.arange(-2, 19, 2.0), lag_crval2=np.arange(-14, 7, 2.0),
        lag_cdelt1=None, lag_cdelt2=None, lag_crota=None,
        small_fov_window=0, large_fov_window=0,
        display_progress_bar=True,
        lag_search_mode="exact",  # forces the chunked engine (bar-visible)
        use_device_mesh=False,    # the sharded path has no chunk loop
    )
    corr = A.align_using_helioprojective(return_type="corr")
    err = capsys.readouterr().err
    assert "|#" in err and "lag search" in err
    mi = np.unravel_index(np.nanargmax(corr), corr.shape)
    assert A.lag_crval1[mi[0]] == 8.0

def test_collect_stages_accumulates_and_restores():
    """stage()/timed() add wall-clocks to the active collect_stages scope,
    keyed by label and summed across repeats; outside a scope they are
    no-ops on the registry (stages_active() False)."""
    assert not obs.stages_active()
    with obs.collect_stages() as st:
        assert obs.stages_active()
        with obs.stage("a"):
            pass
        with obs.stage("a"):
            pass
        with obs.timed("b"):
            pass
    assert not obs.stages_active()
    assert set(st) == {"a", "b"}
    assert st["a"] >= 0.0 and st["b"] >= 0.0
    # outside any scope: no registry, no error
    with obs.stage("c"):
        pass
    assert "c" not in st


def test_collect_stages_nested_scopes_shadow():
    """Inner scopes capture exclusively; the outer scope resumes after."""
    with obs.collect_stages() as outer:
        with obs.stage("x"):
            pass
        with obs.collect_stages() as inner:
            with obs.stage("y"):
                pass
        with obs.stage("z"):
            pass
    assert set(inner) == {"y"}
    assert set(outer) == {"x", "z"}


def test_collect_stages_restores_on_exception():
    try:
        with obs.collect_stages():
            raise RuntimeError("boom")
    except RuntimeError:
        pass
    assert not obs.stages_active()
