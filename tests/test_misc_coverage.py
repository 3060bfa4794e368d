"""Coverage for small public-surface pieces no other module exercises:
MpUtils.gen_shmm, transforms.rotationmatrix/gridpattern, and the two
remaining PlotFits-parity figures (contour_plot, plot_fov_rectangle)."""
import matplotlib

matplotlib.use("Agg")

import numpy as np
import pytest

import fixtures as fx


def test_gen_shmm_create_attach_roundtrip():
    """Create from an ndarray, attach by name, see the same bytes
    (MpUtils.gen_shmm parity, Util.py:948-967)."""
    from euispice_coreg_tpu.utils.util_compat import MpUtils

    src = np.arange(24, dtype=np.float32).reshape(4, 6)
    shmm, view = MpUtils.gen_shmm(create=True, ndarray=src)
    try:
        view[:] = src
        shmm2, view2 = MpUtils.gen_shmm(name=shmm.name, shape=src.shape,
                                        dtype=src.dtype)
        np.testing.assert_array_equal(view2, src)
        view2[0, 0] = -1.0  # writes are shared
        assert view[0, 0] == -1.0
        shmm2.close()
    finally:
        shmm.close()
        shmm.unlink()


def test_gen_shmm_argument_validation():
    from euispice_coreg_tpu.utils.util_compat import MpUtils

    with pytest.raises(ValueError):
        MpUtils.gen_shmm()
    with pytest.raises(ValueError):
        MpUtils.gen_shmm(name="x")  # no shape


def test_rotationmatrix_properties():
    """Same axis conventions as the reference (rectify.py:85-107)."""
    from euispice_coreg_tpu.core.transforms import rotationmatrix

    th = 0.3
    for axis in (0, 1, 2):
        R = rotationmatrix(th, axis)
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-12)
        np.testing.assert_allclose(np.linalg.det(R), 1.0, atol=1e-12)
        # inverse = opposite angle
        np.testing.assert_allclose(R @ rotationmatrix(-th, axis), np.eye(3),
                                   atol=1e-12)
    # axis 0 rotates in the x/y plane and leaves z fixed
    R0 = rotationmatrix(np.pi / 2, 0)
    np.testing.assert_allclose(R0 @ np.array([0.0, 0.0, 1.0]),
                               [0.0, 0.0, 1.0], atol=1e-12)
    with pytest.raises(ValueError):
        rotationmatrix(0.1, 3)


def test_gridpattern_shape_and_lines():
    from euispice_coreg_tpu.core.transforms import gridpattern

    g = gridpattern(nx=64, ny=48, s=16, t=3)
    assert g.shape == (64, 48)
    assert set(np.unique(g)) <= {0.0, 1.0}
    # first t rows/cols of every s-period are lines
    assert g[0, :].all() and g[1, :].all() and g[2, :].all()
    # row 3 is between line bundles: zero until the next column bundle at 16
    assert g[16, :].all() and not g[3, 3:16].any()
    assert g[:, 0].all() and g[:, 16].all()


def test_contour_plot_and_fov_rectangle(tmp_path):
    from euispice_coreg_tpu.plot.plot import contour_plot, plot_fov_rectangle

    hdr = fx.make_header((64, 64), (8.0, 8.0), (0.0, 0.0), 0.0)
    data = fx.render_helioprojective(hdr)
    hdr2 = fx.make_header((64, 64), (8.0, 8.0), (4.0, -4.0), 0.0)
    data2 = fx.render_helioprojective(hdr2)

    p1 = str(tmp_path / "contour.png")
    contour_plot(hdr, data, hdr2, data2, path_save=p1)
    assert (tmp_path / "contour.png").stat().st_size > 0

    p2 = str(tmp_path / "rect.png")
    plot_fov_rectangle(data, slc=(slice(10, 40), slice(20, 50)),
                       path_save=p2)
    assert (tmp_path / "rect.png").stat().st_size > 0
