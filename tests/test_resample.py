import numpy as np
import pytest
from scipy.ndimage import map_coordinates

from euispice_coreg_tpu.core import resample


def scipy_ref(image, x, y, order, cval=np.nan):
    dst = np.empty(x.shape, dtype=image.dtype)
    coords = np.stack((y.ravel(), x.ravel()), axis=0)
    map_coordinates(image, coords, order=order, mode="constant",
                    cval=cval, output=dst.ravel(), prefilter=False)
    return dst


@pytest.fixture
def image():
    rng = np.random.default_rng(42)
    return rng.normal(size=(37, 45)).astype(np.float64) * 100.0


@pytest.mark.parametrize("order", [0, 1, 2, 3])
def test_matches_scipy_interior(image, order):
    rng = np.random.default_rng(0)
    h, w = image.shape
    x = rng.uniform(2.0, w - 3.0, size=(50, 60))
    y = rng.uniform(2.0, h - 3.0, size=(50, 60))
    ours = np.asarray(resample.sample_image(image, x, y, order=order, cval=np.nan))
    ref = scipy_ref(image, x, y, order)
    np.testing.assert_allclose(ours, ref, rtol=1e-10, atol=1e-10)


@pytest.mark.parametrize("order", [0, 1, 2, 3])
def test_matches_scipy_with_edges_and_outside(image, order):
    rng = np.random.default_rng(1)
    h, w = image.shape
    # include far-outside, near-edge, and exact-integer coordinates
    x = np.concatenate([
        rng.uniform(-5.0, w + 5.0, size=500),
        np.arange(w, dtype=np.float64),
        np.array([-1.0, -0.5, -1e-9, 0.0, w - 1.0, w - 0.5, float(w)]),
    ])
    y = np.concatenate([
        rng.uniform(-5.0, h + 5.0, size=500),
        np.linspace(0, h - 1, w),
        np.array([0.0, 0.0, 0.0, 0.0, h - 1.0, h - 1.0, h - 1.0]),
    ])
    ours = np.asarray(resample.sample_image(image, x, y, order=order, cval=np.nan))
    ref = scipy_ref(image, x, y, order)
    np.testing.assert_allclose(ours, ref, rtol=1e-10, atol=1e-10, equal_nan=True)


@pytest.mark.parametrize("order", [1, 2])
def test_constant_fill_value(image, order):
    x = np.array([-3.0, 100.0])
    y = np.array([5.0, 5.0])
    ours = np.asarray(resample.sample_image(image, x, y, order=order, cval=-32762.0))
    ref = scipy_ref(image, x, y, order, cval=-32762.0)
    np.testing.assert_allclose(ours, ref, rtol=1e-12)


def test_nan_coordinates_give_cval(image):
    x = np.array([np.nan, 5.0])
    y = np.array([5.0, np.nan])
    out = np.asarray(resample.sample_image(image, x, y, order=2, cval=np.nan))
    assert np.isnan(out).all()


def test_nan_pixels_propagate(image):
    img = image.copy()
    img[10, 10] = np.nan
    out = np.asarray(resample.sample_image(img, np.array([10.2]), np.array([10.2]), order=1))
    assert np.isnan(out[0])


def test_interpol2d_argument_order(image):
    # interpol2d takes (x, y); sample at a known pixel center
    out = np.asarray(resample.interpol2d(image, x=np.array([7.0]), y=np.array([3.0]), order=1))
    assert out[0] == pytest.approx(image[3, 7])


def test_float32_path(image):
    img32 = image.astype(np.float32)
    x = np.linspace(1, 40, 100, dtype=np.float32)
    y = np.linspace(1, 30, 100, dtype=np.float32)
    ours = np.asarray(resample.sample_image(img32, x, y, order=2))
    ref = scipy_ref(image, x.astype(np.float64), y.astype(np.float64), 2)
    np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=2e-3)


# ---------------------------------------------------------------------------
# gather-free select sampler
# ---------------------------------------------------------------------------

def select_sample(image, x, y, order, m=4, pad=None):
    import jax.numpy as jnp

    h, w = image.shape
    jj, ii = np.meshgrid(np.arange(x.shape[1]), np.arange(x.shape[0]))
    dx = np.where(np.isfinite(x), x - jj, 0.0)
    dy = np.where(np.isfinite(y), y - ii, 0.0)
    sx = int(np.round(np.median(dx)))
    sy = int(np.round(np.median(dy)))
    if pad is None:
        pad = max(abs(sx), abs(sy)) + m + 2
    pad = min(pad, min(h, w) - 1)
    padded = jnp.pad(jnp.asarray(image), pad, mode="reflect")
    return np.asarray(resample.sample_image_select(
        padded, x, y, order, sx, sy, residual_bound=m, pad=pad, h=h, w=w))


@pytest.mark.parametrize("order", [0, 1, 2])
def test_select_sampler_matches_gather_translation(image, order):
    h, w = image.shape
    x, y = np.meshgrid(np.arange(w, dtype=np.float64), np.arange(h, dtype=np.float64))
    x = x + 3.4
    y = y - 2.7
    ref = np.asarray(resample.sample_image(image, x, y, order=order))
    got = select_sample(image, x, y, order)
    np.testing.assert_allclose(got, ref, rtol=1e-12, atol=1e-12, equal_nan=True)


@pytest.mark.parametrize("order", [1, 2])
def test_select_sampler_matches_gather_rotation(image, order):
    """Small rotation + shift: residual field within the bound."""
    h, w = image.shape
    jj, ii = np.meshgrid(np.arange(w, dtype=np.float64), np.arange(h, dtype=np.float64))
    th = np.deg2rad(1.5)
    cx, cy = w / 2, h / 2
    x = cx + (jj - cx) * np.cos(th) - (ii - cy) * np.sin(th) + 5.2
    y = cy + (jj - cx) * np.sin(th) + (ii - cy) * np.cos(th) - 4.1
    ref = np.asarray(resample.sample_image(image, x, y, order=order))
    got = select_sample(image, x, y, order, m=4)
    np.testing.assert_allclose(got, ref, rtol=1e-12, atol=1e-12, equal_nan=True)


def test_select_sampler_nan_and_oob(image):
    h, w = image.shape
    x, y = np.meshgrid(np.arange(w, dtype=np.float64), np.arange(h, dtype=np.float64))
    x = x + 30.0  # pushes right part out of range
    x[3, 3] = np.nan
    ref = np.asarray(resample.sample_image(image, x, y, order=2))
    got = select_sample(image, x, y, order=2)
    np.testing.assert_allclose(got, ref, rtol=1e-12, atol=1e-12, equal_nan=True)


def test_select_sampler_nan_pixels(image):
    img = image.copy()
    img[12, 17] = np.nan
    h, w = img.shape
    x, y = np.meshgrid(np.arange(w, dtype=np.float64), np.arange(h, dtype=np.float64))
    x = x + 0.3
    y = y + 0.6
    ref = np.asarray(resample.sample_image(img, x, y, order=2))
    got = select_sample(img, x, y, order=2)
    np.testing.assert_allclose(got, ref, rtol=1e-12, atol=1e-12, equal_nan=True)


def test_select_sampler_residual_exceeded_marks_invalid(image):
    h, w = image.shape
    x, y = np.meshgrid(np.arange(w, dtype=np.float64), np.arange(h, dtype=np.float64))
    x[5, 5] += 30.0  # single outlier beyond the residual bound
    got = select_sample(image, x, y, order=2, m=2)
    assert np.isnan(got[5, 5])
    ref = np.asarray(resample.sample_image(image, x, y, order=2))
    mask = np.ones_like(got, dtype=bool)
    mask[5, 5] = False
    np.testing.assert_allclose(got[mask], ref[mask], rtol=1e-12, equal_nan=True)
