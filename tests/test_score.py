import numpy as np
import pytest

from euispice_coreg_tpu.core import score


def numpy_reference_c_correlate(s_1, s_2, lags):
    """Direct numpy transcription of the reference numba kernel formula
    (c_correlate.py:39-72) for test comparison."""
    n_s = s_1.shape[0]
    c1 = s_1 - s_1.mean()
    c2 = s_2 - s_2.mean()
    out = np.zeros(len(lags))
    for i, lag in enumerate(lags):
        if lag >= 0:
            out[i] = np.sum(c1[: n_s - lag] * c2[lag:])
        else:
            out[i] = np.sum(c1[-lag:] * c2[: n_s + lag])
    return out / np.sqrt((c1 ** 2).sum() * (c2 ** 2).sum())


def test_masked_pearson_matches_reference_formula():
    rng = np.random.default_rng(3)
    a = rng.normal(size=1000)
    b = 0.7 * a + 0.3 * rng.normal(size=1000)
    ours = float(score.masked_pearson(a, b))
    ref = numpy_reference_c_correlate(a, b, [0])[0]
    assert ours == pytest.approx(ref, rel=1e-12)
    assert ours == pytest.approx(np.corrcoef(a, b)[0, 1], rel=1e-12)


def test_masked_pearson_ignores_nans_like_reference():
    """Reference compresses out any index that is non-finite in either input
    before correlating (alignment.py:525-531)."""
    rng = np.random.default_rng(4)
    a = rng.normal(size=500)
    b = 0.5 * a + rng.normal(size=500)
    a[::7] = np.nan
    b[3::11] = np.inf
    mask = np.isfinite(a) & np.isfinite(b)
    ours = float(score.masked_pearson(a, b))
    ref = numpy_reference_c_correlate(a[mask], b[mask], [0])[0]
    assert ours == pytest.approx(ref, rel=1e-12)


def test_masked_pearson_perfect_correlation():
    a = np.linspace(0, 1, 100)
    assert float(score.masked_pearson(a, 2 * a + 1)) == pytest.approx(1.0)
    assert float(score.masked_pearson(a, -a)) == pytest.approx(-1.0)


def test_c_correlate_nonzero_lags():
    rng = np.random.default_rng(5)
    s1 = rng.normal(size=64)
    s2 = np.roll(s1, 3) + 0.01 * rng.normal(size=64)
    lags = [-5, -3, 0, 3, 5]
    ours = np.asarray(score.c_correlate(s1, s2, lags))
    ref = numpy_reference_c_correlate(s1, s2, lags)
    np.testing.assert_allclose(ours, ref, rtol=1e-10)
    assert lags[int(np.argmax(ours))] == 3


def test_residus_matches_reference():
    rng = np.random.default_rng(6)
    a = rng.uniform(1, 10, size=300)
    b = a + rng.normal(size=300)
    ours = float(score.residus(a, b))
    ref = np.std((a - b) / np.sqrt(a))
    assert ours == pytest.approx(ref, rel=1e-12)


def test_residus_masked_ignores_nan():
    a = np.array([4.0, 9.0, np.nan, 16.0])
    b = np.array([2.0, 6.0, 1.0, 20.0])
    ours = float(score.residus_masked(a, b))
    valid = ~np.isnan(a)
    ref = np.std((a[valid] - b[valid]) / np.sqrt(a[valid]))
    assert ours == pytest.approx(ref, rel=1e-12)
