"""ops/precise_fft: matmul-DFT agrees with the reference FFT (pocketfft on
the CPU test backend) to float32 accuracy, including the half-spectrum
round trip used by the fast correlation path."""
import jax.numpy as jnp
import numpy as np
import pytest

from euispice_coreg_tpu.ops import precise_fft


@pytest.mark.parametrize("m", [256, 96, 30])
def test_rfft2_matches_numpy(m):
    rng = np.random.default_rng(0)
    x = rng.normal(size=(m - 7, m - 3)).astype(np.float32) + 5.0
    got = np.asarray(precise_fft.rfft2(jnp.asarray(x), m))
    want = np.fft.rfft2(x.astype(np.float64), s=(m, m))
    scale = np.max(np.abs(want))
    assert np.max(np.abs(got - want)) / scale < 5e-6


@pytest.mark.parametrize("my,mx", [(96, 256), (256, 96), (128, 128)])
def test_rfft2_rect_matches_numpy(my, mx):
    rng = np.random.default_rng(3)
    x = rng.normal(size=(3, my - 5, mx - 9)).astype(np.float32) + 2.0
    got = np.asarray(precise_fft.rfft2_rect(jnp.asarray(x), my, mx))
    want = np.fft.rfft2(x.astype(np.float64), s=(my, mx))
    scale = np.max(np.abs(want))
    assert got.shape == (3, my, mx // 2 + 1)
    assert np.max(np.abs(got - want)) / scale < 5e-6


@pytest.mark.parametrize("m", [256, 96])
def test_irfft2_roundtrip(m):
    rng = np.random.default_rng(1)
    x = rng.normal(size=(2, m, m)).astype(np.float32)
    X = precise_fft.rfft2(jnp.asarray(x), m)
    back = np.asarray(precise_fft.irfft2(X, m))
    assert np.max(np.abs(back - x)) < 5e-6 * np.max(np.abs(x)) * m


def test_correlation_surface_small_values():
    """The motivating case: a cross-correlation of a centered field against a
    mask has values ~1e-4 of the field energy; the precise path must resolve
    them (the XLA TPU FFT does not — engine/fast_corr.py)."""
    rng = np.random.default_rng(2)
    m = 96
    a = rng.normal(size=(64, 64)).astype(np.float32)
    a -= a.mean()
    mask = np.ones((64, 64), dtype=np.float32)
    A = np.asarray(precise_fft.rfft2(jnp.asarray(a), m))
    M = np.asarray(precise_fft.rfft2(jnp.asarray(mask), m))
    surf = np.asarray(precise_fft.irfft2(jnp.asarray(np.conj(A) * M), m))
    want = np.fft.irfft2(
        np.conj(np.fft.rfft2(a.astype(np.float64), s=(m, m)))
        * np.fft.rfft2(mask.astype(np.float64), s=(m, m)),
        s=(m, m),
    )
    # absolute error must stay tiny relative to the FIELD energy, not the
    # (small) surface values themselves
    energy = np.linalg.norm(a) * np.linalg.norm(mask)
    assert np.max(np.abs(surf - want)) / energy < 1e-6
