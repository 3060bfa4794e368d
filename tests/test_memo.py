"""Host-prep memoization (utils/memo.py): content-keyed digests, FIFO
bounds, cached-result immutability, and the engine integration (warm
tile-FFT calls must reuse the gate/bounds prep — VERDICT r04 weak #7)."""
import numpy as np
import pytest

from euispice_coreg_tpu.utils import memo


def test_digest_content_keyed():
    a = np.arange(12.0).reshape(3, 4)
    b = np.arange(12.0).reshape(3, 4)  # equal content, distinct object
    assert memo.digest(a) == memo.digest(b)
    b[0, 0] = 99.0
    assert memo.digest(a) != memo.digest(b)
    # shape and dtype are part of the key, not just the bytes
    assert memo.digest(a) != memo.digest(a.reshape(4, 3))
    assert memo.digest(a) != memo.digest(a.astype(np.float32))
    # scalars, strings, dicts, nesting
    assert memo.digest({"y": 1, "x": 2.0}) == memo.digest({"x": 2.0, "y": 1})
    assert memo.digest((1, 2), 3) != memo.digest((1, 2, 3))


def test_fifo_cache_bounds_and_freeze():
    c = memo.FIFOCache(maxsize=2)
    v = c.put("k1", np.zeros(3))
    with pytest.raises((ValueError, RuntimeError)):
        v[0] = 1.0  # cached arrays are read-only
    c.put("k2", (np.ones(2), 7))
    c.put("k3", "x")  # evicts k1 (FIFO)
    assert c.get("k1") is None
    assert c.get("k2")[1] == 7
    assert c.hits == 1 and c.misses == 1
    c.clear()
    assert c.get("k2") is None


def test_tile_fft_warm_call_hits_bounds_cache():
    from euispice_coreg_tpu.engine import tile_fft

    h = w = 256
    yy, xx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    ref = 100 + np.sin(xx / 9.0) * np.cos(yy / 13.0) * 10
    warped = np.roll(ref, (1, -2), axis=(0, 1))
    L = 3
    coeffs = np.zeros((L, 6, 2))
    coeffs[:, 2, 0] = np.linspace(-2.0, 2.0, L)

    kw = dict(order=2, h=h, w=w, method="correlation",
              compute_dtype="float64", tile_size=128)
    h0, m0 = tile_fft._BOUNDS_CACHE.hits, tile_fft._BOUNDS_CACHE.misses
    v1 = tile_fft.evaluate_select_tile_fft(coeffs, warped, ref, **kw)
    v2 = tile_fft.evaluate_select_tile_fft(coeffs, warped, ref, **kw)
    assert tile_fft._BOUNDS_CACHE.misses == m0 + 1
    assert tile_fft._BOUNDS_CACHE.hits == h0 + 1
    np.testing.assert_array_equal(v1, v2)
