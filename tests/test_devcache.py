"""Device-array cache: key identity, staleness, LRU bounds.

A stale hit here would silently correlate against an OLD image after the
user overwrites a FITS file in place — the key must change whenever the
file does (realpath, mtime_ns, size, window)."""
import os
import time

import numpy as np
import pytest

from euispice_coreg_tpu.utils import devcache


@pytest.fixture(autouse=True)
def clean_cache():
    devcache.clear()
    yield
    devcache.clear()


def test_file_key_identity_and_staleness(tmp_path):
    p = tmp_path / "img.fits"
    p.write_bytes(b"A" * 100)
    k1 = devcache.file_key(p, window=0)
    assert k1 is not None
    assert devcache.file_key(p, window=0) == k1
    assert devcache.file_key(p, window=1) != k1

    # same size, later mtime -> different key (in-place overwrite)
    time.sleep(0.01)
    p.write_bytes(b"B" * 100)
    assert devcache.file_key(p, window=0) != k1

    # different size -> different key
    p.write_bytes(b"C" * 101)
    k3 = devcache.file_key(p, window=0)
    assert k3 != k1 and k3 is not None


def test_file_key_unidentifiable_sources(tmp_path):
    assert devcache.file_key("https://example.org/x.fits", 0) is None
    assert devcache.file_key("http://example.org/x.fits", 0) is None
    assert devcache.file_key(str(tmp_path / "missing.fits"), 0) is None
    assert devcache.file_key(object(), 0) is None  # not a path


def test_asarray_cached_hit_and_none_key():
    import jax.numpy as jnp

    a = np.arange(6.0).reshape(2, 3)
    d1 = devcache.asarray_cached(a, jnp.float32, ("k", 1))
    d2 = devcache.asarray_cached(a, jnp.float32, ("k", 1))
    assert d1 is d2  # cache hit returns the SAME device array
    d3 = devcache.asarray_cached(a, jnp.float64, ("k", 1))
    assert d3 is not d1  # dtype participates in the key
    assert devcache.asarray_cached(a, jnp.float32, None) is not d1  # no cache
    np.testing.assert_array_equal(np.asarray(d1), a)


def test_lru_eviction_bound():
    import jax.numpy as jnp

    first = devcache.asarray_cached(np.zeros(2), jnp.float32, ("e", 0))
    for i in range(1, devcache.MAX_ENTRIES + 1):
        devcache.asarray_cached(np.zeros(2) + i, jnp.float32, ("e", i))
    # capacity exceeded by one: the oldest entry was evicted
    again = devcache.asarray_cached(np.zeros(2), jnp.float32, ("e", 0))
    assert again is not first
    assert len(devcache._cache) <= devcache.MAX_ENTRIES


def test_clear_empties_cache():
    import jax.numpy as jnp

    d1 = devcache.asarray_cached(np.ones(3), jnp.float32, ("c", 0))
    devcache.clear()
    d2 = devcache.asarray_cached(np.ones(3), jnp.float32, ("c", 0))
    assert d2 is not d1
