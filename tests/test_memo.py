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


def test_identity_cache_semantics():
    c = memo.IdentityCache(maxsize=2)
    a1, a2 = np.zeros(3), np.zeros(3)  # equal content, distinct identity
    c.put((a1,), "k", "va1")
    assert c.get((a1,), "k") == "va1"
    assert c.get((a2,), "k") is None          # identity, not content
    assert c.get((a1,), "other") is None      # key participates
    c.put((a1, a2), None, "pair")
    assert c.get((a1, a2)) == "pair"
    assert c.get((a2, a1)) is None            # order matters
    c.put((a2,), None, "v3")                  # evicts the oldest (FIFO)
    assert c.get((a1,), "k") is None
    c.clear()
    assert c.get((a1, a2)) is None


def test_sample_image_auto_plan_cache_sound_across_images():
    """A memoized plan is keyed by the COORDINATE map only: the same
    plan_key with a different image must reuse the plan and still produce
    exactly the no-plan result for that image."""
    import jax.numpy as jnp

    from euispice_coreg_tpu.core import resample

    h = w = 96
    rng = np.random.default_rng(5)
    img1 = jnp.asarray(rng.normal(size=(h, w)))
    img2 = jnp.asarray(rng.normal(size=(h, w)))
    # strongly oversampling map (upsample route)
    yy, xx = np.meshgrid(np.linspace(10, 30, h), np.linspace(20, 50, w),
                         indexing="ij")
    x = jnp.asarray(xx)
    y = jnp.asarray(yy)

    m0, hits0 = resample._PLAN_CACHE.misses, resample._PLAN_CACHE.hits
    out1 = resample.sample_image_auto(img1, x, y, order=2,
                                      plan_key=("t", 1))
    out2 = resample.sample_image_auto(img2, x, y, order=2,
                                      plan_key=("t", 1))
    assert resample._PLAN_CACHE.misses == m0 + 1
    assert resample._PLAN_CACHE.hits == hits0 + 1
    ref1 = resample.sample_image_auto(img1, x, y, order=2)
    ref2 = resample.sample_image_auto(img2, x, y, order=2)
    np.testing.assert_array_equal(np.asarray(out1), np.asarray(ref1))
    np.testing.assert_array_equal(np.asarray(out2), np.asarray(ref2))

    # identity-anchored variant: same key, same arrays -> hit; a NEW
    # coordinate array (same content) -> miss, never a stale plan
    r1 = resample.sample_image_auto(img1, x, y, order=2,
                                    plan_ident=(x, y), plan_key="p")
    n_before = len(resample._PLAN_IDENT_CACHE._entries)
    r2 = resample.sample_image_auto(img2, x, y, order=2,
                                    plan_ident=(x, y), plan_key="p")
    assert len(resample._PLAN_IDENT_CACHE._entries) == n_before
    x_new = jnp.asarray(xx)
    r3 = resample.sample_image_auto(img1, x_new, y, order=2,
                                    plan_ident=(x_new, y), plan_key="p")
    assert len(resample._PLAN_IDENT_CACHE._entries) == n_before + 1
    np.testing.assert_array_equal(np.asarray(r1), np.asarray(ref1))
    np.testing.assert_array_equal(np.asarray(r2), np.asarray(ref2))
    np.testing.assert_array_equal(np.asarray(r3), np.asarray(ref1))


def test_seed_probe_values_used_for_device_grids():
    import jax.numpy as jnp

    from euispice_coreg_tpu.engine import lag_search

    h, w = 32, 48
    lon = jnp.asarray(np.linspace(0, 1, h * w).reshape(h, w))
    lat = jnp.asarray(np.linspace(2, 3, h * w).reshape(h, w))
    pl = np.arange(5, dtype=np.float64)
    pb = np.arange(5, dtype=np.float64) + 10
    lag_search.seed_probe_values(lon, lat, pl, pb)
    got_pl, got_pb, px0, py0 = lag_search.probe_values(lon, lat)
    np.testing.assert_array_equal(got_pl, pl)
    np.testing.assert_array_equal(got_pb, pb)
    # numpy grids never touch the cache (callers may mutate them)
    lon_np = np.asarray(lon)
    lat_np = np.asarray(lat)
    lag_search.seed_probe_values(lon_np, lat_np, pl, pb)
    pl2, pb2, _, _ = lag_search.probe_values(lon_np, lat_np)
    assert pl2[0] == lon_np[h // 2, w // 2]


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
