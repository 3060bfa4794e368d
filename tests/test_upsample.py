"""sample_image_upsample parity with the gather sampler.

The tile-contraction sampler must reproduce sample_image exactly-to-f32 on
smooth upsampling maps, including the quirky semantics: mirror tap
extension at the image edge, NaN infection by ANY of the stencil taps
(even zero-weight ones), and cval for NaN/out-of-range coordinates.
"""
import numpy as np
import pytest

import jax.numpy as jnp

from euispice_coreg_tpu.core import resample


def make_map(h_src, w_src, H, W, rot_deg=0.4, seed=0):
    """Smooth upsampling map covering most of the source, slight rotation +
    quadratic distortion (like a WCS warp)."""
    rng = np.random.default_rng(seed)
    yy, xx = np.meshgrid(np.arange(H, dtype=np.float64),
                         np.arange(W, dtype=np.float64), indexing="ij")
    sx = (w_src - 4.0) / W
    sy = (h_src - 4.0) / H
    th = np.deg2rad(rot_deg)
    u = 1.5 + sx * (np.cos(th) * xx - np.sin(th) * yy)
    v = 1.5 + sy * (np.sin(th) * xx + np.cos(th) * yy)
    u = u + 1e-6 * (xx - W / 2) ** 2 / W + rng.normal() * 0.1
    v = v + 1e-6 * (yy - H / 2) ** 2 / H
    return u, v


def src_image(h, w, seed=1, with_nans=True):
    rng = np.random.default_rng(seed)
    img = rng.normal(size=(h, w)).astype(np.float32) * 3 + 50
    if with_nans:
        img[5:7, 10:13] = np.nan
        img[0, 0] = np.nan
    return img


@pytest.mark.parametrize("order", [0, 1, 2, 3])
def test_upsample_matches_gather(order):
    img = src_image(40, 52)
    u, v = make_map(40, 52, 300, 280)
    want = np.asarray(resample.sample_image(img, u, v, order=order))
    got = resample.sample_image_upsample(img, u, v, order=order, tile=128)
    assert got is not None
    got = np.asarray(got)
    assert np.array_equal(np.isnan(got), np.isnan(want))
    np.testing.assert_allclose(got, want, rtol=2e-6, atol=2e-5)


def test_upsample_edge_coords_and_mirror():
    """Coordinates pinned to the exact image border exercise the mirrored
    taps (tap -1 -> 1, tap n -> n-2)."""
    img = src_image(16, 16, with_nans=False)
    H = W = 96
    u = np.linspace(0.0, 15.0, W)[None, :].repeat(H, axis=0)
    v = np.linspace(0.0, 15.0, H)[:, None].repeat(W, axis=1)
    want = np.asarray(resample.sample_image(img, u, v, order=2))
    got = resample.sample_image_upsample(img, u, v, order=2, tile=32)
    assert got is not None
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-6, atol=2e-5)


def test_upsample_invalid_and_all_nan_tiles():
    """Out-of-range and NaN coordinates give cval; tiles whose coords are
    all invalid must not poison neighbours."""
    img = src_image(30, 30, with_nans=False)
    u, v = make_map(30, 30, 128, 128)
    u[:40, :40] = np.nan                      # all-invalid tile region
    v[50:60, 50:55] = -7.0                    # out of range
    u[0, -1] = 40.0                           # beyond w-1
    want = np.asarray(resample.sample_image(img, u, v, order=2))
    got = resample.sample_image_upsample(img, u, v, order=2, tile=32)
    assert got is not None
    got = np.asarray(got)
    assert np.array_equal(np.isnan(got), np.isnan(want))
    np.testing.assert_allclose(got, want, rtol=2e-6, atol=2e-5)


def test_upsample_nan_infection_matches_gather():
    """A NaN source pixel infects every output whose 3x3 stencil touches
    it — including taps whose weight is zero — exactly like the gather
    sampler."""
    img = src_image(24, 24, with_nans=False)
    img[12, 12] = np.nan
    H = W = 240
    u = np.linspace(1.0, 22.5, W)[None, :].repeat(H, axis=0)
    v = np.linspace(1.0, 22.5, H)[:, None].repeat(W, axis=1)
    want = np.asarray(resample.sample_image(img, u, v, order=2))
    got = resample.sample_image_upsample(img, u, v, order=2, tile=64)
    assert got is not None
    got = np.asarray(got)
    assert np.array_equal(np.isnan(got), np.isnan(want))


def test_upsample_gate_rejects_downsampling():
    """A map whose tiles span a large source window (downsampling) must
    return None (fallback to the gather path)."""
    img = src_image(400, 400, with_nans=False)
    H = W = 64
    u = np.linspace(0, 399, W)[None, :].repeat(H, axis=0)
    v = np.linspace(0, 399, H)[:, None].repeat(W, axis=1)
    got = resample.sample_image_upsample(img, u, v, order=2, tile=32,
                                         max_patch=48)
    assert got is None


def test_auto_routes_near_identity_to_select():
    """Same-shape map within a few px of identity must take the select
    sampler and match the gather sampler exactly."""
    h = w = 160
    img = src_image(h, w)
    rng = np.random.default_rng(3)
    yy, xx = np.meshgrid(np.arange(h, dtype=np.float64),
                         np.arange(w, dtype=np.float64), indexing="ij")
    th = np.deg2rad(0.05)
    u = np.cos(th) * (xx - w / 2) - np.sin(th) * (yy - h / 2) + w / 2 + 1.3
    v = np.sin(th) * (xx - w / 2) + np.cos(th) * (yy - h / 2) + h / 2 - 0.8
    want = np.asarray(resample.sample_image(img, u, v, order=2))
    called = []
    orig = resample._select_sample_jit

    def spy(*a, **k):
        called.append(True)
        return orig(*a, **k)

    resample._select_sample_jit = spy
    try:
        got = np.asarray(resample.sample_image_auto(img, u, v, order=2,
                                                    tile=64))
    finally:
        resample._select_sample_jit = orig
    assert called, "near-identity map did not take the select route"
    assert np.array_equal(np.isnan(got), np.isnan(want))
    np.testing.assert_allclose(got, want, rtol=2e-6, atol=2e-5)


def test_auto_routes_upsampling_to_tiles():
    img = src_image(40, 52)
    u, v = make_map(40, 52, 300, 280)
    want = np.asarray(resample.sample_image(img, u, v, order=2))
    called = []
    orig = resample._upsample_eval

    def spy(*a, **k):
        called.append(True)
        return orig(*a, **k)

    resample._upsample_eval = spy
    try:
        got = np.asarray(resample.sample_image_auto(img, u, v, order=2,
                                                    tile=128))
    finally:
        resample._upsample_eval = orig
    assert called, "oversampling map did not take the tile route"
    assert np.array_equal(np.isnan(got), np.isnan(want))
    np.testing.assert_allclose(got, want, rtol=2e-6, atol=2e-5)


def test_auto_falls_back_to_gather():
    """Downsampling, non-identity map: neither fast route applies."""
    img = src_image(400, 400, with_nans=False)
    H = W = 64
    u = np.linspace(0, 399, W)[None, :].repeat(H, axis=0)
    v = np.linspace(0, 399, H)[:, None].repeat(W, axis=1)
    want = np.asarray(resample.sample_image(img, u, v, order=2))
    got = np.asarray(resample.sample_image_auto(img, u, v, order=2,
                                                tile=32, max_patch=48))
    np.testing.assert_allclose(got, want, rtol=2e-6, atol=2e-5)


def test_upsample_non_divisible_shapes():
    img = src_image(33, 47)
    u, v = make_map(33, 47, 190, 170)
    want = np.asarray(resample.sample_image(img, u, v, order=2))
    got = resample.sample_image_upsample(img, u, v, order=2, tile=64)
    assert got is not None
    got = np.asarray(got)
    assert got.shape == want.shape
    assert np.array_equal(np.isnan(got), np.isnan(want))
    np.testing.assert_allclose(got, want, rtol=2e-6, atol=2e-5)


@pytest.mark.parametrize("order", [0, 1, 2, 3])
def test_host_sampler_matches_device(order):
    """sample_image_np is the host twin used for tiny point counts
    (synras slit columns): exact semantic parity with sample_image."""
    img = src_image(40, 52)
    rng = np.random.default_rng(9)
    u = rng.uniform(-3, 55, size=(37, 21))
    v = rng.uniform(-3, 43, size=(37, 21))
    u[0, 0] = np.nan
    v[1, 1] = np.nan
    u[2, :] = np.linspace(0, 51, 21)          # exact edge coords
    want = np.asarray(resample.sample_image(img, u, v, order=order))
    got = resample.sample_image_np(img, u, v, order=order)
    assert np.array_equal(np.isnan(got), np.isnan(want))
    np.testing.assert_allclose(got, want, rtol=2e-6, atol=2e-5)


@pytest.mark.parametrize("order", [1, 3])
def test_upsample_border_mirror_nan_infection(order):
    """Odd-order taps at exact-border coordinates mirror OUTSIDE the naive
    patch (tap n -> n-2, tap n+1 -> n-3): a NaN there must still infect the
    output exactly like the gather sampler (regression: the patch bounds
    were computed from unmirrored tap indices)."""
    w = h = 16
    img = src_image(h, w, with_nans=False)
    img[:, w - 3] = np.nan
    img[h - 3, :] = np.nan
    H = W = 64
    u = np.full((H, W), float(w - 1))
    v = np.full((H, W), float(h - 1))
    want = np.asarray(resample.sample_image(img, u, v, order=order))
    got = resample.sample_image_upsample(img, u, v, order=order, tile=32)
    assert got is not None
    got = np.asarray(got)
    assert np.array_equal(np.isnan(got), np.isnan(want))


def test_auto_and_upsample_honor_cval():
    """Non-NaN cval: invalid coords give cval on every route, while
    NaN-infected stencils still propagate NaN (not cval), matching
    sample_image."""
    # upsample route
    img = src_image(40, 52)                    # has interior NaNs
    u, v = make_map(40, 52, 300, 280)
    u[0, :5] = np.nan                          # invalid coords
    want = np.asarray(resample.sample_image(img, u, v, order=2, cval=-99.0))
    got = resample.sample_image_upsample(img, u, v, order=2, cval=-99.0,
                                         tile=128)
    assert got is not None
    got = np.asarray(got)
    assert np.array_equal(got == -99.0, want == -99.0)
    assert np.array_equal(np.isnan(got), np.isnan(want))
    np.testing.assert_allclose(got[np.isfinite(want)],
                               want[np.isfinite(want)], rtol=2e-6, atol=2e-5)

    # select route (near-identity map)
    h = w = 96
    img2 = src_image(h, w, with_nans=False)
    yy, xx = np.meshgrid(np.arange(h, dtype=np.float64),
                         np.arange(w, dtype=np.float64), indexing="ij")
    u2 = xx + 1.7
    v2 = yy - 0.4
    want2 = np.asarray(resample.sample_image(img2, u2, v2, order=2,
                                             cval=-7.0))
    got2 = np.asarray(resample.sample_image_auto(img2, u2, v2, order=2,
                                                 cval=-7.0, tile=48))
    assert np.array_equal(got2 == -7.0, want2 == -7.0)
    np.testing.assert_allclose(got2, want2, rtol=2e-6, atol=2e-5)


def test_auto_order3_near_identity_falls_back():
    """order=3 has no select sampler: a near-identity map must fall through
    to the upsample/gather routes instead of raising (review finding:
    Alignment(reprojection_order=3) on a same-shape pair hit this)."""
    h = w = 48
    img = src_image(h, w)
    yy, xx = np.meshgrid(np.arange(h, dtype=np.float64),
                         np.arange(w, dtype=np.float64), indexing="ij")
    u = xx + 1.3
    v = yy - 0.6
    want = np.asarray(resample.sample_image(img, u, v, order=3))
    got = np.asarray(resample.sample_image_auto(img, u, v, order=3, tile=24))
    assert np.array_equal(np.isnan(got), np.isnan(want))
    np.testing.assert_allclose(got[np.isfinite(want)],
                               want[np.isfinite(want)], rtol=2e-6, atol=2e-5)


@pytest.mark.parametrize("seed", [0, 1, 2, 3, 4, 5, 6, 7])
def test_auto_fuzz_matches_gather(seed):
    """Seeded property test: random map/image/order/cval configs through
    sample_image_auto must match the gather sampler exactly in NaN pattern
    and to fp tolerance in values (the review fuzz over this space caught
    the order-3 select crash; keep it as a permanent net)."""
    rng = np.random.default_rng(100 + seed)
    h = int(rng.integers(12, 60))
    w = int(rng.integers(12, 60))
    img = src_image(h, w, seed=seed, with_nans=bool(seed % 2))
    order = int(rng.integers(0, 4))
    cval = float(rng.choice([np.nan, -99.0, 0.0]))

    kind = seed % 3
    if kind == 0:       # oversampling map (upsample route candidate)
        H, W = int(rng.integers(100, 200)), int(rng.integers(100, 200))
        u, v = make_map(h, w, H, W, rot_deg=float(rng.uniform(-1, 1)),
                        seed=seed)
    elif kind == 1:     # near-identity (select route candidate)
        yy, xx = np.meshgrid(np.arange(h, dtype=np.float64),
                             np.arange(w, dtype=np.float64), indexing="ij")
        u = xx + float(rng.uniform(-3, 3))
        v = yy + float(rng.uniform(-3, 3))
    else:               # wild map incl. out-of-range + NaN coords (gather)
        H = W = int(rng.integers(40, 90))
        u = rng.uniform(-5, w + 5, size=(H, W))
        v = rng.uniform(-5, h + 5, size=(H, W))
        u[rng.uniform(size=(H, W)) < 0.02] = np.nan

    want = np.asarray(resample.sample_image(img, u, v, order=order,
                                            cval=cval))
    got = np.asarray(resample.sample_image_auto(img, u, v, order=order,
                                                cval=cval, tile=32))
    assert got.shape == want.shape
    assert np.array_equal(np.isnan(got), np.isnan(want))
    fin = np.isfinite(want)
    np.testing.assert_allclose(got[fin], want[fin], rtol=2e-6, atol=2e-5)
