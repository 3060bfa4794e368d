"""Pallas quadratic-displacement warp+score kernel (engine/pallas_quad.py)
vs the reference-exact gather sampler (interpret mode on CPU)."""
import numpy as np
import pytest

import fixtures as fx
from euispice_coreg_tpu.core import resample, score
from euispice_coreg_tpu.engine import pallas_quad


def quad_field(cf, h, w):
    jj, ii = np.meshgrid(np.arange(w, dtype=np.float64),
                         np.arange(h, dtype=np.float64))
    dx = (cf[0, 0] * jj + cf[1, 0] * ii + cf[2, 0]
          + cf[3, 0] * jj * jj + cf[4, 0] * ii * ii + cf[5, 0] * jj * ii)
    dy = (cf[0, 1] * jj + cf[1, 1] * ii + cf[2, 1]
          + cf[3, 1] * jj * jj + cf[4, 1] * ii * ii + cf[5, 1] * jj * ii)
    return jj + dx, ii + dy


def expected_scores(coeffs, warped, ref, order):
    """Reference values via the plain gather sampler + masked Pearson."""
    import jax.numpy as jnp

    vals = []
    for cf in coeffs:
        x, y = quad_field(cf, *warped.shape)
        sampled = resample.sample_image(
            jnp.asarray(warped, dtype=jnp.float32),
            jnp.asarray(x, dtype=jnp.float32),
            jnp.asarray(y, dtype=jnp.float32), order=order)
        vals.append(float(score.masked_pearson(
            jnp.asarray(ref, dtype=jnp.float32), sampled)))
    return np.array(vals)


def make_scene(h=256, w=200, seed=0, with_nans=False):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    warped = (np.sin(xx / 9.0) * np.cos(yy / 13.0)
              + 0.1 * rng.standard_normal((h, w)))
    ref = np.roll(warped, (3, -5), axis=(0, 1)) + 0.05 * rng.standard_normal((h, w))
    if with_nans:
        warped = warped.copy()
        warped[40:55, 20:60] = np.nan
        ref = ref.copy()
        ref[100:120, 150:190] = np.nan
    return warped, ref


@pytest.mark.parametrize("order", [0, 1, 2])
def test_quad_kernel_matches_gather(order):
    """Translations large enough to exercise the aligned-DMA shift folding,
    plus genuinely quadratic fields, on a non-tile-multiple image."""
    warped, ref = make_scene()
    h, w = warped.shape
    coeffs = np.zeros((4, 6, 2))
    coeffs[0, 2] = (37.0 + 0.3, -141.0 + 0.6)      # large shift, both signs
    coeffs[1, 2] = (-129.4, 8.2)
    # affine + quadratic curvature (within-tile residual ~1-2 px)
    coeffs[2, 2] = (5.3, -2.1)
    coeffs[2, 0, 0] = 4e-3
    coeffs[2, 1, 1] = -6e-3
    coeffs[2, 3, 0] = 3e-6
    coeffs[2, 4, 1] = -4e-6
    coeffs[3, 2] = (0.0, 0.0)
    coeffs[3, 5] = (2e-6, -1.5e-6)

    got = pallas_quad.evaluate_select_carr_pallas(
        coeffs, warped, ref, order=order, h=h, w=w, interpret=True)
    assert got is not None
    want = expected_scores(coeffs, warped, ref, order)
    np.testing.assert_allclose(got, want, atol=3e-4)


def test_quad_kernel_with_nans():
    warped, ref = make_scene(with_nans=True)
    h, w = warped.shape
    coeffs = np.zeros((2, 6, 2))
    coeffs[0, 2] = (17.3, -4.6)
    coeffs[1, 2] = (-3.1, 9.9)
    coeffs[1, 0, 0] = -3e-3
    coeffs[1, 4, 1] = 5e-6
    got = pallas_quad.evaluate_select_carr_pallas(
        coeffs, warped, ref, order=2, h=h, w=w, interpret=True)
    want = expected_scores(coeffs, warped, ref, order=2)
    np.testing.assert_allclose(got, want, atol=3e-4)


def test_quad_kernel_residus_masked():
    """The residue score accumulates different partial sums in the same
    kernel; compare against the gather sampler + score.residus_masked."""
    import jax.numpy as jnp

    warped, ref = make_scene(with_nans=True)
    # residus divides by sqrt(ref): keep it positive like real intensities
    ref = np.abs(ref) + 50.0
    warped = np.abs(warped) + 50.0
    h, w = warped.shape
    coeffs = np.zeros((3, 6, 2))
    coeffs[0, 2] = (7.3, -24.6)
    coeffs[1, 2] = (-3.1, 9.9)
    coeffs[1, 0, 0] = -3e-3
    coeffs[2, 2] = (140.8, 33.2)
    got = pallas_quad.evaluate_select_carr_pallas(
        coeffs, warped, ref, order=2, h=h, w=w, method="residus_masked",
        interpret=True)
    assert got is not None
    want = []
    for cf in coeffs:
        x, y = quad_field(cf, h, w)
        sampled = resample.sample_image(
            jnp.asarray(warped, dtype=jnp.float32),
            jnp.asarray(x, dtype=jnp.float32),
            jnp.asarray(y, dtype=jnp.float32), order=2)
        want.append(float(score.residus_masked(
            jnp.asarray(ref, dtype=jnp.float32), sampled)))
    np.testing.assert_allclose(got, np.array(want), rtol=2e-3, atol=1e-5)


def test_tile_shifts_bound_is_rigorous():
    """The PRODUCTION bound/shift pair (_tile_bounds corner analysis +
    f32 on-device _device_tile_shifts) must cover the true within-tile
    deviation, and for the order-0/2 tap anchor (floor(.+0.5), matching the
    shift rounding) the integer residual must stay within ceil(dev) — the
    kernel's residual-mask window."""
    rng = np.random.default_rng(3)
    h, w = 300, 260
    n_ty, n_tx = -(-h // 128), -(-w // 128)
    jj, ii = np.meshgrid(np.arange(w, dtype=float), np.arange(h, dtype=float))
    for _ in range(20):
        coeffs = np.zeros((1, 6, 2))
        coeffs[0, 0:2] = rng.uniform(-6e-3, 6e-3, (2, 2))
        coeffs[0, 2] = rng.uniform(-80, 80, 2)
        coeffs[0, 3:6] = rng.uniform(-8e-6, 8e-6, (3, 2))
        import jax.numpy as jnp

        dev_x, dev_y, g_bound = pallas_quad._tile_bounds(
            coeffs, h, w, n_ty, n_tx)
        cf32 = coeffs.astype(np.float32)
        coeffs12 = np.concatenate([cf32[:, :, 0], cf32[:, :, 1]],
                                  axis=1).reshape(1, 1, 12)
        shifts = np.asarray(pallas_quad._device_tile_shifts(
            jnp.asarray(coeffs12), n_ty=n_ty, n_tx=n_tx, th=128, tw=128,
            h=h, w=w))[:, :, :, 0, :]
        assert int(np.max(np.abs(shifts))) <= g_bound
        mx = max(1, int(np.ceil(dev_x + 1e-3)))
        my = max(1, int(np.ceil(dev_y + 1e-3)))
        x, y = quad_field(coeffs[0], h, w)
        for ty in range(n_ty):
            for tx in range(n_tx):
                sl = np.s_[ty * 128: min((ty + 1) * 128, h),
                           tx * 128: min((tx + 1) * 128, w)]
                dx = (x - jj)[sl]
                dy = (y - ii)[sl]
                uc = 0.5 * (tx * 128 + min((tx + 1) * 128 - 1, w - 1))
                vc = 0.5 * (ty * 128 + min((ty + 1) * 128 - 1, h - 1))
                cf = coeffs[0]
                cdx, cdy = (cf[0, k] * uc + cf[1, k] * vc + cf[2, k]
                            + cf[3, k] * uc * uc + cf[4, k] * vc * vc
                            + cf[5, k] * uc * vc for k in (0, 1))
                assert np.max(np.abs(dx - cdx)) <= dev_x + 1e-9
                assert np.max(np.abs(dy - cdy)) <= dev_y + 1e-9
                rx = np.floor(dx + 0.5) - shifts[0, ty, tx, 0]
                ry = np.floor(dy + 0.5) - shifts[0, ty, tx, 1]
                assert np.max(np.abs(rx)) <= mx
                assert np.max(np.abs(ry)) <= my


def test_quad_kernel_sharded_matches_single_device():
    """Lag axis sharded over the 8-device mesh (shard_map around the
    pallas_call) must reproduce the single-device scores exactly."""
    from euispice_coreg_tpu.engine import lag_search

    mesh = lag_search.default_mesh()
    assert mesh is not None and mesh.devices.size == 8
    warped, ref = make_scene(h=256, w=256)
    coeffs = np.zeros((16, 6, 2))
    coeffs[:, 2, 0] = np.linspace(-20, 20, 16)
    coeffs[:, 2, 1] = np.linspace(12, -12, 16)
    coeffs[:, 0, 0] = 2e-3
    single = pallas_quad.evaluate_select_carr_pallas(
        coeffs, warped, ref, order=2, h=256, w=256, interpret=True)
    sharded = pallas_quad.evaluate_select_carr_pallas(
        coeffs, warped, ref, order=2, h=256, w=256, interpret=True,
        mesh=mesh)
    np.testing.assert_allclose(sharded, single, rtol=1e-6, atol=1e-7)


def test_quad_kernel_gating():
    warped, ref = make_scene(h=128, w=128)
    # within-tile residual bound exceeded -> None
    coeffs = np.zeros((1, 6, 2))
    coeffs[0, 0, 0] = 0.5   # dx = 0.5 * x: 64 px spread inside one tile
    out = pallas_quad.evaluate_select_carr_pallas(
        coeffs, warped, ref, order=2, h=128, w=128, interpret=True)
    assert out is None
    # unsupported method -> None
    coeffs = np.zeros((1, 6, 2))
    out = pallas_quad.evaluate_select_carr_pallas(
        coeffs, warped, ref, order=2, h=128, w=128, method="residus",
        interpret=True)
    assert out is None


def test_carrington_select_pallas_matches_xla():
    """The Carrington select path with use_pallas=True vs the XLA select
    evaluator (same quadratic fit, different executor)."""
    from euispice_coreg_tpu.engine import carrington as carr
    from euispice_coreg_tpu.utils import timeutils

    dl, hl, ds, hs = fx.make_carrington_pair(true_shift_arcsec=(20.0, -10.0))
    lonlims, latlims, shape = (115.0, 125.0), (-2.0, 8.0), (128, 128)
    ref_img = carr.reproject_to_carrington(
        dl, hl, lonlims, latlims, shape, d_solar_r=1.004,
        reference_date=hl["DATE-OBS"], rate_wave="171",
        compute_dtype="float32")
    l1 = np.arange(0.0, 41.0, 10.0) / 3600.0
    l2 = np.arange(-30.0, 11.0, 10.0) / 3600.0

    sc = carr.header_spherical_scalars(hs, 1.004)
    delta_t = timeutils.time_diff_days(str(hs["DATE-OBS"]), str(hl["DATE-OBS"]))
    common = dict(
        delta_t=delta_t, rate_wave="171",
        lonlims=lonlims, latlims=latlims, shape=shape,
        l1=l1, l2=l2, l3=np.array([0.0]), l4=np.array([0.0]),
        l5=np.array([0.0]), order=2, method="correlation",
        compute_dtype="float32", batch_size=4)
    xla = carr._carrington_select(ds, ref_img, sc,
                                  use_pallas=False, **common)
    pal = carr._carrington_select(ds, ref_img, sc,
                                  use_pallas=True, pallas_interpret=True,
                                  **common)
    assert xla is not None and pal is not None
    np.testing.assert_allclose(pal, xla, atol=5e-4)
    assert np.unravel_index(np.nanargmax(pal), pal.shape) == \
        np.unravel_index(np.nanargmax(xla), xla.shape)


@pytest.mark.slow
def test_supertile_parity_interpret():
    """The 2x2 super-tile kernel (256^2 output per grid step) matches the
    128-tile kernel exactly up to f32 reduction order."""
    import numpy as np

    from euispice_coreg_tpu.engine import pallas_quad as pq

    h = w = 288
    rng = np.random.default_rng(5)
    warped = rng.normal(100.0, 5.0, size=(h, w))
    ref = rng.normal(100.0, 5.0, size=(h, w))
    L = 6
    c = np.zeros((L, 6, 2))
    c[:, 2, 0] = np.linspace(-9.0, 9.0, L)
    c[:, 2, 1] = np.linspace(5.0, -5.0, L)
    c[:, 0, :] = 2e-4
    c[:, 1, :] = -2e-4
    c[:, 3:, :] = 1e-8

    kw = dict(order=2, h=h, w=w, method="correlation", interpret=True)
    r1 = pq.evaluate_select_carr_pallas(c, warped, ref, supertile=1, **kw)
    r2 = pq.evaluate_select_carr_pallas(c, warped, ref, supertile=2, **kw)
    assert r1 is not None and r2 is not None
    np.testing.assert_allclose(r2, r1, rtol=1e-5, atol=1e-6)

    # residus_masked path too
    kw["method"] = "residus_masked"
    r1 = pq.evaluate_select_carr_pallas(c, warped, ref, supertile=1, **kw)
    r2 = pq.evaluate_select_carr_pallas(c, warped, ref, supertile=2, **kw)
    np.testing.assert_allclose(r2, r1, rtol=1e-5, atol=1e-6)


def test_margin_buckets_split_and_match_gather(monkeypatch):
    """Mixed-magnitude lag sets: central lags ride small select windows
    while only the high-gradient lags pay the global margins — one
    memoized kernel instance per level, values identical to the
    reference gather sampler (the bucketing is exact, not approximate)."""
    warped, ref = make_scene()
    h, w = warped.shape
    L = 6
    coeffs = np.zeros((L, 6, 2))
    coeffs[0, 2] = (3.2, -4.1)          # m = 1
    coeffs[1, 2] = (-7.4, 2.2)          # m = 1
    for k, g in zip((2, 3), (0.028, 0.03)):   # dev ~ g*63.5 -> m = 2
        coeffs[k, 2] = (5.0, -3.0)
        coeffs[k, 0, 0] = g
    for k, g in zip((4, 5), (0.055, 0.06)):   # m = 4
        coeffs[k, 2] = (-4.0, 6.0)
        coeffs[k, 0, 0] = g
        coeffs[k, 1, 1] = -g * 0.5

    builds = []
    orig = pallas_quad._build_eval

    def spy(mx, my, *a, **k):
        builds.append((mx, my))
        return orig(mx, my, *a, **k)

    monkeypatch.setattr(pallas_quad, "_build_eval", spy)
    got = pallas_quad.evaluate_select_carr_pallas(
        coeffs, warped, ref, order=2, h=h, w=w, interpret=True)
    assert got is not None
    assert len(set(builds)) >= 2, builds
    assert min(b[0] for b in builds) == 1
    want = expected_scores(coeffs, warped, ref, 2)
    np.testing.assert_allclose(got, want, atol=3e-4)
