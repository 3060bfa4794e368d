"""Gather-based image resampling matching ``scipy.ndimage.map_coordinates``
with ``prefilter=False`` and ``mode='constant'``.

The reference wraps scipy's compiled spline resampler in ``interpol2d``
(``/root/reference/euispice_coreg/utils/Util.py:82-104``), called once per
lag-grid point.  Here the same sampling (B-spline evaluation on *unfiltered*
data, constant fill) is expressed as an XLA gather + weighted sum, so it fuses
into the vmapped lag-grid kernel and runs on TPU.

Orders 0..3 are supported; the reference default is order=2
(``alignment.py:54``).  scipy tap/weight conventions:

* even order:  start tap ``k = floor(c + 0.5) - order//2``
* odd order:   start tap ``k = floor(c)   - order//2``
* weights are the centered B-spline of the given order evaluated at the
  fractional offset;
* a coordinate strictly outside ``[0, n-1]`` on either axis yields ``cval``
  (NaN fill -> masked pixel downstream);
* for in-range coordinates whose spline footprint crosses the edge, taps are
  *mirrored* about the edge pixel (scipy applies mirror extension to spline
  taps even in constant mode; verified empirically against scipy 1.17).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..utils import memo

# memoized sample_image_auto planning stats (see its ``plan_key`` /
# ``plan_ident`` args)
_PLAN_CACHE = memo.FIFOCache(maxsize=16)
_PLAN_IDENT_CACHE = memo.IdentityCache(maxsize=8)


def _taps_and_weights(c, order):
    """Per-axis tap indices (int32, list) and weights (list) for coordinate c."""
    if order == 0:
        k = jnp.floor(c + 0.5).astype(jnp.int32)
        return [k], [jnp.ones_like(c)]
    if order == 1:
        k = jnp.floor(c)
        t = c - k
        k = k.astype(jnp.int32)
        return [k, k + 1], [1.0 - t, t]
    if order == 2:
        k = jnp.floor(c + 0.5)
        t = c - k
        k = k.astype(jnp.int32)
        w_m1 = 0.5 * (0.5 - t) ** 2
        w_0 = 0.75 - t * t
        w_p1 = 0.5 * (0.5 + t) ** 2
        return [k - 1, k, k + 1], [w_m1, w_0, w_p1]
    if order == 3:
        k = jnp.floor(c)
        t = c - k
        k = k.astype(jnp.int32)
        t2 = t * t
        t3 = t2 * t
        w_m1 = (1.0 - 3.0 * t + 3.0 * t2 - t3) / 6.0
        w_0 = (4.0 - 6.0 * t2 + 3.0 * t3) / 6.0
        w_p1 = (1.0 + 3.0 * t + 3.0 * t2 - 3.0 * t3) / 6.0
        w_p2 = t3 / 6.0
        return [k - 1, k, k + 1, k + 2], [w_m1, w_0, w_p1, w_p2]
    raise NotImplementedError(f"spline order {order} not supported (use 0..3)")


def sample_image(image, x, y, order: int = 2, cval=jnp.nan):
    """Sample ``image[row, col]`` at fractional coordinates (x=col, y=row).

    Equivalent to ``scipy.ndimage.map_coordinates(image, [y, x], order=order,
    mode='constant', cval=cval, prefilter=False)``.  NaN coordinates produce
    ``cval`` (NaN) output.  Arbitrary leading batch dims on x/y are allowed.
    """
    image = jnp.asarray(image)
    h, w = image.shape
    flat = image.ravel()
    x = jnp.asarray(x)
    y = jnp.asarray(y)

    # scipy rejects coordinates strictly outside [0, n-1] (constant mode);
    # NaN coordinates also fall through to cval (fixes the reference's broken
    # `x == np.nan` guard, Util.py:87-89, with the intended semantics).
    invalid = (
        jnp.isnan(x) | jnp.isnan(y)
        | (x < 0) | (x > w - 1)
        | (y < 0) | (y > h - 1)
    )
    xs = jnp.where(invalid, 0.0, x)
    ys = jnp.where(invalid, 0.0, y)

    tx, wx = _taps_and_weights(xs, order)
    ty, wy = _taps_and_weights(ys, order)

    acc = jnp.zeros(jnp.broadcast_shapes(x.shape, y.shape), dtype=image.dtype)
    for iy, wyi in zip(ty, wy):
        iym = _mirror(iy, h)
        for ix, wxi in zip(tx, wx):
            ixm = _mirror(ix, w)
            lin = iym * w + ixm
            # plain indexing (clamp semantics) — indices are already in-range
            # after _mirror; jnp.take(..., mode="clip") lowers to a ~300x
            # slower gather on TPU
            vals = flat[lin]
            acc = acc + (wyi * wxi) * vals
    return jnp.where(invalid, cval, acc)


def sample_image_np(image, x, y, order: int = 2, cval=np.nan):
    """Host-numpy twin of :func:`sample_image` (same taps, mirror extension,
    NaN/out-of-range rules — the formulas are shared).

    For small point counts the device path is absurd on a tunneled TPU: a
    4 MB image upload to sample a few thousand slit coordinates costs
    ~100 ms of transfer for microseconds of host work (synras raster
    columns, SPICE context rasters).  Callers route by size
    (engine/lag_search.resample_to_grid)."""
    image = np.asarray(image)
    h, w = image.shape
    flat = image.ravel()
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    invalid = (np.isnan(x) | np.isnan(y)
               | (x < 0) | (x > w - 1) | (y < 0) | (y > h - 1))
    xs = np.where(invalid, 0.0, x)
    ys = np.where(invalid, 0.0, y)

    def taps_np(c):
        if order == 0:
            return [np.floor(c + 0.5).astype(np.int64)], [np.ones_like(c)]
        if order == 1:
            k = np.floor(c)
            t = c - k
            k = k.astype(np.int64)
            return [k, k + 1], [1.0 - t, t]
        if order == 2:
            k = np.floor(c + 0.5)
            t = c - k
            k = k.astype(np.int64)
            return [k - 1, k, k + 1], [0.5 * (0.5 - t) ** 2, 0.75 - t * t,
                                       0.5 * (0.5 + t) ** 2]
        if order == 3:
            k = np.floor(c)
            t = c - k
            k = k.astype(np.int64)
            t2, t3 = t * t, t * t * t
            return [k - 1, k, k + 1, k + 2], [
                (1.0 - 3.0 * t + 3.0 * t2 - t3) / 6.0,
                (4.0 - 6.0 * t2 + 3.0 * t3) / 6.0,
                (1.0 + 3.0 * t + 3.0 * t2 - 3.0 * t3) / 6.0,
                t3 / 6.0]
        raise NotImplementedError(f"spline order {order} not supported")

    def mirror_np(idx, n):
        if n == 1:
            return np.zeros_like(idx)
        period = 2 * n - 2
        idx = np.abs(idx) % period
        return np.where(idx >= n, period - idx, idx)

    tx, wx = taps_np(xs)
    ty, wy = taps_np(ys)
    acc = np.zeros(np.broadcast_shapes(x.shape, y.shape), dtype=image.dtype)
    for iy, wyi in zip(ty, wy):
        iym = mirror_np(iy, h)
        for ix, wxi in zip(tx, wx):
            ixm = mirror_np(ix, w)
            acc = acc + (wyi * wxi) * flat[iym * w + ixm]
    return np.where(invalid, cval, acc)


def _mirror(idx, n):
    """Mirror an (possibly out-of-range) tap index about the edge pixels,
    scipy 'mirror' convention (period 2n-2, edge not repeated)."""
    if n == 1:
        return jnp.zeros_like(idx)
    period = 2 * n - 2
    idx = jnp.abs(idx) % period
    return jnp.where(idx >= n, period - idx, idx)


def sample_image_select(image_padded, x, y, order: int, shift_x, shift_y,
                        residual_bound: int, pad: int, h: int, w: int,
                        cval=jnp.nan):
    """Gather-free equivalent of :func:`sample_image` for near-translation
    coordinate fields.

    The TPU's hardware gather unit runs at ~7 cycles/element, so the generic
    engine's per-lag resample dominated everything.  When the coordinate
    field decomposes as ``c = index + global_shift + residual`` with
    ``|residual| <= residual_bound`` (true for every header-lag warp: the lag
    moves the whole image, rotation/scale residuals are bounded), the sample
    is an exact masked sum over statically-shifted slices — pure VPU work.

    Args:
      image_padded: the source image mirror-padded by ``pad`` on both axes
        (``jnp.pad(img, pad, mode="reflect")``), which reproduces scipy's
        mirror tap extension exactly (see :func:`sample_image`).
      x, y: absolute sample coordinates into the ORIGINAL (h, w) image.
      shift_x, shift_y: per-call (dynamic) integer global shifts; residuals
        relative to them must stay within ``residual_bound``.
      residual_bound, pad: static ints; ``pad >= |shift| + residual_bound + 2``
        must hold (caller-checked).
      h, w: original image size (static).

    Output elements whose coordinate is NaN, outside ``[0, n-1]``, or whose
    residual exceeds the bound are ``cval``.
    """
    m = int(residual_bound)
    moff = m + 2  # margin covering stencil taps
    x = jnp.asarray(x)
    y = jnp.asarray(y)
    out_shape = jnp.broadcast_shapes(x.shape, y.shape)
    oh, ow = out_shape

    # working window: w0[a, b] = img_mirror[a - moff + shift_y, b - moff + shift_x]
    start_y = pad + shift_y - moff
    start_x = pad + shift_x - moff
    w0 = jax.lax.dynamic_slice(
        image_padded, (start_y, start_x), (oh + 2 * moff, ow + 2 * moff)
    )

    jj = jax.lax.broadcasted_iota(jnp.int32, out_shape, 1)
    ii = jax.lax.broadcasted_iota(jnp.int32, out_shape, 0)

    invalid = (
        jnp.isnan(x) | jnp.isnan(y)
        | (x < 0) | (x > w - 1) | (y < 0) | (y > h - 1)
    )
    xs = jnp.where(invalid, jj.astype(x.dtype), x)
    ys = jnp.where(invalid, ii.astype(y.dtype), y)

    if order == 2:
        kx = jnp.floor(xs + 0.5).astype(jnp.int32)
        ky = jnp.floor(ys + 0.5).astype(jnp.int32)
        tap_lo, n_taps = -1, 3
    elif order == 1:
        kx = jnp.floor(xs).astype(jnp.int32)
        ky = jnp.floor(ys).astype(jnp.int32)
        tap_lo, n_taps = 0, 2
    elif order == 0:
        kx = jnp.floor(xs + 0.5).astype(jnp.int32)
        ky = jnp.floor(ys + 0.5).astype(jnp.int32)
        tap_lo, n_taps = 0, 1
    else:
        raise NotImplementedError(f"order {order} (use 0, 1 or 2)")

    tx = xs - kx
    ty = ys - ky
    _, wx_list = _taps_and_weights(xs, order)
    _, wy_list = _taps_and_weights(ys, order)

    rx = kx - jj - shift_x  # integer residual, in [-m, m] when valid
    ry = ky - ii - shift_y
    res_ok = (jnp.abs(rx) <= m) & (jnp.abs(ry) <= m)
    invalid = invalid | ~res_ok
    rx = jnp.clip(rx, -m, m)
    ry = jnp.clip(ry, -m, m)

    dtype = image_padded.dtype
    zero = jnp.zeros(out_shape, dtype=dtype)

    # stage over row offsets r = ry + ay: column-mix each needed row window,
    # then y-mix with masked selection.  All w0 accesses are static slices.
    def col_mixed_row(r):
        acc = zero
        for ox in range(-m, m + 1):
            mask_x = rx == ox
            inner = zero
            for ax in range(n_taps):
                sl = w0[moff + r : moff + r + oh,
                        moff + ox + tap_lo + ax : moff + ox + tap_lo + ax + ow]
                inner = inner + wx_list[ax].astype(dtype) * sl
            acc = jnp.where(mask_x, inner, acc)
        return acc

    rows = {r: col_mixed_row(r)
            for r in range(-m + tap_lo, m + tap_lo + n_taps)}

    out = zero
    for oy in range(-m, m + 1):
        mask_y = ry == oy
        mixed = zero
        for ay in range(n_taps):
            mixed = mixed + wy_list[ay].astype(dtype) * rows[oy + tap_lo + ay]
        out = jnp.where(mask_y, mixed, out)

    return jnp.where(invalid, cval, out)


def _tap_base_offsets(order: int):
    """(even_base, tap_lo, n_taps): the tap set of :func:`_taps_and_weights`
    is ``floor(c + 0.5 if even_base else c) + [tap_lo .. tap_lo+n_taps-1]``."""
    if order == 0:
        return True, 0, 1
    if order == 1:
        return False, 0, 2
    if order == 2:
        return True, -1, 3
    if order == 3:
        return False, -1, 4
    raise NotImplementedError(f"spline order {order} not supported (use 0..3)")


@partial(jax.jit, static_argnames=("order", "th", "tw", "n_ty", "n_tx",
                                   "Py", "Px", "h", "w"))
def _upsample_eval(image, x, y, starts, cval, *, order, th, tw, n_ty, n_tx,
                   Py, Px, h, w):
    """Scan over output tiles: slice the (Py, Px) source patch, build
    per-pixel tap weights as patch-cell masks, contract on the MXU."""
    dt = image.dtype
    flatn = th * tw

    invalid = (jnp.isnan(x) | jnp.isnan(y)
               | (x < 0) | (x > w - 1) | (y < 0) | (y > h - 1))
    # keep the COORDINATE dtype for tap selection and weights — the gather
    # sampler rounds in it, and a float32 downcast flips ties at .5
    xs = jnp.where(invalid, 0.0, x)
    ys = jnp.where(invalid, 0.0, y)

    def one_tile(carry, t):
        ty = t // n_tx
        tx = t % n_tx
        oy0 = ty * th
        ox0 = tx * tw
        xs_t = jax.lax.dynamic_slice(xs, (oy0, ox0), (th, tw))
        ys_t = jax.lax.dynamic_slice(ys, (oy0, ox0), (th, tw))
        inv_t = jax.lax.dynamic_slice(invalid, (oy0, ox0), (th, tw))
        y0 = starts[t, 0]
        x0 = starts[t, 1]
        patch = jax.lax.dynamic_slice(image, (y0, x0), (Py, Px))
        pnan = jnp.isnan(patch)
        p0 = jnp.where(pnan, 0.0, patch)

        def axis_weights(c_t, n, P, p0_):
            """(flatn, P) value weights and 0/1 tap-presence masks: cell
            weight = sum of the spline tap weights whose MIRRORED index
            lands on that patch cell (reproduces the gather version's edge
            mirroring and its all-taps NaN infection exactly)."""
            taps, wts = _taps_and_weights(c_t, order)
            cols = p0_ + jnp.arange(P, dtype=jnp.int32)
            Wc = jnp.zeros((th, tw, P), dtype=c_t.dtype)
            Ic = jnp.zeros((th, tw, P), dtype=dt)
            for tk, wk in zip(taps, wts):
                hit = _mirror(tk, n)[:, :, None] == cols
                Wc = Wc + wk[:, :, None] * hit.astype(c_t.dtype)
                Ic = Ic + hit.astype(dt)
            return Wc.astype(dt).reshape(flatn, P), Ic.reshape(flatn, P)

        Wx, Ix = axis_weights(xs_t, w, Px, x0)
        Wy, Iy = axis_weights(ys_t, h, Py, y0)

        hi = jax.lax.Precision.HIGHEST
        A = jnp.einsum("pj,ij->pi", Wx, p0, precision=hi)        # (flatn, Py)
        val = jnp.sum(A * Wy, axis=-1)
        An = jnp.einsum("pj,ij->pi", Ix, pnan.astype(dt))
        hit_nan = jnp.sum(An * Iy, axis=-1) > 0.5

        # NaN-touched stencils propagate NaN (like the gather's w*NaN
        # arithmetic); cval applies ONLY to invalid coordinates
        out_t = jnp.where(hit_nan.reshape(th, tw), jnp.nan,
                          val.reshape(th, tw))
        out_t = jnp.where(inv_t, cval, out_t)
        return carry, out_t

    _, tiles = jax.lax.scan(one_tile, jnp.int32(0),
                            jnp.arange(n_ty * n_tx, dtype=jnp.int32))
    out = tiles.reshape(n_ty, n_tx, th, tw).transpose(0, 2, 1, 3)
    return out.reshape(n_ty * th, n_tx * tw)


def sample_image_upsample(image, x, y, order: int = 2, cval=jnp.nan,
                          tile: int = 256, max_patch: int = 96):
    """Gather-free :func:`sample_image` for smooth, strongly-oversampling
    coordinate maps (each output tile reads a small source patch).

    The generic warp is a 9-tap hardware gather (~7 cycles/element — 0.3 s
    at 2048^2 on one chip); when the map is an upsampling (engine pre-warps:
    the Carrington grid and helioprojective comparison grids oversample the
    detector 10-20x), every ``tile`` x ``tile`` output block touches only a
    tiny source window, so the sample is a dense per-tile contraction
    (patch x tap-weight masks) on the MXU with no gathers at all.  Exact
    same semantics as :func:`sample_image` (mirror tap extension, NaN
    infection by any tap, cval for NaN/out-of-range coordinates).

    Returns the sampled (H, W) array, or ``None`` when any tile's source
    footprint exceeds ``max_patch`` (caller falls back to the gather path).
    Downloads one (n_ty*n_tx, 4) bbox table per call (~KBs) to fix the
    static patch size.
    """
    if isinstance(image, jax.core.Tracer) or isinstance(x, jax.core.Tracer):
        return None  # host-side planning needs concrete arrays
    image = jnp.asarray(image)
    if len(image.devices()) > 1 or (
            next(iter(image.devices())) != jax.devices()[0]):
        return None  # mesh/multi-chip and non-default placements: the
        # helper's own jits would commit operands to the default device
        # (the exact mixed-placement bug class mesh_put exists to prevent)
    h, w = image.shape
    x = jnp.asarray(x)
    y = jnp.asarray(y)
    if x.ndim != 2 or x.shape != y.shape:
        return None
    H, W = x.shape
    th = tw = int(tile)
    n_ty = -(-H // th)
    n_tx = -(-W // tw)
    if n_ty * n_tx > 4096:
        return None
    Hp, Wp = n_ty * th, n_tx * tw

    padx = [(0, Hp - H), (0, Wp - W)]
    xp_ = jnp.pad(x, padx, constant_values=jnp.nan)
    yp_ = jnp.pad(y, padx, constant_values=jnp.nan)
    bbox_d, _, _ = _plan_stats(xp_, yp_, th, tw, n_ty, n_tx, h, w,
                               with_resid=False)
    bbox = np.asarray(bbox_d, dtype=np.float64).reshape(n_ty * n_tx, 4)
    return _upsample_from_bbox(image, xp_, yp_, bbox, order, cval,
                               th, tw, n_ty, n_tx, H, W, max_patch)


@partial(jax.jit, static_argnames=("th", "tw", "n_ty", "n_tx", "h", "w",
                                   "with_resid"))
def _plan_stats(x, y, th, tw, n_ty, n_tx, h, w, with_resid):
    """One planning pass for :func:`sample_image_auto`: per-tile bbox of the
    valid coordinates, plus (optionally) the max |coord - own index| for the
    near-identity (select sampler) test."""
    invalid = (jnp.isnan(x) | jnp.isnan(y)
               | (x < 0) | (x > w - 1) | (y < 0) | (y > h - 1))
    xv = jnp.where(invalid, jnp.nan, x)
    yv = jnp.where(invalid, jnp.nan, y)
    xr = xv.reshape(n_ty, th, n_tx, tw)
    yr = yv.reshape(n_ty, th, n_tx, tw)
    bbox = jnp.stack([
        jnp.nanmin(xr, axis=(1, 3)), jnp.nanmax(xr, axis=(1, 3)),
        jnp.nanmin(yr, axis=(1, 3)), jnp.nanmax(yr, axis=(1, 3)),
    ], axis=-1)
    if with_resid:
        jj = jax.lax.broadcasted_iota(x.dtype, x.shape, 1)
        ii = jax.lax.broadcasted_iota(x.dtype, x.shape, 0)
        rx = jnp.nanmax(jnp.abs(xv - jj))
        ry = jnp.nanmax(jnp.abs(yv - ii))
    else:
        rx = ry = jnp.asarray(jnp.inf, x.dtype)
    return bbox, rx, ry


@partial(jax.jit, static_argnames=("pad",))
def _pad_reflect_jit(img, pad):
    return jnp.pad(img, pad, mode="reflect")


@partial(jax.jit, static_argnames=("order",))
def _gather_sample_jit(image, x, y, cval, order):
    return sample_image(image, x, y, order=order, cval=cval)


@partial(jax.jit, static_argnames=("order", "m", "pad", "h", "w"))
def _select_sample_jit(padded, x, y, cval, order, m, pad, h, w):
    return sample_image_select(padded, x, y, order, 0, 0,
                               residual_bound=m, pad=pad, h=h, w=w,
                               cval=cval)


def sample_image_auto(image, x, y, order: int = 2, cval=jnp.nan,
                      tile: int = 256, max_patch: int = 64,
                      max_resid: int = 24, plan_key=None, plan_ident=None):
    """:func:`sample_image` with automatic gather-free dispatch.

    TPU hardware gathers run at ~7 cycles/element, so the generic 9-tap
    warp costs ~0.3 s at 2048^2.  One planning pass (a single small
    download) classifies the coordinate map:

    * near-identity (every coordinate within ``max_resid`` px of its own
      output index — header-lag warps between same-shape grids): the
      statically-shifted select sampler (:func:`sample_image_select`);
    * strong oversampling (every ``tile``-sized output block reads a source
      patch below ``max_patch`` — Carrington / comparison-grid pre-warps):
      the tile-contraction sampler (:func:`sample_image_upsample`);
    * otherwise, or on multi-device/non-default placements: the gather.

    ``plan_key``: optional digest-able token that UNIQUELY determines the
    coordinate fields (e.g. the WCS scalars + grid limits they were
    computed from).  When given, the planning pass's downloaded stats are
    memoized on it — the plan download is a device sync (~10-40 ms through
    a tunneled TPU) that warm repeated warps need not pay.  The image never
    enters the plan, so caching stays sound across different images
    sampled on the same coordinate map.

    ``plan_ident``: tuple of DEVICE arrays the coordinate fields were
    derived from (e.g. the world grids a warp maps through), compared by
    identity — for callers whose fields depend on arrays too large to
    digest.  Combines with ``plan_key`` for the scalar part (e.g. the
    per-combo WCS).  Only pass immutable (jax) arrays here.
    """
    if isinstance(image, jax.core.Tracer) or isinstance(x, jax.core.Tracer):
        return sample_image(image, x, y, order=order, cval=cval)
    image = jnp.asarray(image)
    x = jnp.asarray(x)
    y = jnp.asarray(y)

    def gather():
        return _gather_sample_jit(image, x, y,
                                  jnp.asarray(cval, image.dtype), order)

    if len(image.devices()) > 1 or (
            next(iter(image.devices())) != jax.devices()[0]):
        return gather()
    h, w = image.shape
    if x.ndim != 2 or x.shape != y.shape:
        return gather()
    H, W = x.shape
    th = tw = int(tile)
    n_ty = -(-H // th)
    n_tx = -(-W // tw)
    if n_ty * n_tx > 4096:
        return gather()
    Hp, Wp = n_ty * th, n_tx * tw
    padx = [(0, Hp - H), (0, Wp - W)]
    xp_ = jnp.pad(x, padx, constant_values=jnp.nan)
    yp_ = jnp.pad(y, padx, constant_values=jnp.nan)

    key = hit = None
    if plan_key is not None or plan_ident is not None:
        key = memo.digest(plan_key, (h, w), (H, W), order, tile,
                          max_resid)
        hit = (_PLAN_IDENT_CACHE.get(tuple(plan_ident), key)
               if plan_ident is not None else _PLAN_CACHE.get(key))
    if hit is not None:
        bbox, rx, ry = hit
    else:
        bbox_d, rx_d, ry_d = _plan_stats(xp_, yp_, th, tw, n_ty, n_tx, h, w,
                                         with_resid=(H, W) == (h, w))
        bbox = np.asarray(bbox_d, dtype=np.float64).reshape(n_ty * n_tx, 4)
        rx = float(rx_d)
        ry = float(ry_d)
        if plan_ident is not None:
            _PLAN_IDENT_CACHE.put(tuple(plan_ident), key, (bbox, rx, ry))
        elif key is not None:
            _PLAN_CACHE.put(key, (bbox, rx, ry))

    r = max(rx, ry)
    if np.isfinite(r) and r <= max_resid:
        # round the residual bound up to a multiple of 4: the select jit is
        # static in m, so nearby lag combos reuse one compiled program
        if order in (0, 1, 2):  # select sampler's supported orders
            m = max(4, int(-(-int(np.ceil(r + 1e-6)) // 4) * 4))
            pad = m + 2
            padded = _pad_reflect_jit(image, pad)
            return _select_sample_jit(padded, x, y,
                                      jnp.asarray(cval, image.dtype),
                                      order, m, pad, h, w)

    up = _upsample_from_bbox(image, xp_, yp_, bbox, order, cval,
                             th, tw, n_ty, n_tx, H, W, max_patch)
    if up is not None:
        return up
    return gather()


def _upsample_from_bbox(image, xp_, yp_, bbox, order, cval, th, tw,
                        n_ty, n_tx, H, W, max_patch):
    """Patch sizing + tile-contraction evaluation given a host bbox table
    (shared by :func:`sample_image_auto` and :func:`sample_image_upsample`).
    Returns the cropped (H, W) result or None when the footprint gate
    fails."""
    h, w = image.shape
    even, tap_lo, n_taps = _tap_base_offsets(order)
    shift = 0.5 if even else 0.0
    with np.errstate(invalid="ignore"):
        kxmin = np.floor(bbox[:, 0] + shift) + tap_lo
        kxmax = np.floor(bbox[:, 1] + shift) + tap_lo + n_taps - 1
        kymin = np.floor(bbox[:, 2] + shift) + tap_lo
        kymax = np.floor(bbox[:, 3] + shift) + tap_lo + n_taps - 1
    empty = ~np.isfinite(bbox[:, 0])
    x0p = np.clip(np.where(empty, 0.0, kxmin), 0, None)
    x1p = np.clip(np.where(empty, 0.0, kxmax), None, w - 1)
    y0p = np.clip(np.where(empty, 0.0, kymin), 0, None)
    y1p = np.clip(np.where(empty, 0.0, kymax), None, h - 1)
    # taps that stick out past the image edge MIRROR back inside
    # (tap -j -> j, tap (n-1)+j -> (n-1)-j): the patch must cover the
    # mirrored positions too, or the tap-presence masks (and hence the
    # any-tap NaN infection) silently miss them at exact-border coords
    with np.errstate(invalid="ignore"):
        x1p = np.maximum(x1p, np.where(kxmin < 0,
                                       np.minimum(-kxmin, w - 1), 0.0))
        x0p = np.minimum(x0p, np.where(kxmax > w - 1,
                                       np.maximum(2 * (w - 1) - kxmax, 0.0),
                                       w - 1.0))
        y1p = np.maximum(y1p, np.where(kymin < 0,
                                       np.minimum(-kymin, h - 1), 0.0))
        y0p = np.minimum(y0p, np.where(kymax > h - 1,
                                       np.maximum(2 * (h - 1) - kymax, 0.0),
                                       h - 1.0))
    x0p = np.where(empty, 0.0, x0p)
    y0p = np.where(empty, 0.0, y0p)
    # quantize the static patch size so nearby warps (per-combo pre-warps
    # whose bbox shifts by a pixel or two) reuse one compiled program —
    # remote TPU compiles are minutes and flaky (CLAUDE.md)
    Px = int(max(np.max(x1p - x0p) + 1, 1))
    Py = int(max(np.max(y1p - y0p) + 1, 1))
    Px = min(-(-Px // 8) * 8, w)
    Py = min(-(-Py // 8) * 8, h)
    if Px > min(max_patch, w) or Py > min(max_patch, h):
        return None
    starts = np.stack([np.clip(y0p, 0, h - Py),
                       np.clip(x0p, 0, w - Px)], axis=-1).astype(np.int32)
    out = _upsample_eval(
        image, xp_, yp_, jnp.asarray(starts), jnp.asarray(cval, image.dtype),
        order=order, th=th, tw=tw, n_ty=n_ty, n_tx=n_tx,
        Py=Py, Px=Px, h=h, w=w)
    return out[:H, :W]


def interpol2d(image, x, y, fill=jnp.nan, order: int = 2, dst=None):
    """API-compatible stand-in for ``AlignCommonUtil.interpol2d``
    (``Util.py:82-104``): note the (x, y) argument order."""
    out = sample_image(image, x, y, order=order, cval=fill)
    if dst is not None:
        dst[...] = out
        return None
    return out
