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

import jax
import jax.numpy as jnp


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


def interpol2d(image, x, y, fill=jnp.nan, order: int = 2, dst=None):
    """API-compatible stand-in for ``AlignCommonUtil.interpol2d``
    (``Util.py:82-104``): note the (x, y) argument order."""
    out = sample_image(image, x, y, order=order, cval=fill)
    if dst is not None:
        dst[...] = out
        return None
    return out
