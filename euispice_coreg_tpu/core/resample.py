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


def interpol2d(image, x, y, fill=jnp.nan, order: int = 2, dst=None):
    """API-compatible stand-in for ``AlignCommonUtil.interpol2d``
    (``Util.py:82-104``): note the (x, y) argument order."""
    out = sample_image(image, x, y, order=order, cval=fill)
    if dst is not None:
        dst[...] = out
        return None
    return out
