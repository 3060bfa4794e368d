"""Pallas TPU kernel: fused quadratic-displacement warp + masked Pearson.

The Carrington select engine (``engine/carrington._carrington_select``) fits
each lag's conjugated displacement field with a quadratic map in the grid
indices — coefficients ``(L, 6, 2)`` for ``[x, y, 1, x^2, y^2, x*y] ->
(dx, dy)``.  The XLA select evaluator materializes the quadratic field, the
spline weights and the residual masks in HBM per lag (~1 GB of traffic per
lag at 2048^2) and must size its select window by the residual over the
WHOLE image (m up to ~24 for corner lags).

This kernel removes both costs:

* every intermediate lives in VMEM — grid = (lags, tiles_y, tiles_x), one
  (TILE, TILE) output tile per step;
* each tile is re-based on its own per-lag integer shift, so the select
  radius is the *within-tile* residual (~2-3 px even for corner lags):
  O((2m+3)^2) window passes with m ~ 2 instead of m ~ 24;
* the integer shift itself rides in the DMA start (folded to the nearest
  (8, 128) float32 tiling multiple; only the balanced remainder is applied
  with dynamic rolls), so the block margins stay small no matter how large
  the global shift is.

Numerics match ``core.resample.sample_image_select`` on the quadratic field
(mirror taps at the image edge, NaN fill outside, residual-bound masking) —
pinned by interpret-mode parity tests against the XLA select evaluator.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import pallas_common as pc
from .pallas_common import OUT_LANES, TILE


def _make_kernel(mx, my, mm_y, mm_x, pad, hw_grid, order, method,
                 th=TILE, tw=TILE):
    h, w = hw_grid

    def kernel(coef_ref, shift_ref, warped_hbm, ref_tile, out_ref, block, sem):
        ty = pl.program_id(1)
        tx = pl.program_id(2)

        sx = shift_ref[0, 0, 0, 0, 0]
        sy = shift_ref[0, 0, 0, 0, 1]
        # fold the NEAREST-(8, 128)-multiple part of the shift into the DMA
        # start (provably aligned since pad, mm_* and TILE are multiples);
        # only the balanced remainder is re-centered with dynamic rolls
        sx_al, sy_al, remx, remy = pc.fold_shift(sx, sy)
        bh = th + 2 * mm_y
        bw = tw + 2 * mm_x
        start_y = pl.multiple_of(ty * th + pad - mm_y + sy_al, 8)
        start_x = pl.multiple_of(tx * tw + pad - mm_x + sx_al, 128)
        dma = pltpu.make_async_copy(
            warped_hbm.at[pl.ds(start_y, bh), pl.ds(start_x, bw)],
            block,
            sem,
        )
        dma.start()

        # quadratic displacement of this tile (VPU polynomial, no trig)
        jj_i = (tx * tw) + jax.lax.broadcasted_iota(jnp.int32, (th, tw), 1)
        ii_i = (ty * th) + jax.lax.broadcasted_iota(jnp.int32, (th, tw), 0)
        jj = jj_i.astype(jnp.float32)
        ii = ii_i.astype(jnp.float32)
        c = coef_ref
        dx = (c[0, 0, 0] * jj + c[0, 0, 1] * ii + c[0, 0, 2]
              + c[0, 0, 3] * jj * jj + c[0, 0, 4] * ii * ii
              + c[0, 0, 5] * jj * ii)
        dy = (c[0, 0, 6] * jj + c[0, 0, 7] * ii + c[0, 0, 8]
              + c[0, 0, 9] * jj * jj + c[0, 0, 10] * ii * ii
              + c[0, 0, 11] * jj * ii)
        x = jj + dx
        y = ii + dy

        invalid = (jnp.isnan(x) | jnp.isnan(y)
                   | (x < 0) | (x > w - 1) | (y < 0) | (y > h - 1))
        xs = jnp.where(invalid, jj, x)
        ys = jnp.where(invalid, ii, y)

        kx, ky, wx_list, wy_list = pc.fractional_parts(xs, ys, order)

        rx = kx.astype(jnp.int32) - jj_i - sx
        ry = ky.astype(jnp.int32) - ii_i - sy
        res_ok = (jnp.abs(rx) <= mx) & (jnp.abs(ry) <= my)
        invalid = invalid | ~res_ok
        rx = jnp.clip(rx, -mx, mx)
        ry = jnp.clip(ry, -my, my)

        dma.wait()
        # re-center the remainder: after this, blk[mm_y + u, mm_x + v] is the
        # source pixel at (tile row + sy + u, tile col + sx + v)
        blk = pltpu.roll(block[:], jnp.mod(bh - remy, bh), 0)
        blk = pltpu.roll(blk, jnp.mod(bw - remx, bw), 1)

        sampled = pc.select_mix(blk, rx, ry, wx_list, wy_list,
                                mx=mx, my=my, mm_y=mm_y, mm_x=mm_x,
                                order=order, th=th, tw=tw)
        if method == "correlation":
            vals = pc.pearson_partial_sums(ref_tile[:], sampled, invalid)
        else:  # residus_masked
            vals = pc.residus_partial_sums(ref_tile[:], sampled, invalid)

        @pl.when((ty == 0) & (tx == 0))
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

        out_ref[:] = out_ref[:] + vals

    return kernel


import functools


@functools.lru_cache(maxsize=32)
def _build_eval(mx, my, mm_y, mm_x, pad, hw_grid, order, method, n_ty, n_tx,
                interpret, mesh=None, th=TILE, tw=TILE):
    """One jitted evaluator instance, memoized on the full static signature:
    reused across lag chunks AND across evaluator calls (a fresh kernel
    closure per call re-traced the whole pallas program and paid a remote
    compile-cache round-trip — seconds per alignment on tunneled TPUs).
    With ``mesh`` the lag axis is sharded across the devices with
    ``shard_map`` (canvases replicated in every chip's HBM; each device runs
    the kernel on its lag sub-grid — the TPU-native form of the reference's
    process fan-out, alignment.py:634-756)."""
    kernel = _make_kernel(mx, my, mm_y, mm_x, pad, hw_grid, order, method,
                          th=th, tw=tw)

    def run(coeffs12, shifts, canvas, ref_canvas):
        L = coeffs12.shape[0]
        out = pl.pallas_call(
            kernel,
            grid=(L, n_ty, n_tx),
            in_specs=[
                pl.BlockSpec((1, 1, 12), lambda l, ty, tx: (l, 0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, 1, 1, 1, 2), lambda l, ty, tx: (l, ty, tx, 0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec((th, tw), lambda l, ty, tx: (ty, tx),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, 1, OUT_LANES), lambda l, ty, tx: (l, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((L, 1, OUT_LANES), jnp.float32),
            scratch_shapes=[
                pltpu.VMEM((th + 2 * mm_y, tw + 2 * mm_x), jnp.float32),
                pltpu.SemaphoreType.DMA,
            ],
            interpret=interpret,
        )(coeffs12, shifts, canvas, ref_canvas)
        return out.reshape(L, OUT_LANES)

    if mesh is None:
        return jax.jit(run)

    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    return jax.jit(shard_map(
        run, mesh=mesh,
        in_specs=(P("lags"), P("lags"), P(), P()),
        out_specs=P("lags"),
        # pallas_call's out_shape carries no varying-mesh-axes annotation
        check_vma=False))


@functools.partial(jax.jit, static_argnames=("ht", "wt", "pad", "pe",
                                             "center", "h", "w"))
def _build_canvases(wp, rf, *, ht, wt, pad, pe, center, h, w):
    """Module-level jitted canvas builder (a per-call closure re-traced and
    paid a remote compile-cache lookup on every alignment)."""
    amean = jnp.nanmean(rf) if center else jnp.float32(0.0)
    bmean = jnp.nanmean(wp) if center else jnp.float32(0.0)
    refl = jnp.pad(wp - bmean, pe, mode="reflect")
    canvas = jnp.full((ht + 2 * pad, wt + 2 * pad), jnp.nan, jnp.float32)
    canvas = canvas.at[pad - pe: pad + h + pe,
                       pad - pe: pad + w + pe].set(refl)
    ref_canvas = jnp.full((ht, wt), jnp.nan, jnp.float32)
    ref_canvas = ref_canvas.at[:h, :w].set(rf - amean)
    return canvas, ref_canvas


def _tile_bounds(coeffs, h, w, n_ty, n_tx, th=TILE, tw=TILE):
    """(dev_x, dev_y, g_bound) via corner/worst-case analysis only — no
    (L, n_tiles) arrays at all (the shifts themselves are computed on
    device by :func:`_device_tile_shifts`).

    ``g_bound`` is a slightly conservative bound on max |shift|: bilinear
    part maxed over the 4 corner tile centers plus the pure-quadratic
    worst case over the whole center rectangle.
    """
    dev_l = _tile_bounds_per_lag(coeffs, h, w, n_ty, n_tx, th=th, tw=tw)
    dev_x = float(np.max(dev_l[:, 0])) if dev_l.size else 0.0
    dev_y = float(np.max(dev_l[:, 1])) if dev_l.size else 0.0
    g_bound = _shift_bound(coeffs, h, w, n_ty, n_tx, th=th, tw=tw)
    return dev_x, dev_y, g_bound


def _tile_bounds_per_lag(coeffs, h, w, n_ty, n_tx, th=TILE, tw=TILE):
    """Per-lag within-tile deviation bound (L, 2) in (x, y) order — the
    max-over-lags of this is :func:`_tile_bounds`'s (dev_x, dev_y).  The
    per-lag form drives the hybrid Carrington fallback: the deviation
    scales ~linearly with the lag magnitude, so the inner part of a lag
    grid usually passes the tile-FFT gate even when the corner lags force
    the exact kernel (engine/carrington._carrington_select)."""
    L = coeffs.shape[0]
    u0 = 0.5 * (0 + min(tw - 1, w - 1))
    u1 = 0.5 * ((n_tx - 1) * tw + min(n_tx * tw - 1, w - 1))
    v0 = 0.5 * (0 + min(th - 1, h - 1))
    v1 = 0.5 * ((n_ty - 1) * th + min(n_ty * th - 1, h - 1))
    uu, vv = np.meshgrid([u0, u1], [v0, v1], indexing="ij")
    uu, vv = uu.ravel(), vv.ravel()                           # (4,)
    ck = np.ascontiguousarray(coeffs.transpose(0, 2, 1)).reshape(L * 2, 6)

    one = np.ones_like(uu)
    zero = 0 * uu
    basis_gu = np.stack([one, zero, zero, 2.0 * uu, zero, vv])
    basis_gv = np.stack([zero, one, zero, zero, 2.0 * vv, uu])
    hx_m, hy_m = 0.5 * (tw - 1), 0.5 * (th - 1)
    gu = np.abs((ck @ basis_gu).reshape(L, 2, -1))
    gv = np.abs((ck @ basis_gv).reshape(L, 2, -1))
    quad = (np.abs(coeffs[:, 3, :, None]) * (hx_m * hx_m)
            + np.abs(coeffs[:, 4, :, None]) * (hy_m * hy_m)
            + np.abs(coeffs[:, 5, :, None]) * (hx_m * hy_m))
    dev = gu * hx_m + gv * hy_m + quad                        # (L, 2, 4)
    return dev.max(axis=2)                                    # (L, 2) x/y


def _shift_bound(coeffs, h, w, n_ty, n_tx, th=TILE, tw=TILE):
    """Conservative bound on max |tile-center shift| over all lags/tiles:
    bilinear part maxed over the 4 corner tile centers plus the pure
    -quadratic worst case over the whole center rectangle."""
    L = coeffs.shape[0]
    u0 = 0.5 * (0 + min(tw - 1, w - 1))
    u1 = 0.5 * ((n_tx - 1) * tw + min(n_tx * tw - 1, w - 1))
    v0 = 0.5 * (0 + min(th - 1, h - 1))
    v1 = 0.5 * ((n_ty - 1) * th + min(n_ty * th - 1, h - 1))
    uu, vv = np.meshgrid([u0, u1], [v0, v1], indexing="ij")
    uu, vv = uu.ravel(), vv.ravel()                           # (4,)
    ck = np.ascontiguousarray(coeffs.transpose(0, 2, 1)).reshape(L * 2, 6)
    one = np.ones_like(uu)
    zero = 0 * uu
    basis_bil = np.stack([uu, vv, one, zero, zero, zero])
    bil = np.abs((ck @ basis_bil))                            # (L*2, 4)
    umax, vmax = max(abs(u0), abs(u1)), max(abs(v0), abs(v1))
    quad_res = (np.abs(coeffs[:, 3, :]) * umax * umax
                + np.abs(coeffs[:, 4, :]) * vmax * vmax
                + np.abs(coeffs[:, 5, :]) * umax * vmax)
    return int(np.ceil(np.max(bil) + np.max(quad_res) + 0.5)) \
        if bil.size else 0


@functools.partial(jax.jit,
                   static_argnames=("n_ty", "n_tx", "th", "tw", "h", "w"))
def _device_tile_shifts(coeffs12, *, n_ty, n_tx, th, tw, h, w):
    """Per-lag per-tile integer shifts computed ON DEVICE from the (L, 1, 12)
    f32 coefficient rows: the (L, n_tiles, 2) table never exists on the host
    (fresh multi-MB host allocations page-fault for seconds on constrained
    hosts, and the table would be re-uploaded through the tunnel anyway).
    Uses the same f32 arithmetic as the kernel's in-tile polynomial."""
    c = coeffs12[:, 0, :]                                     # (L, 12)
    x_lo = jnp.arange(n_tx, dtype=jnp.float32) * tw
    x_hi = jnp.minimum(x_lo + tw - 1, w - 1)
    y_lo = jnp.arange(n_ty, dtype=jnp.float32) * th
    y_hi = jnp.minimum(y_lo + th - 1, h - 1)
    U = jnp.broadcast_to((0.5 * (x_lo + x_hi))[None, :], (n_ty, n_tx))
    V = jnp.broadcast_to((0.5 * (y_lo + y_hi))[:, None], (n_ty, n_tx))

    def center(k):
        c0, c1, c2 = c[:, 6 * k + 0], c[:, 6 * k + 1], c[:, 6 * k + 2]
        c3, c4, c5 = c[:, 6 * k + 3], c[:, 6 * k + 4], c[:, 6 * k + 5]
        e = lambda q: q[:, None, None]
        return (e(c0) * U + e(c1) * V + e(c2) + e(c3) * U * U
                + e(c4) * V * V + e(c5) * U * V)

    sx = jnp.floor(center(0) + 0.5).astype(jnp.int32)
    sy = jnp.floor(center(1) + 0.5).astype(jnp.int32)
    return jnp.stack([sx, sy], axis=-1).reshape(
        c.shape[0], n_ty, n_tx, 1, 2)


def evaluate_select_carr_pallas(coeffs, warped, ref_img, *, order, h, w,
                                method="correlation", interpret=None,
                                max_m=6, chunk=2048, mesh=None,
                                supertile=None):
    """Score ``L`` quadratic-displacement lags against ``ref_img``.

    Args:
      coeffs: (L, 6, 2) float64 quadratic map ``[x, y, 1, x^2, y^2, x*y] ->
        (dx, dy)`` in grid pixels (the ``_carrington_select`` fit).
      warped: (h, w) pre-warped image sampled per lag (device or host array).
      ref_img: (h, w) reference on the same grid.

    Returns (L,) float64 Pearson r, or None when preconditions fail
    (within-tile residual bound exceeded, unsupported method/order, shifts
    larger than the image).  ``interpret=None`` auto-selects interpret mode
    on CPU backends.
    """
    if method not in ("correlation", "residus_masked") or order not in (0, 1, 2):
        return None
    if interpret is None:
        if mesh is not None:
            # a virtual CPU mesh can exist under a TPU-pinned process
            interpret = mesh.devices.ravel()[0].platform == "cpu"
        else:
            interpret = jax.default_backend() == "cpu"
    coeffs = np.asarray(coeffs, dtype=np.float64)
    L = coeffs.shape[0]

    # integer residual bound: for order 0/2 the sample tap anchor
    # floor(.+0.5) matches the shift's rounding, so |k - shift| <=
    # ceil(dev); order 1 anchors at floor(.) half a pixel off, costing one
    # more (1e-3 covers f32 in-kernel polynomial evaluation vs the f64
    # host bound)
    extra = 1 if order == 1 else 0
    n_taps, _ = pc.order_taps(order)

    def tiling(th, tw):
        n_ty = -(-h // th)
        n_tx = -(-w // tw)
        dev_x, dev_y, g_bound = _tile_bounds(
            coeffs, h, w, n_ty, n_tx, th=th, tw=tw)
        mx = max(1, int(np.ceil(dev_x + 1e-3)) + extra)
        my = max(1, int(np.ceil(dev_y + 1e-3)) + extra)
        cost = (2 * mx + n_taps) * (2 * my + n_taps)
        return dict(th=th, tw=tw, n_ty=n_ty, n_tx=n_tx,
                    g_bound=g_bound, mx=mx, my=my, cost=cost)

    # 2x2 super-tiles quarter the per-grid-step overhead and cut per-pixel
    # DMA ~1.5x, but only pay off while the larger tile's residual bound
    # doesn't grow the select-window count (supertile=None auto-picks by
    # window-count cost; 1/2 force a tiling, for parity tests)
    t1 = tiling(TILE, TILE)
    pick = t1
    if supertile != 1 and min(h, w) >= 2 * TILE:
        t2 = tiling(2 * TILE, 2 * TILE)
        if supertile == 2 or t2["cost"] <= t1["cost"]:
            pick = t2
    th, tw = pick["th"], pick["tw"]
    n_ty, n_tx = pick["n_ty"], pick["n_tx"]
    g_bound = pick["g_bound"]
    mx, my = pick["mx"], pick["my"]
    ht, wt = n_ty * th, n_tx * tw
    if max(mx, my) > max_m or g_bound > min(h, w):
        return None

    mm_y, mm_x = pc.balanced_margins(mx, my)
    pad = pc.canvas_pad(mm_x, g_bound)

    # canvas assembled ON DEVICE (never ship the padded field through the
    # host tunnel): NaN outside, image mirror-padded 2 px about its real
    # region (order<=2 taps reach at most 1 px past an in-range coordinate)
    pe = min(2, h - 1, w - 1)
    if mesh is not None:
        # place on the mesh devices, never the default device (the mesh may
        # live on a non-default backend; see lag_search.mesh_put)
        from .lag_search import mesh_put

        warped_d = mesh_put(warped, mesh, dtype=jnp.float32)
        ref_d = mesh_put(ref_img, mesh, dtype=jnp.float32)
    else:
        warped_d = jnp.asarray(warped, dtype=jnp.float32)
        ref_d = jnp.asarray(ref_img, dtype=jnp.float32)

    # pre-centering is exact for Pearson (and avoids f32 cancellation in
    # the raw sums) but must NOT be applied for residue scores, which need
    # the raw values in (a - b)/sqrt(a)
    center = method == "correlation"

    canvas, ref_canvas = _build_canvases(warped_d, ref_d, ht=ht, wt=wt,
                                         pad=pad, pe=pe, center=center,
                                         h=h, w=w)

    cf = coeffs.astype(np.float32)
    coeffs12_host = np.concatenate([cf[:, :, 0], cf[:, :, 1]],
                                   axis=1).reshape(L, 1, 12)
    if mesh is not None:
        from .lag_search import mesh_put

        coeffs12 = mesh_put(coeffs12_host, mesh)
    else:
        coeffs12 = jnp.asarray(coeffs12_host)
    # shift table computed and kept on device (never materialized on host)
    shifts_k = _device_tile_shifts(coeffs12, n_ty=n_ty, n_tx=n_tx,
                                   th=th, tw=tw, h=h, w=w)

    if mesh is not None:
        ndev = mesh.devices.size
        chunk = -(-chunk // ndev) * ndev  # chunks split evenly over devices

    from . import lag_search

    # Per-lag margin buckets: the within-tile residual scales ~linearly
    # with the lag magnitude, so on wide grids the central lags need m ~ 1
    # while only the corner ring needs the global (mx, my).  The select
    # window count — the kernel's dominant cost — is (2mx+nt)(2my+nt), a
    # 9x swing between m=1 and m=6; one memoized kernel instance per
    # distinct level keeps every lag at (near) its own residual.  The
    # canvas/pad stay GLOBAL (any pad >= a bucket's requirement is valid
    # and keeps the DMA starts (8, 128)-aligned: mm_y | 8, mm_x | 128).
    per_lag = _tile_bounds_per_lag(coeffs, h, w, n_ty, n_tx, th=th, tw=tw)
    mx_l = np.maximum(1, np.ceil(per_lag[:, 0] + 1e-3).astype(np.int64)
                      + extra)
    my_l = np.maximum(1, np.ceil(per_lag[:, 1] + 1e-3).astype(np.int64)
                      + extra)
    m_eff = np.maximum(mx_l, my_l)
    levels = [lv for lv in (1, 2, 4, max_m) if lv <= max(mx, my)]
    if not levels or levels[-1] < max(mx, my):
        levels.append(max(mx, my))
    lvl_of = np.empty(L, dtype=np.int64)
    for lv in reversed(levels):
        lvl_of[m_eff <= lv] = lv

    sums = np.empty((L, OUT_LANES), dtype=np.float64)
    for lv in sorted(set(lvl_of.tolist())):
        idx = np.nonzero(lvl_of == lv)[0]
        mx_b, my_b = min(mx, int(lv)), min(my, int(lv))
        mm_y_b, mm_x_b = pc.balanced_margins(mx_b, my_b)
        fn = _build_eval(mx_b, my_b, mm_y_b, mm_x_b, pad, (h, w), order,
                         method, n_ty, n_tx, interpret, mesh=mesh,
                         th=th, tw=tw)
        part = lag_search.run_chunked(
            lambda c12, sh: fn(c12, sh, canvas, ref_canvas),
            [coeffs12[idx], shifts_k[idx]], idx.size,
            min(chunk, max(int(idx.size), 1)),
            label=f"carrington pallas lag search (mx={mx_b}, my={my_b})")
        # (run_chunked pads the tail chunk, so sharded runs always see
        # full per-device slices)
        sums[idx] = np.asarray(part, dtype=np.float64)
    if method == "correlation":
        return pc.pearson_from_sums(sums)
    return pc.residus_from_sums(sums)
