"""Pallas TPU kernel: fused per-lag warp + masked-Pearson partial sums.

The general (non-FFT) engine's per-lag work is "shifted-WCS resample + masked
correlation".  The XLA select-path (core/resample.sample_image_select) already
avoids the ~7 cycles/element hardware gather, but it must use a select radius
covering the residual displacement over the WHOLE image (rotation lags make it
~20 px at 2k^2).  This kernel tiles the image and re-bases each tile on its
own integer displacement, shrinking the radius to the within-tile residual
(~2-3 px) — ~30x less select work — and keeps every intermediate in VMEM:

  grid = (lags, tiles_y, tiles_x)
  per step: DMA the source block at (tile origin + per-lag-per-tile shift),
            compute the shifted-WCS coordinates for the tile from the lon/lat
            blocks (VPU trig), sample via static-slice select, and accumulate
            the 6 masked-Pearson sums for the lag.

The per-tile integer shift rides in the DMA start (aligned down to the
(8, 128) float32 tiling; only the remainder is re-centered with dynamic
rolls), so the block margins are set by the within-tile residual alone — the
global shift bound only grows the HBM canvas padding, not the per-step DMA.

Host wrapper: :func:`evaluate_lag_grid_pallas` (same contract as the other
engine evaluators; exact sample_image semantics incl. mirror taps).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core import wcs
from . import pallas_common as pc
from .pallas_common import OUT_LANES, TILE


def _make_kernel(mx, my, mm_y, mm_x, pad, hw_img, order, kind):
    h_img, w_img = hw_img

    def kernel(lag_ref, shift_ref, base_ref, small_hbm, ref_tile, lon_tile,
               lat_tile, out_ref, block, sem):
        ty = pl.program_id(1)
        tx = pl.program_id(2)

        sx = shift_ref[0, 0, 0, 0, 0]
        sy = shift_ref[0, 0, 0, 0, 1]
        # fold the NEAREST-(8, 128)-multiple part of the per-tile shift into
        # the DMA start (provably aligned since pad, mm_* and TILE are
        # multiples); re-center the balanced remainder with dynamic rolls
        sx_al, sy_al, remx, remy = pc.fold_shift(sx, sy)
        bh = TILE + 2 * mm_y
        bw = TILE + 2 * mm_x
        start_y = pl.multiple_of(ty * TILE + pad - mm_y + sy_al, 8)
        start_x = pl.multiple_of(tx * TILE + pad - mm_x + sx_al, 128)
        dma = pltpu.make_async_copy(
            small_hbm.at[pl.ds(start_y, bh), pl.ds(start_x, bw)],
            block,
            sem,
        )
        dma.start()

        # shifted WCS params for this lag (scalars from SMEM)
        d0, d1, d2 = lag_ref[0, 0, 0], lag_ref[0, 0, 1], lag_ref[0, 0, 2]
        d3, d4 = lag_ref[0, 0, 3], lag_ref[0, 0, 4]
        crval1 = base_ref[0, 0] + d0
        crval2 = base_ref[0, 1] + d1
        cdelt1 = base_ref[0, 4] + d2
        cdelt2 = base_ref[0, 5] + d3
        crota = base_ref[0, 10] + d4
        rebuild = (d2 != 0) | (d3 != 0) | (d4 != 0)
        rho = crota * wcs.RAD_PER_DEG
        lam = cdelt2 / cdelt1
        params = {
            "crval1": crval1, "crval2": crval2,
            "crpix1": base_ref[0, 2], "crpix2": base_ref[0, 3],
            "cdelt1": cdelt1, "cdelt2": cdelt2,
            "pc11": jnp.where(rebuild, jnp.cos(rho), base_ref[0, 6]),
            "pc12": jnp.where(rebuild, -lam * jnp.sin(rho), base_ref[0, 7]),
            "pc21": jnp.where(rebuild, jnp.sin(rho) / lam, base_ref[0, 8]),
            "pc22": jnp.where(rebuild, jnp.cos(rho), base_ref[0, 9]),
        }
        x, y = wcs.world_to_pixel(params, lon_tile[:], lat_tile[:], kind=kind)

        jj_i = (tx * TILE) + jax.lax.broadcasted_iota(jnp.int32, (TILE, TILE), 1)
        ii_i = (ty * TILE) + jax.lax.broadcasted_iota(jnp.int32, (TILE, TILE), 0)
        jj = jj_i.astype(jnp.float32)
        ii = ii_i.astype(jnp.float32)

        invalid = (jnp.isnan(x) | jnp.isnan(y)
                   | (x < 0) | (x > w_img - 1) | (y < 0) | (y > h_img - 1))
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
                                order=order)
        vals = pc.pearson_partial_sums(ref_tile[:], sampled, invalid)

        @pl.when((ty == 0) & (tx == 0))
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

        out_ref[:] = out_ref[:] + vals

    return kernel


def warp_score_sums(small_padded, ref_img, lon, lat, base_vec, lags, shifts,
                    *, mx, my, pad, hw_img, order=2, kind="tan",
                    interpret=False):
    """(L, OUT_LANES) raw masked sums [n, Sa, Saa, Sb, Sbb, Sab, ...] per lag."""
    ht, wt = ref_img.shape
    n_ty, n_tx = ht // TILE, wt // TILE
    L = lags.shape[0]
    fn = _warp_eval(mx, my, pad, hw_img, order, kind, n_ty, n_tx, L,
                    interpret)
    out = fn(lags.reshape(L, 1, 5), shifts.reshape(L, n_ty, n_tx, 1, 2),
             base_vec, small_padded, ref_img, lon, lat)
    return out.reshape(L, OUT_LANES)


@functools.lru_cache(maxsize=32)
def _warp_eval(mx, my, pad, hw_img, order, kind, n_ty, n_tx, L, interpret):
    """Memoized jitted pallas evaluator (a fresh pallas_call per alignment
    re-traced the program and paid a remote compile-cache round-trip)."""
    # margins cover the within-tile residual + spline taps + the balanced
    # sub-tiling remainder of the shift (the aligned part rides in the DMA
    # start)
    mm_y, mm_x = pc.balanced_margins(mx, my)
    kernel = _make_kernel(mx, my, mm_y, mm_x, pad, hw_img, order, kind)

    def run(lags, shifts, base_vec, small_padded, ref_img, lon, lat):
        return pl.pallas_call(
            kernel,
            grid=(L, n_ty, n_tx),
            in_specs=[
                pl.BlockSpec((1, 1, 5), lambda l, ty, tx: (l, 0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, 1, 1, 1, 2),
                             lambda l, ty, tx: (l, ty, tx, 0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, 12), lambda l, ty, tx: (0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec((TILE, TILE), lambda l, ty, tx: (ty, tx),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((TILE, TILE), lambda l, ty, tx: (ty, tx),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((TILE, TILE), lambda l, ty, tx: (ty, tx),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, 1, OUT_LANES),
                                   lambda l, ty, tx: (l, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((L, 1, OUT_LANES), jnp.float32),
            scratch_shapes=[
                pltpu.VMEM((TILE + 2 * mm_y, TILE + 2 * mm_x), jnp.float32),
                pltpu.SemaphoreType.DMA,
            ],
            interpret=interpret,
        )(lags, shifts, base_vec, small_padded, ref_img, lon, lat)

    return jax.jit(run)


def evaluate_lag_grid_pallas(
    small_img, ref_img, lon, lat, base_params,
    lag_crval1, lag_crval2, lag_cdelt1, lag_cdelt2, lag_crota,
    *, order=2, method="correlation", kind="tan", interpret=None,
    max_residual=8,
):
    """Engine-compatible evaluator backed by the Pallas kernel.

    Returns the (n1..n5) float64 hypercube, or None when preconditions fail
    (residual bound exceeded, unsupported method/order, mismatched shapes).
    ``interpret=None`` auto-selects interpret mode on CPU backends so
    ``lag_search_mode="pallas"`` works (slowly) without a TPU.
    """
    if method != "correlation" or order not in (0, 1, 2):
        return None
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    l1 = np.asarray(lag_crval1, dtype=np.float64)
    l2 = np.asarray(lag_crval2, dtype=np.float64)
    l3 = np.asarray(lag_cdelt1, dtype=np.float64)
    l4 = np.asarray(lag_cdelt2, dtype=np.float64)
    l5 = np.asarray(lag_crota, dtype=np.float64)
    shape5 = (len(l1), len(l2), len(l3), len(l4), len(l5))
    grids = np.meshgrid(l1, l2, l3, l4, l5, indexing="ij")
    lags = np.stack([g.ravel() for g in grids], axis=-1)
    L = lags.shape[0]

    # single host pull (small_img may be a cached device array; the canvas
    # is assembled on host, so pull once instead of once per use below)
    small_np = np.asarray(small_img, dtype=np.float32)
    h, w = small_np.shape
    if np.shape(ref_img) != (h, w):
        return None

    ht = -(-h // TILE) * TILE
    wt = -(-w // TILE) * TILE
    n_ty, n_tx = ht // TILE, wt // TILE

    lon_np = np.asarray(lon, dtype=np.float64)
    lat_np = np.asarray(lat, dtype=np.float64)

    # 3x3 probe points per tile (corners + center, clipped into the image)
    def axis_probes(n_t, n):
        pts = np.zeros((n_t, 3), dtype=np.int64)
        for t in range(n_t):
            pts[t] = (min(t * TILE + TILE // 2, n - 1),
                      min(t * TILE, n - 1),
                      min((t + 1) * TILE - 1, n - 1))
        return pts

    py = axis_probes(n_ty, h)  # (n_ty, 3)
    px = axis_probes(n_tx, w)  # (n_tx, 3)
    pyg, pxg = np.meshgrid(py.ravel(), px.ravel(), indexing="ij")
    pl_ = lon_np[pyg.ravel(), pxg.ravel()]
    pb_ = lat_np[pyg.ravel(), pxg.ravel()]
    disp = _displacements(base_params, lags, pl_, pb_,
                          pxg.ravel().astype(np.float64),
                          pyg.ravel().astype(np.float64), kind)
    disp = disp.reshape(L, n_ty, 3, n_tx, 3, 2)
    center = disp[:, :, 0, :, 0, :]  # (L, n_ty, n_tx, 2)
    if not np.isfinite(disp).all():
        return None
    # per-axis within-tile spreads (probe-based; +1 covers probe gaps)
    dev = np.abs(disp - center[:, :, None, :, None, :])
    mx = int(np.ceil(float(np.max(dev[..., 0])))) + 1
    my = int(np.ceil(float(np.max(dev[..., 1])))) + 1
    if max(mx, my) > max_residual:
        return None
    shifts = np.floor(center + 0.5).astype(np.int32)
    g_bound = int(np.max(np.abs(shifts)))
    if g_bound > min(h, w):
        return None
    _, mm_x = pc.balanced_margins(mx, my)
    # HBM canvas padding covers the farthest DMA reach (aligned shift +
    # margins); multiple of 128 so the DMA starts stay provably aligned
    pad = pc.canvas_pad(mm_x, g_bound)

    # canvas padded to tile multiples (NaN outside the field), then
    # mirror-padded 2 px around the REAL image region (order<=2 spline taps
    # reach at most 1 px past an in-range coordinate; scipy mirror rule)
    pe = min(2, h - 1, w - 1)
    refl = np.pad(small_np, ((pe, pe), (pe, pe)), mode="reflect")
    padded = np.full((ht + 2 * pad, wt + 2 * pad), np.nan, dtype=np.float32)
    padded[pad - pe: pad + h + pe, pad - pe: pad + w + pe] = refl

    ref32 = np.full((ht, wt), np.nan, dtype=np.float32)
    ref32[:h, :w] = np.asarray(ref_img, dtype=np.float32)
    lon32 = np.zeros((ht, wt), dtype=np.float32)
    lat32 = np.zeros((ht, wt), dtype=np.float32)
    lon32[:h, :w] = lon_np
    lat32[:h, :w] = lat_np

    # pre-centering: exact for Pearson, avoids f32 cancellation
    amean = float(np.nanmean(ref32))
    # any centering constant is exact for Pearson (mean-removed anyway);
    # the f32-cast mean only serves f32 cancellation, so no second pull
    bmean = float(np.nanmean(small_np.astype(np.float64)))
    ref32 = ref32 - amean
    padded = padded - bmean

    base_vec = np.array([[
        base_params["crval1"], base_params["crval2"],
        base_params["crpix1"], base_params["crpix2"],
        base_params["cdelt1"], base_params["cdelt2"],
        base_params["pc11"], base_params["pc12"],
        base_params["pc21"], base_params["pc22"],
        base_params.get("crota", 0.0), 0.0,
    ]], dtype=np.float32)

    sums = np.asarray(warp_score_sums(
        jnp.asarray(padded), jnp.asarray(ref32), jnp.asarray(lon32),
        jnp.asarray(lat32), jnp.asarray(base_vec),
        jnp.asarray(lags, dtype=np.float32), jnp.asarray(shifts),
        mx=mx, my=my, pad=pad, hw_img=(h, w), order=order, kind=kind,
        interpret=interpret,
    ), dtype=np.float64)

    r = pc.pearson_from_sums(sums)
    return r.reshape(shape5)


def _displacements(base, lags, pl_, pb_, px0, py0, kind):
    """(L, npts, 2) displacement of sample coordinates vs grid indices."""
    crval1 = base["crval1"] + lags[:, 0]
    crval2 = base["crval2"] + lags[:, 1]
    cdelt1 = base["cdelt1"] + lags[:, 2]
    cdelt2 = base["cdelt2"] + lags[:, 3]
    crota = base.get("crota", 0.0) + lags[:, 4]
    rebuild = (lags[:, 2] != 0) | (lags[:, 3] != 0) | (lags[:, 4] != 0)
    rho = np.deg2rad(crota)
    lam = cdelt2 / cdelt1
    p = {
        "crval1": crval1[:, None], "crval2": crval2[:, None],
        "crpix1": float(base["crpix1"]), "crpix2": float(base["crpix2"]),
        "cdelt1": cdelt1[:, None], "cdelt2": cdelt2[:, None],
        "pc11": np.where(rebuild, np.cos(rho), base["pc11"])[:, None],
        "pc12": np.where(rebuild, -lam * np.sin(rho), base["pc12"])[:, None],
        "pc21": np.where(rebuild, np.sin(rho) / lam, base["pc21"])[:, None],
        "pc22": np.where(rebuild, np.cos(rho), base["pc22"])[:, None],
    }
    bx, by = wcs.world_to_pixel(p, pl_[None, :], pb_[None, :], kind=kind, xp=np)
    return np.stack([bx - px0[None, :], by - py0[None, :]], axis=-1)
