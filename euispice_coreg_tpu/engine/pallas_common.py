"""Shared building blocks for the Pallas fused warp+score kernels.

Both TPU kernels (``pallas_warp`` — per-lag WCS displacement, and
``pallas_quad`` — per-lag quadratic displacement for the Carrington select
path) share the same inner sampler: given a VMEM block holding the source
pixels re-based on the tile's integer shift, sample every output pixel of the
tile via statically-shifted windows selected by the bounded integer residual
(the Pallas form of :func:`core.resample.sample_image_select`).

Everything here runs inside a Pallas kernel body (Mosaic TPU restrictions:
no scatter, static slice shapes, ``pltpu.roll`` for lane/sublane shifts).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

TILE = 128
OUT_LANES = 128  # output row padded to one full lane tile


def balanced_margins(mx, my):
    """VMEM block margins when the per-tile integer shift is folded to the
    NEAREST (8, 128) multiple (see :func:`fold_shift`): the remainders lie in
    [-4, 4) / [-64, 64), so each margin only needs remainder + tap reach
    (mx + 1) instead of a full tiling period.  Halves the per-tile DMA block
    vs folding with floor-mod (remainders in [0, 8) / [0, 128) forced
    mm_x >= mx + 129 -> 256)."""
    mm_y = -(-(my + 5) // 8) * 8
    mm_x = -(-(mx + 65) // 128) * 128
    return mm_y, mm_x


def canvas_pad(mm_x, g_bound):
    """HBM canvas padding covering the farthest nearest-rounded aligned DMA
    start (|aligned shift| <= roundup128(g_bound + 64)); multiple of 128 so
    the DMA start stays provably (8, 128)-aligned."""
    return mm_x + (-(-(g_bound + 64) // 128) * 128)


def fold_shift(sx, sy):
    """Split a per-tile integer shift into a (8, 128)-aligned part (folded
    into the DMA start) and a balanced remainder (applied with dynamic
    rolls): ``sx = sx_al + remx`` with ``sx_al`` a multiple of 128 and
    ``remx`` in [-64, 64), likewise ``sy`` over 8/[-4, 4)."""
    remy = jnp.mod(sy + 4, 8) - 4
    remx = jnp.mod(sx + 64, 128) - 64
    return sx - remx, sy - remy, remx, remy


def b2_weights(t):
    """Quadratic B-spline weights at fractional offset ``t`` (scipy order=2,
    prefilter=False convention; see core/resample._taps_and_weights)."""
    return (0.5 * (0.5 - t) ** 2, 0.75 - t * t, 0.5 * (0.5 + t) ** 2)


def order_taps(order):
    if order == 2:
        return 3, -1
    if order == 1:
        return 2, 0
    if order == 0:
        return 1, 0
    raise NotImplementedError(f"order {order}")


def fractional_parts(xs, ys, order):
    """Integer base tap (kx, ky) and per-tap weight lists for the select
    sampler, matching scipy's even/odd tap start conventions."""
    if order in (0, 2):
        kx = jnp.floor(xs + 0.5)
        ky = jnp.floor(ys + 0.5)
    else:
        kx = jnp.floor(xs)
        ky = jnp.floor(ys)
    tx = xs - kx
    ty = ys - ky
    if order == 2:
        wx_list = b2_weights(tx)
        wy_list = b2_weights(ty)
    elif order == 1:
        wx_list = (1.0 - tx, tx)
        wy_list = (1.0 - ty, ty)
    else:
        wx_list = (jnp.ones_like(tx),)
        wy_list = (jnp.ones_like(ty),)
    return kx, ky, wx_list, wy_list


def select_mix(blk, rx, ry, wx_list, wy_list, *, mx, my, mm_y, mm_x, order,
               lane_rolled=True, direct_slices=True, th=TILE, tw=TILE):
    """Sample a (th, tw) tile from the re-based block ``blk`` (``th``/``tw``
    default to TILE; the quad kernel also runs 2x2 super-tiles to amortize
    per-step overhead).

    ``blk`` is (th + 2*mm_y, tw + 2*mm_x) with ``blk[mm_y + u, mm_x + v]``
    holding the source pixel at (tile row + shift_y + u, tile col + shift_x
    + v).  ``rx``/``ry`` are the per-pixel integer residuals (already clipped
    to [-mx, mx] / [-my, my]); ``wx_list``/``wy_list`` the spline tap
    weights.  The residual bound is per-axis: cost is O((2*my + taps) *
    (2*mx + taps)) static window passes.

    Window extraction strategy (measured on v5e, order 2, mx=my=1, 2048^2):
    lane shifts are the expensive direction on TPU, so with ``lane_rolled``
    the block is lane-rolled ONCE per column offset (2*mx + taps rolls) and
    every (row, col) window is then an aligned-lane + sublane-only slice —
    ~70% of the kernel was unaligned lane windows before this.  The
    ``direct_slices`` fallback path slices each window out of a per-row band
    (unaligned lane slices); kept for Mosaic-version hedging.  When the lane
    margin exceeds 128 the block is first narrowed to TILE + 256 columns
    with one aligned slice (the residual + taps never reach beyond 128
    columns once the tile is re-based on its own integer shift).
    """
    n_taps, tap_lo = order_taps(order)
    bh = blk.shape[0]

    # narrow the lane extent once: windows only need cols
    # [mm_x - (mx+1), mm_x + tw + mx + 1), and mx + 1 <= 128 always holds
    if mm_x > 128:
        blk = jax.lax.slice(blk, (0, mm_x - 128), (bh, mm_x + tw + 128))
        off_x = 128
    else:
        off_x = mm_x
    bw = blk.shape[1]

    zero = jnp.zeros((th, tw), dtype=blk.dtype)
    c_range = range(-mx + tap_lo, mx + tap_lo + n_taps)

    if lane_rolled:
        # cols[c][u, j] = blk[u, off_x + c + j]: one lane roll + aligned
        # slice per column offset; no wraparound reaches the sliced range
        # because off_x + c >= 0 and off_x + c + tw <= bw (mm_x >= mx + 65)
        cols = {}
        for c in c_range:
            rolled = pltpu.roll(blk, (-c) % bw, 1) if c else blk
            cols[c] = jax.lax.slice(rolled, (0, off_x), (bh, off_x + tw))

    def col_mixed_row(r):
        """Row band r, column-selected and x-tap-mixed.  Windows are cached
        per distinct lane shift: consecutive ox values reuse (ox + ax)
        windows."""
        if lane_rolled:
            wins = {c: jax.lax.slice(cols[c], (mm_y + r, 0),
                                     (mm_y + r + th, tw))
                    for c in c_range}
        else:
            band = jax.lax.slice(
                pltpu.roll(blk, (bh - r) % bh, 0),
                (mm_y, 0), (mm_y + th, bw))
            if direct_slices:
                wins = {c: jax.lax.slice(band, (0, off_x + c),
                                         (th, off_x + c + tw))
                        for c in c_range}
            else:
                wins = {c: jax.lax.slice(
                            pltpu.roll(band, (bw - c) % bw, 1),
                            (0, off_x), (th, off_x + tw))
                        for c in c_range}
        acc = zero
        for ox in range(-mx, mx + 1):
            inner = zero
            for ax in range(n_taps):
                inner = inner + wx_list[ax] * wins[ox + tap_lo + ax]
            acc = jnp.where(rx == ox, inner, acc)
        return acc

    # rolling cache over row offsets: only n_taps row bands live at once
    r_lo = -my + tap_lo
    cache = {r: col_mixed_row(r) for r in range(r_lo, r_lo + n_taps)}
    sampled = zero
    for oy in range(-my, my + 1):
        mixed = zero
        for ay in range(n_taps):
            r = oy + tap_lo + ay
            if r not in cache:
                cache[r] = col_mixed_row(r)
            mixed = mixed + wy_list[ay] * cache[r]
        sampled = jnp.where(ry == oy, mixed, sampled)
        cache.pop(oy + tap_lo, None)  # lowest row no longer needed
    return sampled


def residus_partial_sums(a, sampled, invalid):
    """Masked partial sums of d = (a - sampled)/sqrt(a) for the
    'residus_masked' score (core/score.residus_masked): lanes [n, Sd, Sdd].
    (The reference's raw 'residus' lets NaN fill poison the std —
    alignment.py:544-548 — which on padded grids is always NaN; only the
    masked variant is meaningful for a tiled kernel.)"""
    d = (a - sampled) * jax.lax.rsqrt(a)
    mask = jnp.isfinite(d) & ~invalid
    mf = mask.astype(jnp.float32)
    dm = jnp.where(mask, d, 0.0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 1, OUT_LANES), 2)
    vals = jnp.zeros((1, 1, OUT_LANES), dtype=jnp.float32)
    for idx, s in enumerate([jnp.sum(mf), jnp.sum(dm), jnp.sum(dm * dm)]):
        vals = jnp.where(lane == idx, s, vals)
    return vals


def residus_from_sums(sums):
    """(L, >=3) raw sums -> (L,) masked residue std, float64 on host."""
    import numpy as np

    n, Sd, Sdd = (sums[:, k] for k in range(3))
    with np.errstate(invalid="ignore", divide="ignore"):
        mean = Sd / n
        var = Sdd / n - mean * mean
        return np.sqrt(np.maximum(var, 0.0))


def pearson_partial_sums(a, sampled, invalid):
    """The 6 masked-Pearson partial sums of a tile, assembled into one
    (1, 1, OUT_LANES) lane vector without scatter (unsupported on Mosaic)."""
    mask = jnp.isfinite(a) & jnp.isfinite(sampled) & ~invalid
    mf = mask.astype(jnp.float32)
    am = jnp.where(mask, a, 0.0)
    bm = jnp.where(mask, sampled, 0.0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 1, OUT_LANES), 2)
    vals = jnp.zeros((1, 1, OUT_LANES), dtype=jnp.float32)
    for idx, s in enumerate([
        jnp.sum(mf), jnp.sum(am), jnp.sum(am * am),
        jnp.sum(bm), jnp.sum(bm * bm), jnp.sum(am * bm),
    ]):
        vals = jnp.where(lane == idx, s, vals)
    return vals


def pearson_from_sums(sums):
    """(L, >=6) raw sums -> (L,) Pearson r, float64 on host."""
    import numpy as np

    n, Sa, Saa, Sb, Sbb, Sab = (sums[:, k] for k in range(6))
    with np.errstate(invalid="ignore", divide="ignore"):
        num = Sab - Sa * Sb / n
        den = np.sqrt((Saa - Sa * Sa / n) * (Sbb - Sb * Sb / n))
        return num / den
