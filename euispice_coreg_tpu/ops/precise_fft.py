"""High-accuracy 2-D FFT for TPU via Cooley-Tukey matmul-DFT.

The XLA TPU FFT trades precision for speed (its internal stages run the MXU
at default precision); at 2k^2 sizes the surfaces it produces carry ~1e-4
relative error.  The fast correlation path (engine/fast_corr.py) needs the
cross-correlation surfaces to ~1e-6 relative so the masked-Pearson peak
ordering survives float32: a flat-topped correlation surface can have a
2.5e-5 margin between the true lag and its neighbours.

This module rebuilds the DFT as two explicit matrix multiplications
(decimation m = m1*m2, the standard four-step / Cooley-Tukey factorization)
with float32 twiddle matrices and ``Precision.HIGHEST`` MXU matmuls:

    X[m1*s + r] = sum_q W_m^{qr} (sum_p x[m2*p + q] W_m1^{pr}) W_m2^{qs}

Accuracy is ~sqrt(m)*2^-24 ~ 3e-6 relative; cost is O(m^2 (m1+m2)) per axis
- about 1 TFLOP for the full 66-surface correlation stack at m=2304, well
under 0.1 s on one MXU.  On CPU backends ``jnp.fft`` (pocketfft) is already
accurate; callers should gate on the backend (see ``use_precise_fft``).

No counterpart exists in the reference (it never touches an FFT; its
correlations are brute-force per-lag loops, ``alignment.py:509-549``).
"""
from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np

_HI = jax.lax.Precision.HIGHEST


def use_precise_fft(backend: str | None = None) -> bool:
    """True when the active backend's native FFT is low-precision (TPU)."""
    b = backend or jax.default_backend()
    return b not in ("cpu",)


def _factor(m: int) -> tuple[int, int]:
    """m = m1 * m2 with m1 as close to sqrt(m) as possible."""
    best = (1, m)
    for d in range(int(np.sqrt(m)), 0, -1):
        if m % d == 0:
            best = (d, m // d)
            break
    return best


@lru_cache(maxsize=8)
def _plan(m: int):
    """(F1, twiddle, F2) complex64 host constants for length-m DFT."""
    m1, m2 = _factor(m)
    p = np.arange(m1)
    q = np.arange(m2)
    r = np.arange(m1)
    s = np.arange(m2)
    F1 = np.exp(-2j * np.pi * np.outer(r, p) / m1).astype(np.complex64)   # (r, p)
    F2 = np.exp(-2j * np.pi * np.outer(s, q) / m2).astype(np.complex64)   # (s, q)
    tw = np.exp(-2j * np.pi * np.outer(r, q) / m).astype(np.complex64)    # (r, q)
    return m1, m2, F1, tw, F2


def _dft_last(x, m: int, inverse: bool, prec=_HI):
    """Length-m DFT along the last axis of a complex64 array (..., m)."""
    m1, m2, F1, tw, F2 = _plan(m)
    F1 = jnp.asarray(np.conj(F1) if inverse else F1)
    F2 = jnp.asarray(np.conj(F2) if inverse else F2)
    tw = jnp.asarray(np.conj(tw) if inverse else tw)
    lead = x.shape[:-1]
    xr = x.reshape(lead + (m1, m2))                       # x[p, q] = x[m2 p + q]
    a = jnp.einsum("rp,...pq->...rq", F1, xr, precision=prec)
    b = a * tw
    c = jnp.einsum("sq,...rq->...sr", F2, b, precision=prec)
    out = c.reshape(lead + (m,))                          # flat k = m1 s + r
    if inverse:
        out = out / m
    return out


def _fft2_core(x, m: int, inverse: bool):
    x = _dft_last(x, m, inverse)
    x = jnp.swapaxes(x, -1, -2)
    x = _dft_last(x, m, inverse)
    return jnp.swapaxes(x, -1, -2)


@partial(jax.jit, static_argnames=("m",))
def fft2(x, m: int):
    """Zero-padded 2-D DFT of the trailing two axes -> complex64 (..., m, m)."""
    h, w = x.shape[-2], x.shape[-1]
    pad = [(0, 0)] * (x.ndim - 2) + [(0, m - h), (0, m - w)]
    xp = jnp.pad(x.astype(jnp.complex64), pad)
    return _fft2_core(xp, m, inverse=False)


def _dft_last_real(x, m: int, prec=_HI):
    """Length-m DFT along the last axis of a REAL array: the first-stage
    matmul splits into two real x real products (half the MXU work of the
    complex x complex form used on already-complex data)."""
    m1, m2, F1, tw, F2 = _plan(m)
    F1r = jnp.asarray(np.real(F1))
    F1i = jnp.asarray(np.imag(F1))
    tw_ = jnp.asarray(tw)
    F2_ = jnp.asarray(F2)
    lead = x.shape[:-1]
    xr = x.reshape(lead + (m1, m2))
    ar = jnp.einsum("rp,...pq->...rq", F1r, xr, precision=prec)
    ai = jnp.einsum("rp,...pq->...rq", F1i, xr, precision=prec)
    b = (ar + 1j * ai).astype(jnp.complex64) * tw_
    c = jnp.einsum("sq,...rq->...sr", F2_, b, precision=prec)
    return c.reshape(lead + (m,))


@partial(jax.jit, static_argnames=("m",))
def rfft2(x, m: int):
    """Real-input 2-D DFT, half-spectrum layout (..., m, m//2 + 1).

    Drop-in for ``jnp.fft.rfft2(x, s=(m, m))``.  Exploits the real input
    twice: the x-axis stage runs as two real matmuls, and only the kept
    half-spectrum columns (m//2 + 1 of m) enter the y-axis stage — together
    ~half the full-complex transform's MXU work."""
    h, w = x.shape[-2], x.shape[-1]
    pad = [(0, 0)] * (x.ndim - 2) + [(0, m - h), (0, m - w)]
    xp = jnp.pad(x.astype(jnp.float32), pad)
    X1 = _dft_last_real(xp, m)[..., : m // 2 + 1]   # (..., m, K) over kx
    return _dft_axis2(X1, m)                        # y stage transpose-free


def _dft_axis2(x, m: int, prec=_HI):
    """Length-m DFT along axis -2 of a complex array (..., m, K), WITHOUT
    transposing: both Cooley-Tukey stages contract the split second-to-last
    axis directly (dot_general handles the non-minor contraction on the
    MXU), and the (s, r) output axes land adjacent so the final flat
    reshape k = m1*s + r is free.  Two explicit (..., m, K) swapaxes cost
    ~1.7 GB of relayout traffic per tile at engine scale."""
    m1, m2, F1, tw, F2 = _plan(m)
    F1_ = jnp.asarray(F1)
    F2_ = jnp.asarray(F2)
    tw_ = jnp.asarray(tw)
    lead = x.shape[:-2]
    K = x.shape[-1]
    xr = x.reshape(lead + (m1, m2, K))                  # y = m2 p + q
    a = jnp.einsum("rp,...pqk->...rqk", F1_, xr, precision=prec)
    b = a * tw_[:, :, None]
    c = jnp.einsum("sq,...rqk->...srk", F2_, b, precision=prec)
    return c.reshape(lead + (m, K))                     # ky = m1 s + r


@partial(jax.jit, static_argnames=("my", "mx", "precision"))
def rfft2_rect(x, my: int, mx: int, precision=_HI):
    """Real-input 2-D DFT with independent axis sizes, half-spectrum layout
    (..., my, mx//2 + 1) — drop-in for ``jnp.fft.rfft2(x, s=(my, mx))``.

    Rectangular sizes matter for correlation boxes whose spans differ per
    axis (engine/tile_fft.py): the y-axis transform cost scales with my, so
    my < mx saves MXU work the square :func:`rfft2` would spend on padding.
    The y stage runs transpose-free (:func:`_dft_axis2`).  ``precision``
    selects the MXU pass count: HIGHEST (default, ~3e-6 relative — needed
    where peak ordering rides 1e-6 margins, see fast_corr) or HIGH
    (bf16_3x, ~1e-5 — enough for consumers whose error budget is dominated
    elsewhere, e.g. tile_fft's pre-warp interpolation)."""
    h, w = x.shape[-2], x.shape[-1]
    pad = [(0, 0)] * (x.ndim - 2) + [(0, my - h), (0, mx - w)]
    xp = jnp.pad(x.astype(jnp.float32), pad)
    X1 = _dft_last_real(xp, mx, prec=precision)[..., : mx // 2 + 1]
    return _dft_axis2(X1, my, prec=precision)


def _full_from_half(Xh, m: int):
    """Reconstruct the full (..., m, m) spectrum of a REAL signal from the
    half spectrum (..., m, m//2+1) via Hermitian symmetry
    X[ky, kx] = conj(X[(-ky) % m, (-kx) % m])."""
    if m % 2:
        raise NotImplementedError("odd transform sizes (engine sizes are "
                                  "256-multiples, see fast_corr._fft_size)")
    h = m // 2
    # columns kx = h+1 .. m-1 come from src_x = m-kx = h-1 .. 1
    src = Xh[..., :, 1:h]                                  # kx = 1..h-1
    src = jnp.flip(src, axis=-1)                           # src_x = h-1..1
    # row map ky -> (m - ky) % m  ==  roll(flip(rows), 1)
    src = jnp.roll(jnp.flip(src, axis=-2), 1, axis=-2)
    return jnp.concatenate([Xh, jnp.conj(src)], axis=-1)


@partial(jax.jit, static_argnames=("m",))
def irfft2(Xh, m: int):
    """Inverse of :func:`rfft2`: half-spectrum (..., m, m//2+1) -> real (..., m, m)."""
    Xf = _full_from_half(Xh, m)
    y = _fft2_core(Xf, m, inverse=True)
    return jnp.real(y)
