"""Scoring reductions: masked Pearson correlation and residue metrics.

The reference scores each lag candidate with a numba port of IDL
``c_correlate.pro`` at lag 0 — i.e. a plain Pearson correlation over the
pixels that are finite in *both* images
(``/root/reference/euispice_coreg/hdrshift/c_correlate.py:39-72``, invoked at
``alignment.py:522-542``).  Here the NaN boolean-compress + correlation is a
single fused masked reduction, vmappable over the lag axis.
"""
from __future__ import annotations

import jax.numpy as jnp


def masked_pearson(a, b):
    """Pearson r over elements finite in both a and b.

    Numerically matches the reference (mean-centering two-pass formula,
    ``c_correlate.py:39-72`` with lags=[0]).  Returns NaN when fewer than one
    valid element or zero variance (the reference would divide by zero).
    """
    a = a.ravel()
    b = b.ravel()
    mask = jnp.isfinite(a) & jnp.isfinite(b)
    n = jnp.sum(mask)
    nf = n.astype(a.dtype)
    am = jnp.where(mask, a, 0.0)
    bm = jnp.where(mask, b, 0.0)
    mean_a = jnp.sum(am) / nf
    mean_b = jnp.sum(bm) / nf
    da = jnp.where(mask, a - mean_a, 0.0)
    db = jnp.where(mask, b - mean_b, 0.0)
    num = jnp.sum(da * db)
    den = jnp.sqrt(jnp.sum(da * da) * jnp.sum(db * db))
    return num / den


def c_correlate(s_1, s_2, lags):
    """IDL ``c_correlate.pro`` semantics for 1-D signals at integer lags.

    Full parity with the reference kernel (``c_correlate.py:39-72``): signals
    are mean-centered once, the sliding dot product is normalized by
    ``sqrt(sum(s1c^2) * sum(s2c^2))``.  Used by the pxlshift path; the header
    engine always calls it with lags=[0] which reduces to Pearson r.
    """
    s_1 = jnp.asarray(s_1)
    s_2 = jnp.asarray(s_2)
    n_s = s_1.shape[0]
    c1 = s_1 - jnp.mean(s_1)
    c2 = s_2 - jnp.mean(s_2)
    den = jnp.sqrt(jnp.sum(c1 * c1) * jnp.sum(c2 * c2))
    out = []
    for lag in list(lags):
        lag = int(lag)
        if lag >= 0:
            v = jnp.sum(c1[: n_s - lag] * c2[lag:])
        else:
            v = jnp.sum(c1[-lag:] * c2[: n_s + lag])
        out.append(v / den)
    return jnp.stack(out)


def c_correlate3d(s_1, s_2, lags):
    """Batched IDL c_correlate over the trailing axis.

    Parity with ``c_correlate3D`` (``c_correlate.py:9-37``): inputs of shape
    (A, B, N); returns (A, B, len(lags)).  Expressed as a vmap of the 1-D
    kernel instead of explicit loops.
    """
    import jax

    s_1 = jnp.asarray(s_1)
    s_2 = jnp.asarray(s_2)
    flat1 = s_1.reshape(-1, s_1.shape[-1])
    flat2 = s_2.reshape(-1, s_2.shape[-1])
    f = jax.vmap(lambda a, b: c_correlate(a, b, lags))
    out = f(flat1, flat2)
    return out.reshape(*s_1.shape[:-1], len(list(lags)))


def residus(a, b):
    """std((a - b)/sqrt(a)) over all elements, NaNs propagating.

    Exact port of the reference 'residus' method (``alignment.py:544-548``).
    Note the reference quirk: NaN fill values poison the std — kept for
    parity; prefer :func:`residus_masked`.
    """
    a = a.ravel()
    b = b.ravel()
    diff = (a - b) / jnp.sqrt(a)
    return jnp.std(diff)


def residus_masked(a, b):
    """NaN-aware variant of :func:`residus` (framework extension)."""
    a = a.ravel()
    b = b.ravel()
    diff = (a - b) / jnp.sqrt(a)
    mask = jnp.isfinite(diff)
    n = jnp.sum(mask).astype(a.dtype)
    dm = jnp.where(mask, diff, 0.0)
    mean = jnp.sum(dm) / n
    var = jnp.sum(jnp.where(mask, (diff - mean) ** 2, 0.0)) / n
    return jnp.sqrt(var)


SCORE_FUNCTIONS = {
    "correlation": masked_pearson,
    "residus": residus,
    "residus_masked": residus_masked,
}


# reference spelling (hdrshift/c_correlate.py:9: ``c_correlate3D``)
c_correlate3D = c_correlate3d
