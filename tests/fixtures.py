"""Hermetic synthetic fixtures: analytic solar scenes rendered through the
framework's own WCS, so alignment ground truth is known exactly.

The reference's tests hit live SIDC/IAS archives (SURVEY.md section 4); this
framework tests offline with generated FITS pairs and injected shifts.
"""
from __future__ import annotations

import numpy as np

from euispice_coreg_tpu.core.header import Header, pc_from_crota
from euispice_coreg_tpu.engine import carrington as carr
from euispice_coreg_tpu.io import fits
from euispice_coreg_tpu.utils import coords


def scene_helioprojective(lon_deg, lat_deg, seed=0, n_blobs=30, width_deg=0.02):
    """Deterministic smooth scene T(Tx, Ty): sum of Gaussian blobs."""
    rng = np.random.default_rng(seed)
    centers = rng.uniform(-0.12, 0.12, size=(n_blobs, 2))
    amps = rng.uniform(0.5, 3.0, size=n_blobs)
    widths = rng.uniform(0.5, 2.0, size=n_blobs) * width_deg
    out = np.zeros(np.broadcast(lon_deg, lat_deg).shape, dtype=np.float64)
    for (cx, cy), a, w in zip(centers, amps, widths):
        out += a * np.exp(-(((lon_deg - cx) ** 2) + ((lat_deg - cy) ** 2)) / (2 * w**2))
    return out + 100.0


def scene_carrington(lon_deg, lat_deg, seed=0, n_blobs=30, width_deg=2.0):
    """Deterministic smooth scene S(carrington lon, lat)."""
    rng = np.random.default_rng(seed + 1)
    centers = np.stack([
        rng.uniform(100.0, 140.0, size=n_blobs),
        rng.uniform(-20.0, 20.0, size=n_blobs),
    ], axis=-1)
    amps = rng.uniform(0.5, 3.0, size=n_blobs)
    widths = rng.uniform(0.5, 2.0, size=n_blobs) * width_deg
    out = np.zeros(np.broadcast(lon_deg, lat_deg).shape, dtype=np.float64)
    for (cx, cy), a, w in zip(centers, amps, widths):
        out += a * np.exp(-(((lon_deg - cx) ** 2) + ((lat_deg - cy) ** 2)) / (2 * w**2))
    return out + 100.0


def make_header(
    naxis=(128, 128),
    cdelt_arcsec=(10.0, 10.0),
    crval_arcsec=(0.0, 0.0),
    crota_deg=0.0,
    ctype=("HPLN-TAN", "HPLT-TAN"),
    extra=None,
):
    n1, n2 = naxis
    pc11, pc12, pc21, pc22 = pc_from_crota(crota_deg, cdelt_arcsec[0], cdelt_arcsec[1])
    hdr = Header({
        "NAXIS1": n1, "NAXIS2": n2,
        "CRVAL1": crval_arcsec[0], "CRVAL2": crval_arcsec[1],
        "CRPIX1": (n1 + 1) / 2, "CRPIX2": (n2 + 1) / 2,
        "CDELT1": cdelt_arcsec[0], "CDELT2": cdelt_arcsec[1],
        "CUNIT1": "arcsec", "CUNIT2": "arcsec",
        "CTYPE1": ctype[0], "CTYPE2": ctype[1],
        "CROTA": crota_deg,
        "PC1_1": pc11, "PC1_2": pc12, "PC2_1": pc21, "PC2_2": pc22,
        "DATE-OBS": "2022-03-17T09:50:45.281",
        "DATE-AVG": "2022-03-17T09:50:50.281",
        "WAVELNTH": 174,
        "BUNIT": "DN/s",
    })
    if extra:
        hdr.update(extra)
    return hdr


def render_helioprojective(hdr, seed=0):
    """Render the analytic scene onto a header's pixel grid."""
    lon, lat = coords.header_world_grid(hdr)
    return scene_helioprojective(lon, lat, seed=seed)


def make_helioprojective_pair(
    true_shift_arcsec=(8.0, -4.0),
    true_dcrota_deg=0.0,
    large_naxis=(196, 196),
    large_cdelt=(12.0, 12.0),
    small_naxis=(96, 96),
    small_cdelt=(5.0, 5.0),
    small_crota=0.75,
    seed=0,
):
    """A consistent large/small pair whose small header is mispointed by
    exactly ``-true_shift``: the lag search must find +true_shift."""
    hdr_large = make_header(large_naxis, large_cdelt, (0.0, 0.0), 0.0)
    data_large = render_helioprojective(hdr_large, seed=seed)

    hdr_small_true = make_header(
        small_naxis, small_cdelt, (120.0, 80.0), small_crota + true_dcrota_deg
    )
    data_small = render_helioprojective(hdr_small_true, seed=seed)

    hdr_small = make_header(
        small_naxis, small_cdelt,
        (120.0 - true_shift_arcsec[0], 80.0 - true_shift_arcsec[1]),
        small_crota,
    )
    return data_large, hdr_large, data_small, hdr_small


def write_pair_fits(tmp_path, data_large, hdr_large, data_small, hdr_small):
    p_large = str(tmp_path / "large.fits")
    p_small = str(tmp_path / "small.fits")
    fits.write(p_large, [fits.PrimaryHDU(data=data_large.astype(np.float32), header=hdr_large)])
    fits.write(p_small, [fits.PrimaryHDU(data=data_small.astype(np.float32), header=hdr_small)])
    return p_large, p_small


# ---------------------------------------------------------------------------
# Carrington fixtures
# ---------------------------------------------------------------------------

CARR_EXTRA = {
    "DSUN_OBS": 0.5 * 1.496e11,  # 0.5 au
    "CRLN_OBS": 120.0,
    "CRLT_OBS": 3.0,
    "RSUN_REF": carr.R_SUN_M,
    "SOLAR_B0": 3.0,
}


def render_carrington_view(hdr, d_solar_r=1.004, seed=0):
    """Render the Carrington scene as seen by a detector described by hdr."""
    sc = carr.header_spherical_scalars(hdr, d_solar_r=d_solar_r)
    n1, n2 = int(hdr["NAXIS1"]), int(hdr["NAXIS2"])
    px, py = coords.pixel_grid(n1, n2)
    lon, lat = carr.spherical_unproject(px, py, sc)
    out = scene_carrington(lon, lat, seed=seed)
    return np.where(np.isfinite(lon), out, np.nan)


def make_carrington_pair(true_shift_arcsec=(20.0, -10.0), seed=0,
                         d_solar_r=1.004):
    hdr_large = make_header(
        (160, 160), (24.0, 24.0), (0.0, 0.0), 0.0, extra=CARR_EXTRA
    )
    data_large = render_carrington_view(hdr_large, d_solar_r, seed=seed)

    hdr_small_true = make_header(
        (80, 80), (8.0, 8.0), (150.0, 100.0), 0.3, extra=CARR_EXTRA
    )
    data_small = render_carrington_view(hdr_small_true, d_solar_r, seed=seed)

    hdr_small = make_header(
        (80, 80), (8.0, 8.0),
        (150.0 - true_shift_arcsec[0], 100.0 - true_shift_arcsec[1]),
        0.3, extra=CARR_EXTRA,
    )
    return data_large, hdr_large, data_small, hdr_small
