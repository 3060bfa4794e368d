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
        "DETECTOR": "FSI",
        "BUNIT": "DN/s",
    })
    if extra:
        hdr.update(extra)
    return hdr


def render_helioprojective(hdr, seed=0, width_deg=0.02):
    """Render the analytic scene onto a header's pixel grid."""
    lon, lat = coords.header_world_grid(hdr)
    return scene_helioprojective(lon, lat, seed=seed, width_deg=width_deg)


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
# SPICE fixtures
# ---------------------------------------------------------------------------

def make_spice_l2_header(
    nx=48, ny=64, nlam=4,
    cdelt_arcsec=(4.0, 1.0),
    crval_arcsec=(120.0, 80.0),
    crota_deg=0.0,
    dt_per_step=5.0,
    date_beg="2022-03-17T09:45:00.000",
):
    """4-D SPICE L2 header: (x=HPLN-TAN, y=HPLT-TAN, WAVE, UTC) with the
    time<->x raster coupling in PC4_1."""
    pc11, pc12, pc21, pc22 = pc_from_crota(crota_deg, cdelt_arcsec[0], cdelt_arcsec[1])
    hdr = Header({
        "NAXIS": 4,
        "NAXIS1": nx, "NAXIS2": ny, "NAXIS3": nlam, "NAXIS4": 1,
        "CTYPE1": "HPLN-TAN", "CTYPE2": "HPLT-TAN",
        "CTYPE3": "WAVE", "CTYPE4": "UTC",
        "CUNIT1": "deg", "CUNIT2": "deg", "CUNIT3": "nm", "CUNIT4": "s",
        "CRVAL1": crval_arcsec[0] / 3600.0, "CRVAL2": crval_arcsec[1] / 3600.0,
        "CRVAL3": 77.0, "CRVAL4": dt_per_step * (nx / 2),
        "CRPIX1": (nx + 1) / 2, "CRPIX2": (ny + 1) / 2,
        "CRPIX3": (nlam + 1) / 2, "CRPIX4": 1.0,
        "CDELT1": cdelt_arcsec[0] / 3600.0, "CDELT2": cdelt_arcsec[1] / 3600.0,
        "CDELT3": 0.05, "CDELT4": 1.0,
        "PC1_1": pc11, "PC1_2": pc12, "PC2_1": pc21, "PC2_2": pc22,
        "PC3_3": 1.0, "PC4_4": 1.0,
        "PC4_1": dt_per_step,  # seconds per raster step
        "CROTA": crota_deg,
        "NBIN2": 1, "DETECTOR": "SW", "PXBEG2": 230,
        "SOLAR_B0": 3.0, "RSUN_REF": 6.957e8, "DSUN_OBS": 0.5 * 1.496e11,
        "DATEREF": date_beg, "DATE-BEG": date_beg,
        "DATE-OBS": date_beg, "DATE-AVG": "2022-03-17T09:47:00.000",
        "LEVEL": "L2",
    })
    return hdr


def render_spice_l2_cube(hdr, seed=0, line_profile=(0.1, 0.4, 0.4, 0.1),
                         width_deg=0.02):
    """Render the analytic helioprojective scene into a SPICE L2 cube whose
    spectral sum reproduces the scene."""
    from euispice_coreg_tpu.hdrshift.alignment_spice import (
        spatial_header_from_spice_l2,
    )

    nx, ny = int(hdr["NAXIS1"]), int(hdr["NAXIS2"])
    nlam = int(hdr["NAXIS3"])
    hdr2 = spatial_header_from_spice_l2(hdr, nx, ny)
    lon, lat = coords.header_world_grid(hdr2)
    scene = scene_helioprojective(lon, lat, seed=seed, width_deg=width_deg)
    prof = np.asarray(line_profile[:nlam], dtype=np.float64)
    prof = prof / prof.sum()
    cube = scene[None, None, :, :] * prof[None, :, None, None]
    return np.asarray(cube, dtype=np.float64)


def make_spice_pair(tmp_path, true_shift_arcsec=(8.0, -4.0), seed=0,
                    width_deg=0.02, imager_naxis=(196, 196),
                    imager_cdelt=(12.0, 12.0)):
    """Imager + SPICE L2 cube pair with known injected mispointing.

    ``width_deg`` sets the scene's blob scale: smaller widths sharpen the
    correlation peak (sub-pixel Gaussian-fit tests) but need a finer
    ``imager_cdelt`` to stay alias-free."""
    hdr_imager = make_header(imager_naxis, imager_cdelt, (0.0, 0.0), 0.0)
    data_imager = render_helioprojective(hdr_imager, seed=seed,
                                         width_deg=width_deg)

    hdr_true = make_spice_l2_header(crval_arcsec=(120.0, 80.0))
    cube = render_spice_l2_cube(hdr_true, seed=seed, width_deg=width_deg)
    hdr_given = make_spice_l2_header(
        crval_arcsec=(120.0 - true_shift_arcsec[0], 80.0 - true_shift_arcsec[1])
    )

    p_imager = str(tmp_path / "imager.fits")
    p_spice = str(tmp_path / "solo_L2_spice.fits")
    fits.write(p_imager, [fits.PrimaryHDU(data=data_imager.astype(np.float32),
                                          header=hdr_imager)])
    fits.write(p_spice, [fits.PrimaryHDU(data=cube.astype(np.float32),
                                         header=hdr_given)])
    return p_imager, p_spice


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
