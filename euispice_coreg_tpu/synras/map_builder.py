"""Synthetic raster construction from an imager time series.

Behavioural port of ``ComposedMapBuilder``/``SPICEComposedMapBuilder``
(``/root/reference/euispice_coreg/synras/map_builder.py:15-349``): for every
raster column of a SPICE observation, pick the imager frame closest in time
to that slit exposure and sample it at the slit's sky coordinates; assemble
the sampled columns into a (y, x_slit) image whose header combines the
mid-sequence imager metadata with the SPICE spatial WCS.

TPU-native restructuring: instead of one ``world_to_pixel`` + scipy
interpolation call per column inside the loop (map_builder.py:95-130),
columns are grouped by selected imager frame and each group is sampled in a
single batched device resample.
"""
from __future__ import annotations

import os
import random
from abc import ABC

import numpy as np

from ..core.header import Header, ensure_pcij, wcs_params_from_header
from ..core.ndwcs import NDWCS
from ..core import wcs as wcs2d
from ..engine import lag_search
from ..utils import timeutils, units


class MapBuilder(ABC):
    """Abstract synthetic-raster builder (``synras/map_builder.py:15-30``):
    subclasses compose imager frames into a raster on a spectrometer's
    (time, slit) grid via :meth:`process`."""

    def __init__(self):
        pass

    def process(self, path_output: str):
        pass


class ComposedMapBuilder(MapBuilder):
    def __init__(self, path_to_spectro: str, list_imager_paths,
                 threshold_time: float, window_imager=-1, window_spectro=0):
        """``threshold_time`` in seconds (the reference takes an astropy
        Quantity; map_builder.py:26-43)."""
        super().__init__()
        self.path_to_spectro = path_to_spectro
        self.list_imager_paths = [str(p) for p in list_imager_paths]
        self.window_imager = window_imager
        self.window_spectro = window_spectro
        self.threshold_time = float(threshold_time)
        self.path_composed_map = None
        self.path_output = None
        self.data_composed = None
        self.hdr_composed = None
        self._imager_cache: dict[str, tuple] = {}
        self._extract_imager_metadata()

    def _extract_imager_metadata(self):
        from ..io import fits

        self.dates = []
        self.headers = []
        for path in self.list_imager_paths:
            hdul = fits.open(path)
            hdr = hdul[self.window_imager].header
            self.dates.append(timeutils.parse_fits_time(str(hdr["DATE-AVG"])))
            self.headers.append(hdr.copy())
        self.dates = np.asarray(self.dates, dtype=np.float64)

    def _find_closest_imager_time(self, utc_ref_seconds: float):
        delta = np.abs(self.dates - utc_ref_seconds)
        idx = int(np.argmin(delta))
        return idx, float(delta[idx])

    # ------------------------------------------------------------------
    def process(self, folder_path_output=None, basename_output=None,
                print_filename=True, level=2,
                keep_original_imager_pixel_size=False,
                return_synras_name=False):
        from ..io import fits

        self.path_output = folder_path_output
        hdul = fits.open(self.path_to_spectro)
        hdr_spice = hdul[self.window_spectro].header.copy()
        name = self._create_map_from_hdu(
            hdr_spice, basename_output, folder_path_output,
            print_filename=print_filename, level=level,
            keep_original_imager_pixel_size=keep_original_imager_pixel_size,
        )
        if return_synras_name:
            return name

    def process_from_header(self, hdr_spice, path_output=None,
                            basename_output=None, print_filename=False,
                            level=2, keep_original_imager_pixel_size=False):
        self.path_output = path_output
        self._create_map_from_hdu(
            hdr_spice, basename_output, path_output,
            print_filename=print_filename, level=level,
            keep_original_imager_pixel_size=keep_original_imager_pixel_size,
        )

    # ------------------------------------------------------------------
    def _create_map_from_hdu(self, hdr_spice, basename_output=None,
                             path_output=None, print_filename=True, level=2,
                             keep_original_imager_pixel_size=False):
        from ..io import fits

        (hdr_im, lat_spice, lon_spice, naxis1, naxis2, naxis_long,
         utc_cols) = self._prepare_spectro_data(
            hdr_spice, keep_original_imager_pixel_size, level)

        # pick the closest imager per column (host, cheap)
        selection = np.zeros(naxis_long, dtype=np.int64)
        self.dates_selected = np.zeros(naxis_long, dtype=np.float64)
        for ii in range(naxis_long):
            idx, dt = self._find_closest_imager_time(utc_cols[ii])
            if dt > self.threshold_time:
                raise ValueError(
                    f"dt={dt}: Could not find imager sufficiently close in time"
                )
            selection[ii] = idx
            self.dates_selected[ii] = self.dates[idx]

        ny = lon_spice.shape[0]
        self.data_composed = np.empty((ny, naxis_long), dtype=np.float64)
        list_hdr_imagers_used = []

        # batched sampling: one device resample per distinct imager frame;
        # host operands, so a transient-TPU retry re-uploads what it needs
        from ..utils.jaxcfg import with_retries

        resample_retry = with_retries(lag_search.resample_to_grid)
        for idx in np.unique(selection):
            cols = np.nonzero(selection == idx)[0]
            path = self.list_imager_paths[idx]
            if path in self._imager_cache:
                data_imager, hdr_imager = self._imager_cache[path]
            else:
                hdul_im = fits.open(path)
                hdu_im = hdul_im[self.window_imager]
                hdr_imager = hdu_im.header.copy()
                ensure_pcij(hdr_imager, force_crota_0=True)
                data_imager = np.asarray(hdu_im.data, dtype=np.float64)
                self._imager_cache[path] = (data_imager, hdr_imager)
            if print_filename:
                print(f"\nUse imager {os.path.basename(path)}")
            p = wcs_params_from_header(hdr_imager)
            x_im, y_im = wcs2d.world_to_pixel(
                p.as_dict(), lon_spice[:, cols], lat_spice[:, cols],
                kind=p.kind, xp=np,
            )
            sampled = np.asarray(resample_retry(data_imager, x_im, y_im,
                                                order=2))
            self.data_composed[:, cols] = sampled
            list_hdr_imagers_used.extend([hdr_imager] * len(cols))

        # ------------------------------------------------------------------
        # header synthesis (map_builder.py:132-191)
        keys = [f"{pre}{i}" for pre in
                ("CRPIX", "CRVAL", "CDELT", "CUNIT") for i in range(1, 5)]
        keys += ["CROTA2", "CROTA"]
        keys += [f"PC{i}_{j}" for i in range(1, 5) for j in range(1, 5)]

        hdr_mid = list_hdr_imagers_used[len(list_hdr_imagers_used) // 2].copy()
        self.hdr_composed = hdr_mid
        for k in keys:
            if k in self.hdr_spice_:
                self.hdr_composed[k] = self.hdr_spice_[k]
        for k in ("DATE-AVG", "DATE-OBS", "DATE-BEG"):
            if k in hdr_spice:
                self.hdr_composed[k] = hdr_spice[k]
        self.hdr_composed["SPECPATH"] = os.path.basename(str(self.path_to_spectro))

        wave = self.hdr_composed.get("WAVELNTH", 0)
        detector = self.hdr_composed.get(
            "DETECTOR", self.hdr_composed.get("INSTRUME"))
        if detector is None:
            raise ValueError("No info on reference instrument")

        if keep_original_imager_pixel_size:
            # the composed grid keeps the imager pixel pitch: recenter CRPIX
            # and overwrite CDELT/PC scale (map_builder.py:164-190)
            x_mid = (naxis1 - 1) / 2
            y_mid = (naxis2 - 1) / 2
            lon_mid, lat_mid = self._spatial_pixel_to_world(
                np.array([x_mid]), np.array([y_mid]))
            cu1 = self.hdr_composed.get("CUNIT1", "deg")
            cu2 = self.hdr_composed.get("CUNIT2", "deg")
            self.hdr_composed["CDELT1"] = units.convert(
                hdr_im["CDELT1"], hdr_im.get("CUNIT1", "deg"), cu1)
            self.hdr_composed["CDELT2"] = units.convert(
                hdr_im["CDELT2"], hdr_im.get("CUNIT2", "deg"), cu2)
            lam = self.hdr_composed["CDELT2"] / self.hdr_composed["CDELT1"]
            rho = np.arccos(np.clip(self.hdr_composed.get("PC1_1", 1.0), -1, 1))
            rho = rho * (-np.sign(self.hdr_composed.get("PC1_2", 0.0)) or 1.0)
            self.hdr_composed["PC1_2"] = -lam * np.sin(rho)
            self.hdr_composed["PC2_1"] = (1 / lam) * np.sin(rho)
            self.hdr_composed["CRPIX1"] = (self.data_composed.shape[1] + 1) / 2
            self.hdr_composed["CRPIX2"] = (self.data_composed.shape[0] + 1) / 2
            self.hdr_composed["CRVAL1"] = units.from_deg(lon_mid[0], cu1)
            self.hdr_composed["CRVAL2"] = units.from_deg(lat_mid[0], cu2)

        utc_mean = float(np.mean(self.dates_selected))
        if basename_output is None:
            date = timeutils.format_fits_time(utc_mean, ndecimals=0)
            date = date.replace(":", "_")
            randint = random.randint(1, 99999)
            basename_new = f"solo_L3_{detector}{wave}-image-composed-{date}_{randint:05d}.fits"
        else:
            basename_new = basename_output

        self.hdr_composed["NAXIS1"] = self.data_composed.shape[1]
        self.hdr_composed["NAXIS2"] = self.data_composed.shape[0]
        if path_output is not None:
            hdu = fits.PrimaryHDU(
                data=self.data_composed.astype(np.float32),
                header=self.hdr_composed,
            )
            out_path = os.path.join(self.path_output, basename_new)
            fits.write(out_path, [hdu], overwrite=True)
            self.path_composed_map = out_path
            return out_path
        return None

    def _spatial_pixel_to_world(self, x, y):
        p = wcs_params_from_header(self.hdr_spice_)
        lon, lat = wcs2d.pixel_to_world(p.as_dict(), x, y, kind=p.kind, xp=np)
        return lon, lat

    def _prepare_spectro_data(self, hdr_spice, keep_original_imager_pixel_size, level):
        raise NotImplementedError

    def get_path_to_composed_map(self):
        return self.path_composed_map


class SPICEComposedMapBuilder(ComposedMapBuilder):
    """SPICE L2 (t, lambda, y, x) / L3 specialization
    (map_builder.py:240-349)."""

    def _prepare_spectro_data(self, hdr_spice, keep_original_imager_pixel_size, level):
        if level == 3:
            return self._prepare_spectro_data_l3(
                hdr_spice, keep_original_imager_pixel_size)
        if level != 2:
            raise ValueError("level must be 2 or 3")
        w = NDWCS.from_header(hdr_spice)
        naxis1 = int(hdr_spice["NAXIS1"])
        naxis2 = int(hdr_spice["NAXIS2"])

        w_xyt = w.dropaxis(2)  # drop spectral; axes now (x, y, t)

        from ..io import fits

        hdul_im = fits.open(self.list_imager_paths[0])
        hdr_im = hdul_im[self.window_imager].header.copy()
        if keep_original_imager_pixel_size:
            # pixel-pitch ratio with units reconciled (the reference divides
            # raw header values, assuming matching CUNITs)
            c1_im = units.convert(hdr_im["CDELT1"],
                                  hdr_im.get("CUNIT1", "arcsec"),
                                  hdr_spice.get("CUNIT1", "deg"))
            c2_im = units.convert(hdr_im["CDELT2"],
                                  hdr_im.get("CUNIT2", "arcsec"),
                                  hdr_spice.get("CUNIT2", "deg"))
            step_x = c1_im / hdr_spice["CDELT1"]
            step_y = c2_im / hdr_spice["CDELT2"]
            xs = np.arange(0, naxis1, step_x)
            ys = np.arange(0, naxis2, step_y)
        else:
            xs = np.arange(naxis1, dtype=np.float64)
            ys = np.arange(naxis2, dtype=np.float64)

        xg, yg = np.meshgrid(xs, ys)

        # spatial world coordinates (independent of t for SPICE headers)
        w_spatial = w_xyt.copy()
        w_spatial.set_pc(2, 0, 0.0)
        w_xy = w_spatial.dropaxis(2)
        self.hdr_spice_ = w_xy.to_header()
        p = wcs_params_from_header(self.hdr_spice_)
        lon, lat = wcs2d.pixel_to_world(p.as_dict(), xg, yg, kind=p.kind, xp=np)
        lon = units.ang2pipi_deg(lon)
        lat = units.ang2pipi_deg(lat)

        # per-column time: the UTC axis with its x coupling (PC[t, x])
        it = 2  # time axis index in w_xyt (0-based)
        qx = xs + 1.0 - w_xyt.crpix[0]
        qt = 0.0 + 1.0 - w_xyt.crpix[it]
        tsec = (w_xyt.crval[it]
                + w_xyt.cdelt[it] * (w_xyt.pc[it, 0] * qx + w_xyt.pc[it, it] * qt))
        utc_cols = w_xyt.time_origin_seconds() + tsec

        naxis_long = len(xs)
        return hdr_im, lat, lon, naxis1, naxis2, naxis_long, utc_cols

    def _prepare_spectro_data_l3(self, hdr_spice, keep_original_imager_pixel_size):
        """L3 SPICE input: axes (coeff, x, y, t) with the coefficient axis
        first in FITS order (map_builder.py:295-348)."""
        from ..io import fits

        w = NDWCS.from_header(hdr_spice)
        w_xyt = w.dropaxis(0)  # drop coefficient axis
        ilon = w_xyt.axis_index("HPLN")
        ilat = w_xyt.axis_index("HPLT")
        it = w_xyt.axis_index("UTC")
        naxis1 = int(hdr_spice[f"NAXIS{ilon + 2}"])  # +1 for drop, +1 FITS
        naxis2 = int(hdr_spice[f"NAXIS{ilat + 2}"])

        hdul_im = fits.open(self.list_imager_paths[0])
        hdr_im = hdul_im[self.window_imager].header.copy()
        if keep_original_imager_pixel_size:
            step_x = hdr_im["CDELT1"] / hdr_spice[f"CDELT{ilon + 2}"]
            step_y = hdr_im["CDELT2"] / hdr_spice[f"CDELT{ilat + 2}"]
            xs = np.arange(0, naxis1, step_x)
            ys = np.arange(0, naxis2, step_y)
        else:
            xs = np.arange(naxis1, dtype=np.float64)
            ys = np.arange(naxis2, dtype=np.float64)
        xg, yg = np.meshgrid(xs, ys)

        w_spatial = w_xyt.copy()
        w_spatial.set_pc(it, ilon, 0.0)
        w_xy = w_spatial.dropaxis(it)
        self.hdr_spice_ = w_xy.to_header()
        p = wcs_params_from_header(self.hdr_spice_)
        lon, lat = wcs2d.pixel_to_world(p.as_dict(), xg, yg, kind=p.kind, xp=np)
        lon = units.ang2pipi_deg(lon)
        lat = units.ang2pipi_deg(lat)

        qx = xs + 1.0 - w_xyt.crpix[ilon]
        qt = 1.0 - w_xyt.crpix[it]
        tsec = (w_xyt.crval[it]
                + w_xyt.cdelt[it] * (w_xyt.pc[it, ilon] * qx + w_xyt.pc[it, it] * qt))
        utc_cols = w_xyt.time_origin_seconds() + tsec
        return hdr_im, lat, lon, naxis1, naxis2, len(xs), utc_cols
