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
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..core.header import Header, ensure_pcij, wcs_params_from_header
from ..core.ndwcs import NDWCS
from ..core import wcs as wcs2d
from ..engine import lag_search
from ..utils import timeutils, units


def _sample_frame_all_lags(params_stack, kind_sp, p_im, xg, yg, data_imager):
    """Sample one imager frame at the slit coordinates of ALL lag headers in
    one fused device program: stacked pixel->world through the L shifted
    SPICE WCSes, world->pixel through the imager WCS, and the spline
    sampling — coordinates are built on device and never cross the tunnel.

    Matches the sequential path's numerics: coordinates are computed in the
    input float width, then cast with the image to float32 for the sampling
    (``lag_search.resample_to_grid``'s compute dtype).
    """
    return np.asarray(_sample_frame_jit(
        {k: jnp.asarray(v) for k, v in params_stack.items()},
        {k: jnp.asarray(v) for k, v in p_im.as_dict().items()},
        jnp.asarray(xg), jnp.asarray(yg),
        jnp.asarray(data_imager, dtype=jnp.float32),
        kind_sp, p_im.kind), dtype=np.float64)


@partial(jax.jit, static_argnames=("kind_sp", "kind_im"))
def _sample_frame_jit(params_sp, params_im, xg, yg, img, kind_sp, kind_im):
    from ..core import resample

    lon, lat = wcs2d.pixel_to_world(params_sp, xg, yg, kind=kind_sp, xp=jnp)
    # ang2pipi wrap (Util.py:76-80); exactly periodic for TAN but applied
    # for float parity with the per-lag host path
    lon = wcs2d.ang2pipi_deg(lon)
    lat = wcs2d.ang2pipi_deg(lat)
    x, y = wcs2d.world_to_pixel(params_im, lon, lat, kind=kind_im, xp=jnp)
    return resample.sample_image(
        img, x.astype(jnp.float32), y.astype(jnp.float32), order=2)


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

    def _select_frames(self, utc_cols):
        """Closest imager frame per raster column (host, cheap); raises when
        a column has no frame within ``threshold_time`` (map_builder.py:99-106).
        Sets ``self.dates_selected``."""
        naxis_long = len(utc_cols)
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
        return selection

    def _load_imager(self, idx: int):
        """Load (and cache) one imager frame's data + PC-normalized header."""
        from ..io import fits

        path = self.list_imager_paths[idx]
        if path not in self._imager_cache:
            hdul_im = fits.open(path)
            hdu_im = hdul_im[self.window_imager]
            hdr_imager = hdu_im.header.copy()
            ensure_pcij(hdr_imager, force_crota_0=True)
            data_imager = np.asarray(hdu_im.data, dtype=np.float64)
            self._imager_cache[path] = (data_imager, hdr_imager)
        return self._imager_cache[path]

    def _first_imager_header(self):
        """Header of the first imager frame (pixel-pitch reference in
        ``_prepare_spectro_data``), parsed once — the iterative context
        raster calls the prep once per lag candidate."""
        if not hasattr(self, "_hdr_im0"):
            from ..io import fits

            hdul_im = fits.open(self.list_imager_paths[0])
            self._hdr_im0 = hdul_im[self.window_imager].header.copy()
        return self._hdr_im0.copy()

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

        selection = self._select_frames(utc_cols)

        ny = lon_spice.shape[0]
        self.data_composed = np.empty((ny, naxis_long), dtype=np.float64)
        list_hdr_imagers_used = []

        # batched sampling: one device resample per distinct imager frame;
        # host operands, so a transient-TPU retry re-uploads what it needs
        from ..utils.jaxcfg import with_retries

        resample_retry = with_retries(lag_search.resample_to_grid)
        for idx in np.unique(selection):
            cols = np.nonzero(selection == idx)[0]
            data_imager, hdr_imager = self._load_imager(idx)
            if print_filename:
                print(f"\nUse imager "
                      f"{os.path.basename(self.list_imager_paths[idx])}")
            p = wcs_params_from_header(hdr_imager)
            x_im, y_im = wcs2d.world_to_pixel(
                p.as_dict(), lon_spice[:, cols], lat_spice[:, cols],
                kind=p.kind, xp=np,
            )
            sampled = np.asarray(resample_retry(data_imager, x_im, y_im,
                                                order=2))
            self.data_composed[:, cols] = sampled
            list_hdr_imagers_used.extend([hdr_imager] * len(cols))

        self.hdr_composed = self._synthesize_header(
            hdr_spice, hdr_im, list_hdr_imagers_used, naxis1, naxis2,
            self.data_composed.shape, keep_original_imager_pixel_size)
        wave = self.hdr_composed.get("WAVELNTH", 0)
        detector = self.hdr_composed.get(
            "DETECTOR", self.hdr_composed.get("INSTRUME"))

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

    def _synthesize_header(self, hdr_spice, hdr_im, list_hdr_imagers_used,
                           naxis1, naxis2, data_shape,
                           keep_original_imager_pixel_size):
        """Composed-map header synthesis (map_builder.py:132-191): the
        mid-sequence imager header with the SPICE spatial WCS grafted on.
        Reads ``self.hdr_spice_`` (set by ``_prepare_spectro_data``)."""
        keys = [f"{pre}{i}" for pre in
                ("CRPIX", "CRVAL", "CDELT", "CUNIT") for i in range(1, 5)]
        keys += ["CROTA2", "CROTA"]
        keys += [f"PC{i}_{j}" for i in range(1, 5) for j in range(1, 5)]

        hdr_mid = list_hdr_imagers_used[len(list_hdr_imagers_used) // 2].copy()
        hdr_composed = hdr_mid
        for k in keys:
            if k in self.hdr_spice_:
                hdr_composed[k] = self.hdr_spice_[k]
        for k in ("DATE-AVG", "DATE-OBS", "DATE-BEG"):
            if k in hdr_spice:
                hdr_composed[k] = hdr_spice[k]
        hdr_composed["SPECPATH"] = os.path.basename(str(self.path_to_spectro))

        detector = hdr_composed.get(
            "DETECTOR", hdr_composed.get("INSTRUME"))
        if detector is None:
            raise ValueError("No info on reference instrument")

        if keep_original_imager_pixel_size:
            # the composed grid keeps the imager pixel pitch: recenter CRPIX
            # and overwrite CDELT/PC scale (map_builder.py:164-190)
            x_mid = (naxis1 - 1) / 2
            y_mid = (naxis2 - 1) / 2
            lon_mid, lat_mid = self._spatial_pixel_to_world(
                np.array([x_mid]), np.array([y_mid]))
            cu1 = hdr_composed.get("CUNIT1", "deg")
            cu2 = hdr_composed.get("CUNIT2", "deg")
            hdr_composed["CDELT1"] = units.convert(
                hdr_im["CDELT1"], hdr_im.get("CUNIT1", "deg"), cu1)
            hdr_composed["CDELT2"] = units.convert(
                hdr_im["CDELT2"], hdr_im.get("CUNIT2", "deg"), cu2)
            lam = hdr_composed["CDELT2"] / hdr_composed["CDELT1"]
            rho = np.arccos(np.clip(hdr_composed.get("PC1_1", 1.0), -1, 1))
            rho = rho * (-np.sign(hdr_composed.get("PC1_2", 0.0)) or 1.0)
            hdr_composed["PC1_2"] = -lam * np.sin(rho)
            hdr_composed["PC2_1"] = (1 / lam) * np.sin(rho)
            hdr_composed["CRPIX1"] = (data_shape[1] + 1) / 2
            hdr_composed["CRPIX2"] = (data_shape[0] + 1) / 2
            hdr_composed["CRVAL1"] = units.from_deg(lon_mid[0], cu1)
            hdr_composed["CRVAL2"] = units.from_deg(lat_mid[0], cu2)

        hdr_composed["NAXIS1"] = data_shape[1]
        hdr_composed["NAXIS2"] = data_shape[0]
        return hdr_composed

    def compose_many_from_headers(self, hdrs_spice, level=2,
                                  keep_original_imager_pixel_size=False,
                                  print_filename=False,
                                  spatial_headers=None):
        """Composed rasters for MANY shifted SPICE headers in one pass.

        The reference's iterative context-raster class rebuilds the full
        synthetic raster once per lag candidate
        (``/root/reference/euispice_coreg/hdrshift/alignment_spice.py:376-420``).
        Pointing lags never touch the time axis, so the frame->column
        selection is lag-independent; only the slit world coordinates move.
        This batches the per-frame sampling over all lags into ONE resample
        per distinct imager frame (device dispatch count drops from
        O(lags x frames) to O(frames)).

        Returns ``(data, headers)``: ``data`` of shape (L, ny, n_cols)
        float64 and the per-lag composed headers.  Leaves
        ``self.data_composed`` / ``self.hdr_composed`` at the LAST header's
        values, mirroring the sequential loop's end state.
        """
        from ..utils import coords
        from ..utils.jaxcfg import with_retries

        if spatial_headers is not None:
            # the caller already derived the per-lag 2-D spatial headers
            # (pointing shifts commute with the axis-dropping prep, see
            # AlignementSpiceIterativeContextRaster): one prep serves all
            if keep_original_imager_pixel_size:
                raise ValueError(
                    "spatial_headers requires lag-independent raster grids "
                    "(keep_original_imager_pixel_size=False)")
            if len(spatial_headers) != len(hdrs_spice):
                raise ValueError("spatial_headers length mismatch")
            meta0 = self._prepare_spectro_meta(
                hdrs_spice[0], keep_original_imager_pixel_size, level)
            metas = [(meta0, sp) for sp in spatial_headers]
        else:
            metas = []
            for hdr in hdrs_spice:
                meta = self._prepare_spectro_meta(
                    hdr, keep_original_imager_pixel_size, level)
                metas.append((meta, self.hdr_spice_))
        (hdr_im0, xg0, yg0, naxis1, naxis2, naxis_long, utc0) = metas[0][0]
        for meta, _ in metas[1:]:
            if meta is metas[0][0]:
                continue
            if (meta[1].shape != xg0.shape
                    or not np.array_equal(meta[1], xg0)
                    or not np.array_equal(meta[2], yg0)):
                raise ValueError(
                    "raster pixel grids differ across lag headers "
                    "(keep_original_imager_pixel_size with cdelt lags?) — "
                    "use the sequential per-lag path")
            if not np.allclose(meta[6], utc0, rtol=0.0, atol=1e-6):
                raise ValueError(
                    "per-column times differ across lag headers — pointing "
                    "lags must not touch the time axis")

        # stacked (L, 1, 1) WCS params of all lag headers: the whole
        # world-transform + sampling chain runs as ONE fused device program
        # per imager frame (never an (L, ny, nx) numpy temporary on host —
        # this host's allocator degrades on fresh multi-MB buffers)
        params, kind = coords.stack_wcs_params([h for _, h in metas])

        selection = self._select_frames(utc0)
        L = len(metas)
        ny = xg0.shape[0]
        data = np.empty((L, ny, naxis_long), dtype=np.float64)
        sample_retry = with_retries(_sample_frame_all_lags)
        list_hdr_imagers_used = [None] * naxis_long
        for idx in np.unique(selection):
            cols = np.nonzero(selection == idx)[0]
            data_imager, hdr_imager = self._load_imager(idx)
            if print_filename:
                print(f"\nUse imager "
                      f"{os.path.basename(self.list_imager_paths[idx])}")
            p = wcs_params_from_header(hdr_imager)
            data[:, :, cols] = np.asarray(sample_retry(
                params, kind, p, xg0[:, cols], yg0[:, cols], data_imager))
            for c in cols:
                list_hdr_imagers_used[c] = hdr_imager

        headers = []
        for hdr, (meta, hdr_spice_) in zip(hdrs_spice, metas):
            self.hdr_spice_ = hdr_spice_
            headers.append(self._synthesize_header(
                hdr, meta[0], list_hdr_imagers_used, naxis1, naxis2,
                data.shape[1:], keep_original_imager_pixel_size))
        self.data_composed = data[-1]
        self.hdr_composed = headers[-1]
        return data, headers

    def _spatial_pixel_to_world(self, x, y):
        p = wcs_params_from_header(self.hdr_spice_)
        lon, lat = wcs2d.pixel_to_world(p.as_dict(), x, y, kind=p.kind, xp=np)
        return lon, lat

    def _prepare_spectro_meta(self, hdr_spice, keep_original_imager_pixel_size,
                              level):
        """Everything of the spectro prep EXCEPT the world transform:
        returns (hdr_im, xg, yg, naxis1, naxis2, naxis_long, utc_cols) and
        sets ``self.hdr_spice_``.  Split out so the batched multi-header
        compose can run ONE stacked transform for all lag headers."""
        raise NotImplementedError

    def _prepare_spectro_data(self, hdr_spice, keep_original_imager_pixel_size,
                              level):
        (hdr_im, xg, yg, naxis1, naxis2, naxis_long,
         utc_cols) = self._prepare_spectro_meta(
            hdr_spice, keep_original_imager_pixel_size, level)
        p = wcs_params_from_header(self.hdr_spice_)
        lon, lat = wcs2d.pixel_to_world(p.as_dict(), xg, yg, kind=p.kind,
                                        xp=np)
        lon = units.ang2pipi_deg(lon)
        lat = units.ang2pipi_deg(lat)
        return hdr_im, lat, lon, naxis1, naxis2, naxis_long, utc_cols

    def get_path_to_composed_map(self):
        return self.path_composed_map


class SPICEComposedMapBuilder(ComposedMapBuilder):
    """SPICE L2 (t, lambda, y, x) / L3 specialization
    (map_builder.py:240-349)."""

    def _prepare_spectro_meta(self, hdr_spice, keep_original_imager_pixel_size,
                              level):
        if level == 3:
            return self._prepare_spectro_meta_l3(
                hdr_spice, keep_original_imager_pixel_size)
        if level != 2:
            raise ValueError("level must be 2 or 3")
        w = NDWCS.from_header(hdr_spice)
        naxis1 = int(hdr_spice["NAXIS1"])
        naxis2 = int(hdr_spice["NAXIS2"])

        w_xyt = w.dropaxis(2)  # drop spectral; axes now (x, y, t)

        from ..io import fits

        hdr_im = self._first_imager_header()
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

        # per-column time: the UTC axis with its x coupling (PC[t, x])
        it = 2  # time axis index in w_xyt (0-based)
        qx = xs + 1.0 - w_xyt.crpix[0]
        qt = 0.0 + 1.0 - w_xyt.crpix[it]
        tsec = (w_xyt.crval[it]
                + w_xyt.cdelt[it] * (w_xyt.pc[it, 0] * qx + w_xyt.pc[it, it] * qt))
        utc_cols = w_xyt.time_origin_seconds() + tsec

        naxis_long = len(xs)
        return hdr_im, xg, yg, naxis1, naxis2, naxis_long, utc_cols

    def _prepare_spectro_meta_l3(self, hdr_spice, keep_original_imager_pixel_size):
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

        hdr_im = self._first_imager_header()
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

        qx = xs + 1.0 - w_xyt.crpix[ilon]
        qt = 1.0 - w_xyt.crpix[it]
        tsec = (w_xyt.crval[it]
                + w_xyt.cdelt[it] * (w_xyt.pc[it, ilon] * qx + w_xyt.pc[it, it] * qt))
        utc_cols = w_xyt.time_origin_seconds() + tsec
        return hdr_im, xg, yg, naxis1, naxis2, len(xs), utc_cols
