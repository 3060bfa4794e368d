#!/usr/bin/env python
"""Generate committed FITS interop fixtures under tests/data/ via libcfitsio.

Produces (committed, regenerated only by rerunning this script where
libcfitsio is available):

* ``cfitsio_hcomp_float_d1.fits`` — a float32 image written through
  cfitsio's own tile-compression path with HCOMPRESS_1 + quantization
  (SUBTRACTIVE_DITHER_1, fixed dither seed, non-square tiles with partial
  edge tiles, one all-NaN tile and one NaN-speckled tile).
* ``cfitsio_hcomp_float_d1_expected.npy`` — cfitsio's OWN decode of that
  file (float32), the ground truth our reader must reproduce bit-exactly.

The committed pair makes the float-quantization decode path hermetic
(tests/test_fits_io.py::test_hcompress_float_cfitsio_fixture): rounds that
run without libcfitsio still pin byte-level interop, not just our own
round-trip.  Mirrors the reference's reliance on astropy/cfitsio for
compressed SPICE/FSI files (/root/reference/euispice_coreg/utils/Util.py
uses astropy.io.fits, whose compression engine is cfitsio).
"""
from __future__ import annotations

import ctypes
import os
import sys

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DATA = os.path.join(ROOT, "tests", "data")


def load_cfitsio():
    for name in ("libcfitsio.so", "libcfitsio.so.10", "libcfitsio.so.9"):
        try:
            return ctypes.CDLL(name)
        except OSError:
            continue
    return None


def make_image(rows=37, cols=52, seed=17, speckles=False):
    """Smooth background + noise, matching the scale of a real FSI window;
    deterministic.  Always one all-NaN tile region; ``speckles`` adds two
    isolated in-tile NaNs.

    Speckles are NOT usable in any committed fixture: with
    SUBTRACTIVE_DITHER_1, cfitsio's writer dithers the NULL code along
    with the data (NULL_VALUE + rand - 0.5 rounds to INT32_MIN for
    rand < 0.5), so its own reader's exact ZBLANK compare misses and
    returns garbage (~-5e8) at pixels it itself wrote as null — verified
    against libcfitsio.so.10 for RICE_1; HCOMPRESS_1 additionally
    overflows the H-transform on the null spike. There is no well-defined
    interop ground truth for in-tile NaNs under dithered quantization in
    this cfitsio build (whole-NaN tiles are fine: they take the lossless
    gzip fallback)."""
    rng = np.random.default_rng(seed)
    y, x = np.mgrid[0:rows, 0:cols]
    img = (1500.0 + 80.0 * np.sin(x / 7.0) * np.cos(y / 5.0)
           + rng.normal(scale=4.0, size=(rows, cols)))
    img = img.astype(np.float32)
    # tile grid below is 20x16 (cols x rows): the 2nd tile of the top
    # row is all-NaN (whole-tile nulls are well-defined for every codec)
    img[0:16, 20:40] = np.nan
    if speckles:
        img[20, 5] = np.nan
        img[30, 45] = np.nan
    return img


def main():
    lib = load_cfitsio()
    if lib is None or not hasattr(lib, "ffinit"):
        sys.exit("libcfitsio not available — cannot regenerate fixtures")

    os.makedirs(DATA, exist_ok=True)
    c_int, byref = ctypes.c_int, ctypes.byref
    lib.ffinit.argtypes = [ctypes.POINTER(ctypes.c_void_p), ctypes.c_char_p,
                           ctypes.POINTER(c_int)]
    lib.ffopen.argtypes = [ctypes.POINTER(ctypes.c_void_p), ctypes.c_char_p,
                           c_int, ctypes.POINTER(c_int)]
    lib.fits_set_compression_type.argtypes = [ctypes.c_void_p, c_int,
                                              ctypes.POINTER(c_int)]
    lib.fits_set_tile_dim.argtypes = [ctypes.c_void_p, c_int, ctypes.c_void_p,
                                      ctypes.POINTER(c_int)]
    lib.fits_set_hcomp_scale.argtypes = [ctypes.c_void_p, ctypes.c_float,
                                         ctypes.POINTER(c_int)]
    lib.fits_set_quantize_level.argtypes = [ctypes.c_void_p, ctypes.c_float,
                                            ctypes.POINTER(c_int)]
    lib.fits_set_quantize_method.argtypes = [ctypes.c_void_p, c_int,
                                             ctypes.POINTER(c_int)]
    lib.fits_set_dither_seed.argtypes = [ctypes.c_void_p, c_int,
                                         ctypes.POINTER(c_int)]
    lib.ffcrim.argtypes = [ctypes.c_void_p, c_int, c_int, ctypes.c_void_p,
                           ctypes.POINTER(c_int)]
    # generic datatype-tagged entry points: every argument is a pointer
    # (the typed ffppne/ffgpve variants take nulval by VALUE — an easy
    # ctypes ABI trap that silently corrupts the call frame)
    lib.ffppn.argtypes = [ctypes.c_void_p, c_int, ctypes.c_longlong,
                          ctypes.c_longlong, ctypes.c_void_p,
                          ctypes.c_void_p, ctypes.POINTER(c_int)]
    lib.ffgpv.argtypes = [ctypes.c_void_p, c_int, ctypes.c_longlong,
                          ctypes.c_longlong, ctypes.c_void_p,
                          ctypes.c_void_p, ctypes.POINTER(c_int),
                          ctypes.POINTER(c_int)]
    lib.ffmahd.argtypes = [ctypes.c_void_p, c_int, ctypes.POINTER(c_int),
                           ctypes.POINTER(c_int)]
    lib.ffclos.argtypes = [ctypes.c_void_p, ctypes.POINTER(c_int)]

    TFLOAT = 42

    def write_fixture(stem, comptype_code, img, hcomp_scale=None):
        rows, cols = img.shape
        path = os.path.join(DATA, stem + ".fits")
        f = ctypes.c_void_p()
        st = c_int(0)
        lib.ffinit(byref(f), b"!" + path.encode(), byref(st))
        assert st.value == 0, st.value
        lib.fits_set_compression_type(f, comptype_code, byref(st))
        assert st.value == 0
        tdim = (ctypes.c_long * 2)(20, 16)              # ZTILE1 x ZTILE2
        lib.fits_set_tile_dim(f, 2, tdim, byref(st))
        assert st.value == 0
        if hcomp_scale is not None:
            lib.fits_set_hcomp_scale(f, ctypes.c_float(hcomp_scale),
                                     byref(st))
            assert st.value == 0
        lib.fits_set_quantize_level(f, ctypes.c_float(16.0), byref(st))
        assert st.value == 0
        lib.fits_set_quantize_method(f, 1, byref(st))   # SUBTRACTIVE_DITHER_1
        assert st.value == 0
        lib.fits_set_dither_seed(f, 4242, byref(st))    # fixed ZDITHER0
        assert st.value == 0
        naxes = (ctypes.c_long * 2)(cols, rows)
        lib.ffcrim(f, -32, 2, naxes, byref(st))         # float32 image
        assert st.value == 0
        nan = ctypes.c_float(np.nan)
        lib.ffppn(f, TFLOAT, 1, rows * cols, img.ctypes.data, byref(nan),
                  byref(st))
        assert st.value == 0, st.value
        lib.ffclos(f, byref(st))
        assert st.value == 0

        # cfitsio's own decode = ground truth
        f2 = ctypes.c_void_p()
        st = c_int(0)
        lib.ffopen(byref(f2), path.encode(), 0, byref(st))
        assert st.value == 0
        hdutype = c_int(0)
        lib.ffmahd(f2, 2, byref(hdutype), byref(st))
        assert st.value == 0
        out = np.zeros(rows * cols, dtype=np.float32)
        anynul = c_int(0)
        nulval = ctypes.c_float(np.nan)
        lib.ffgpv(f2, TFLOAT, 1, rows * cols, byref(nulval),
                  out.ctypes.data, byref(anynul), byref(st))
        assert st.value == 0, st.value
        lib.ffclos(f2, byref(st))
        expected = out.reshape(rows, cols)

        # sanity: identical NaN footprint, quantization error ~1 step
        fin = np.isfinite(img)
        assert np.array_equal(fin, np.isfinite(expected)), stem
        err = np.abs(expected[fin] - img[fin]).max()
        assert err < 1.5, (stem, err)

        np.save(os.path.join(DATA, stem + "_expected.npy"), expected)
        print(f"wrote {path} ({os.path.getsize(path)} bytes), "
              f"max quant err {err:.4f}")

    write_fixture("cfitsio_hcomp_float_d1", 41, make_image(),
                  hcomp_scale=0.0)                       # lossless H stage
    write_fixture("cfitsio_rice_float_d1", 11, make_image())  # RICE_1


if __name__ == "__main__":
    main()
