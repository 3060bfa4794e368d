"""Tile-compressed (RICE_1) FITS image support.

Decoding/encoding is done by the native C++ codec in
``euispice_coreg_tpu/io/native/rice.cpp`` (built via ``build_native.py``),
bound through ctypes.  This mirrors the role cfitsio's compiled RICE codec
plays underneath astropy's ``CompImageHDU`` in the reference stack.
"""
from __future__ import annotations

import numpy as np

from ..core.header import Header
from . import native

BLOCK = 2880
CARD = 80


def _tile_grid(hdr: Header):
    znaxis = int(hdr["ZNAXIS"])
    dims = [int(hdr[f"ZNAXIS{i}"]) for i in range(1, znaxis + 1)]  # FITS order
    tiles = []
    for i in range(1, znaxis + 1):
        default = dims[i - 1] if i == 1 else 1
        tiles.append(int(hdr.get(f"ZTILE{i}", default)))
    return dims, tiles


def _column_descr(hdr: Header):
    """Locate the COMPRESSED_DATA column layout in the binary table."""
    tfields = int(hdr["TFIELDS"])
    offset = 0
    cols = {}
    for i in range(1, tfields + 1):
        tform = str(hdr[f"TFORM{i}"]).strip()
        ttype = str(hdr.get(f"TTYPE{i}", f"col{i}")).strip()
        if tform.startswith("1PB") or tform.startswith("PB"):
            size = 8  # 32-bit descriptor pair
            kind = "PB"
        elif tform.startswith("1QB") or tform.startswith("QB"):
            size = 16  # 64-bit descriptor pair
            kind = "QB"
        elif tform.endswith("D"):
            n = int(tform[:-1] or 1)
            size = 8 * n
            kind = "D"
        elif tform.endswith("E"):
            n = int(tform[:-1] or 1)
            size = 4 * n
            kind = "E"
        elif tform.endswith("J"):
            n = int(tform[:-1] or 1)
            size = 4 * n
            kind = "J"
        else:
            raise NotImplementedError(f"TFORM {tform!r} in compressed HDU")
        cols[ttype.upper()] = (offset, kind)
        offset += size
    return cols, offset


def decompress_hdu(hdr: Header, raw: bytes) -> np.ndarray:
    """Decode a RICE_1 tile-compressed binary-table payload to an image."""
    zcmptype = str(hdr.get("ZCMPTYPE", "")).strip()
    if zcmptype != "RICE_1":
        raise NotImplementedError(f"compression {zcmptype!r} not supported (RICE_1 only)")
    dims, tiles = _tile_grid(hdr)
    if len(dims) != 2:
        raise NotImplementedError("only 2-D compressed images supported")
    width, height = dims[0], dims[1]
    tw, th = tiles[0], tiles[1]

    zbitpix = int(hdr["ZBITPIX"])
    blocksize = 32
    for i in range(1, 10):
        if str(hdr.get(f"ZNAME{i}", "")).strip() == "BLOCKSIZE":
            blocksize = int(hdr[f"ZVAL{i}"])
    bytepix = {8: 1, 16: 2, 32: 4, -32: 4, -64: 8}[zbitpix]
    for i in range(1, 10):
        if str(hdr.get(f"ZNAME{i}", "")).strip() == "BYTEPIX":
            bytepix = int(hdr[f"ZVAL{i}"])

    naxis1 = int(hdr["NAXIS1"])
    nrows = int(hdr["NAXIS2"])
    theap = int(hdr.get("THEAP", naxis1 * nrows))
    cols, rowsize = _column_descr(hdr)
    if rowsize != naxis1:
        raise ValueError("binary table row size mismatch")
    off, kind = cols["COMPRESSED_DATA"]

    rows = np.frombuffer(raw[: naxis1 * nrows], dtype=np.uint8).reshape(nrows, naxis1)
    heap = raw[theap:]

    ntx = -(-width // tw)
    nty = -(-height // th)
    if nrows != ntx * nty:
        raise ValueError("tile count mismatch")

    out = np.empty((height, width), dtype=np.int64)
    for r in range(nrows):
        if kind == "PB":
            n, hoff = np.frombuffer(rows[r, off : off + 8].tobytes(), dtype=">i4")
        else:
            n, hoff = np.frombuffer(rows[r, off : off + 16].tobytes(), dtype=">i8")
        comp = np.frombuffer(heap[hoff : hoff + n], dtype=np.uint8)
        ty, tx = divmod(r, ntx)
        cur_w = min(tw, width - tx * tw)
        cur_h = min(th, height - ty * th)
        npix = cur_w * cur_h
        tile = native.rice_decode(comp, npix, blocksize, bytepix)
        out[ty * th : ty * th + cur_h, tx * tw : tx * tw + cur_w] = tile.reshape(cur_h, cur_w)

    bscale = hdr.get("ZSCALE", hdr.get("BSCALE", 1))
    bzero = hdr.get("ZZERO", hdr.get("BZERO", 0))
    blank = hdr.get("ZBLANK", hdr.get("BLANK"))
    if zbitpix < 0 or bscale != 1 or bzero != 0 or blank is not None:
        outf = out.astype(np.float64) * bscale + bzero
        if blank is not None:
            outf[out == blank] = np.nan
        return outf
    return out.astype({8: np.uint8, 16: np.int16, 32: np.int32}[zbitpix])


def compress_hdu_bytes(hdu) -> bytes:
    """Serialize a CompImageHDU as a RICE_1 tile-compressed BINTABLE."""
    from . import fits as fitsio

    data = np.asarray(hdu.data)
    if data.ndim != 2:
        raise NotImplementedError("only 2-D compressed images supported")
    if data.dtype.kind == "f":
        raise NotImplementedError(
            "lossless RICE applies to integer images; quantized float "
            "compression is not implemented — write an uncompressed HDU"
        )
    arr = data.astype(np.int32)
    height, width = arr.shape
    th = getattr(hdu, "tile_shape", None)
    tile_h = th[0] if th else 1
    tile_w = th[1] if th else width
    blocksize, bytepix = 32, 4

    ntx = -(-width // tile_w)
    nty = -(-height // tile_h)
    descs = []
    heap = bytearray()
    for r in range(ntx * nty):
        ty, tx = divmod(r, ntx)
        tile = arr[ty * tile_h : min((ty + 1) * tile_h, height),
                   tx * tile_w : min((tx + 1) * tile_w, width)]
        comp = native.rice_encode(tile.ravel(), blocksize, bytepix)
        descs.append((len(comp), len(heap)))
        heap.extend(comp.tobytes())

    naxis1 = 8  # one 1PB column
    nrows = len(descs)
    rows = np.zeros((nrows, naxis1), dtype=np.uint8)
    for r, (n, off) in enumerate(descs):
        rows[r, 0:8] = np.frombuffer(np.array([n, off], dtype=">i4").tobytes(), dtype=np.uint8)

    hdr = hdu.header
    cards_src = Header({
        "ZIMAGE": True,
        "ZCMPTYPE": "RICE_1",
        "ZBITPIX": 32,
        "ZNAXIS": 2,
        "ZNAXIS1": width,
        "ZNAXIS2": height,
        "ZTILE1": tile_w,
        "ZTILE2": tile_h,
        "ZNAME1": "BLOCKSIZE",
        "ZVAL1": blocksize,
        "ZNAME2": "BYTEPIX",
        "ZVAL2": bytepix,
        "TFIELDS": 1,
        "TTYPE1": "COMPRESSED_DATA",
        "TFORM1": "1PB",
    })
    cards = [
        fitsio._make_card("XTENSION", "BINTABLE", "binary table extension"),
        fitsio._make_card("BITPIX", 8),
        fitsio._make_card("NAXIS", 2),
        fitsio._make_card("NAXIS1", naxis1),
        fitsio._make_card("NAXIS2", nrows),
        fitsio._make_card("PCOUNT", len(heap)),
        fitsio._make_card("GCOUNT", 1),
    ]
    for k, v in cards_src.items():
        cards.append(fitsio._make_card(k, v))
    skip = {"XTENSION", "BITPIX", "NAXIS", "NAXIS1", "NAXIS2", "PCOUNT",
            "GCOUNT", "SIMPLE", "EXTEND", "BSCALE", "BZERO"} | set(cards_src.keys())
    for k, v in hdr.items():
        if k in skip:
            continue
        cards.append(fitsio._make_card(k, v, hdr.comment(k)))
    out = fitsio._serialize_header(cards)
    payload = rows.tobytes() + bytes(heap)
    out += payload + b"\x00" * ((-len(payload)) % BLOCK)
    return out
