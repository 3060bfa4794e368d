"""fits.write atomicity: readers (and resume=True) must never see a
truncated file, and failed writes must not leave temp litter."""
import os

import numpy as np
import pytest

from euispice_coreg_tpu.io import fits


def test_write_leaves_no_temp_files(tmp_path):
    p = str(tmp_path / "a.fits")
    fits.write(p, [fits.PrimaryHDU(data=np.zeros((8, 8), dtype=np.float32))])
    assert os.path.isfile(p)
    assert [f for f in os.listdir(tmp_path) if f.startswith(".tmp-")] == []
    # overwrite goes through the same rename path
    fits.write(p, [fits.PrimaryHDU(data=np.ones((8, 8), dtype=np.float32))])
    assert np.all(fits.open(p)[0].data == 1.0)
    assert [f for f in os.listdir(tmp_path) if f.startswith(".tmp-")] == []


def test_failed_write_preserves_existing_file(tmp_path, monkeypatch):
    """A crash mid-write must leave the previous complete file in place
    (no partial overwrite) and clean up its temp file."""
    p = str(tmp_path / "b.fits")
    fits.write(p, [fits.PrimaryHDU(data=np.full((8, 8), 7.0,
                                                dtype=np.float32))])

    class Boom(RuntimeError):
        pass

    real_open = fits._io.open

    def failing_open(path, mode="r", *a, **k):
        if "w" in mode and ".tmp-" in str(path):
            class _F:
                def __enter__(self):
                    open(path, "wb").write(b"partial")  # simulate torn write
                    raise Boom()

                def __exit__(self, *exc):
                    return False

            return _F()
        return real_open(path, mode, *a, **k)

    monkeypatch.setattr(fits._io, "open", failing_open)
    with pytest.raises(Boom):
        fits.write(p, [fits.PrimaryHDU(data=np.zeros((8, 8),
                                                     dtype=np.float32))])
    monkeypatch.undo()

    # previous complete file intact, no temp litter
    assert np.all(fits.open(p)[0].data == 7.0)
    assert [f for f in os.listdir(tmp_path) if f.startswith(".tmp-")] == []
