"""Import-path parity shim: the reference ships three near-identical numba
c_correlate modules (``utils/c_correlate.py`` among
hdrshift/pxlshift/utils); this framework keeps ONE fused implementation in
core/score and re-exports it here so reference-style imports
(from euispice_coreg.utils import c_correlate) keep working."""
from ..core.score import c_correlate, c_correlate3d

c_correlate3D = c_correlate3d

__all__ = ["c_correlate", "c_correlate3D", "c_correlate3d"]
