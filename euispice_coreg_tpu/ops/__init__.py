"""Low-level TPU ops: high-accuracy transforms and kernels shared by the
engine layer (no counterpart in the reference, which has no device ops)."""
