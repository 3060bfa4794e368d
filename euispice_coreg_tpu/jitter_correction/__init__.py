from .jitter_correction import (align_movie_to_reference,  # noqa: F401
                                jitter_correction_imagers)
