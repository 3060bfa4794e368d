from .alignment import Alignment  # noqa: F401
from .alignment_spice import AlignementSpiceIterativeContextRaster, AlignmentSpice  # noqa: F401
from .results import AlignmentResults  # noqa: F401
