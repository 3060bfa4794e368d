from .selector import Selector  # noqa: F401
from .selector_eui import SelectorEui  # noqa: F401
from .selector_spice import SelectorSpice  # noqa: F401
