from . import boxes  # noqa: F401
from .boxes import box_convert  # noqa: F401
