from .logging import get_logger, stdtss
from .metrics import Metrics, metrics
from .threads import WrkThread

__all__ = ["get_logger", "stdtss", "Metrics", "metrics", "WrkThread"]
