from kbmod_tpu.utils.debug_timer import DebugTimer
from kbmod_tpu.utils.logging_utils import Logging

__all__ = ["DebugTimer", "Logging"]
