from mpx.utils.logging import Logger, LogLevel
from mpx.utils.timer import Timer
from mpx.utils.profile import BenchmarkProfile, phase

__all__ = ["Logger", "LogLevel", "Timer", "BenchmarkProfile", "phase"]
