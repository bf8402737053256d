"""Utilities: profiling/timing instrumentation."""

from .profiling import (Timer, columns_per_second, time_function, trace)

__all__ = ['Timer', 'columns_per_second', 'time_function', 'trace']
