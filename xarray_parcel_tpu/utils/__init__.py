"""Utilities: profiling/timing instrumentation and tolerance comparison."""

from .compare import compare, compare_results
from .profiling import (Timer, columns_per_second, sync, time_function,
                        trace)

__all__ = ['Timer', 'columns_per_second', 'compare', 'compare_results',
           'sync', 'time_function', 'trace']
