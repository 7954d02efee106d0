"""Host-side utilities: profiling, structured metrics logging."""

from .logging import MetricsLogger  # noqa: F401
from .profiling import benchmark_fn, trace  # noqa: F401
