"""Host-side utilities: profiling, metrics logging, compile caching."""

from .compile_cache import enable_compilation_cache  # noqa: F401
from .logging import MetricsLogger  # noqa: F401
from .memory import estimate_render_memory, estimate_train_memory  # noqa: F401
from .profiling import benchmark_fn, trace  # noqa: F401
