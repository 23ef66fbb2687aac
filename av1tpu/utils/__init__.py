from av1tpu.utils.initialization import init_on_cpu  # noqa: F401
from av1tpu.utils.profiling import (  # noqa: F401
    ThroughputMeter,
    annotate,
    device_memory_stats,
    trace,
)
