from must3r_tpu.utils.profiling import (  # noqa: F401
    PhaseTimer,
    device_memory_stats,
    trace,
)
