from elvis_tpu.utils.timing import (
    measure_performance,
    measure_time,
    safe_print,
    silence_console_output,
)

__all__ = [
    "measure_performance",
    "measure_time",
    "safe_print",
    "silence_console_output",
]
