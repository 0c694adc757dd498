"""Process memory introspection.

Equivalent of ``src/my_lidar_graph_slam/memory_usage.cpp:12-40`` (parsing
/proc/self/status VmRSS/VmHWM for the metric subsystem), plus device (HBM)
usage via jax's memory stats when available.
"""
from __future__ import annotations


def physical_memory_usage() -> int:
    """Current resident set size in bytes (VmRSS)."""
    try:
        with open("/proc/self/status") as f:
            for line in f:
                if line.startswith("VmRSS:"):
                    return int(line.split()[1]) * 1024
    except OSError:
        pass
    return 0


def peak_memory_usage() -> int:
    """Peak resident set size in bytes (VmHWM)."""
    try:
        with open("/proc/self/status") as f:
            for line in f:
                if line.startswith("VmHWM:"):
                    return int(line.split()[1]) * 1024
    except OSError:
        pass
    return 0


def device_memory_usage() -> int:
    """Bytes in use on the default jax device (0 if unavailable)."""
    try:
        import jax

        stats = jax.devices()[0].memory_stats()
        if stats:
            return int(stats.get("bytes_in_use", 0))
    except Exception:
        pass
    return 0
