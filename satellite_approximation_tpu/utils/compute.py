"""Compute-environment introspection.

The reference's ComputeEnvironment creates a global OpenCL context/queue on
platform[0]/device[0] and can dump device info
(ComputeEnvironment.cpp:6-80). Under XLA there is nothing to initialize —
device placement, streams, and compilation caching are the runtime's job —
so ``init_main_context`` exists only for drop-in compatibility, and
``platform_and_device_info`` reports what the runtime picked.
"""

from __future__ import annotations


def init_main_context() -> None:
    """No-op: XLA owns device initialization (reference
    ComputeEnvironment::InitMainContext, automatic_detection.cpp:87)."""


def platform_and_device_info() -> str:
    """Human-readable device report (reference PlatformAndDeviceInfo,
    ComputeEnvironment.cpp:16-80)."""
    import jax

    lines = [f"backend: {jax.default_backend()}"]
    for d in jax.devices():
        lines.append(
            f"  device {d.id}: {d.device_kind} (platform={d.platform}, "
            f"process={d.process_index})"
        )
    lines.append(f"local device count: {jax.local_device_count()}")
    lines.append(f"global device count: {jax.device_count()}")
    return "\n".join(lines)
