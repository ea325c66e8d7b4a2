"""FLOPs accounting for throughput/MFU reporting.

Composer's SpeedMonitor logs `throughput/flops_per_sec` and `device/mfu`
when the model supplies `flops_per_batch` (the reference inherits that
surface via composer.callbacks.speed_monitor). Here the number can be
measured rather than hand-derived: `lowered_flops` runs XLA's HLO cost
analysis on a traced (NOT compiled) program, so it prices exactly the ops
the train step will run — fusion doesn't change FLOP count, and tracing
tiny geometries is cheap. For the full SD2 step on a slow host, run it once
offline (tools side) and paste the number into the yaml knob.
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax

__all__ = ["lowered_flops", "device_peak_flops"]


def lowered_flops(fn: Callable, *args: Any, **kwargs: Any) -> float:
    """Total FLOPs of one `fn(*args)` execution, from XLA's cost analysis
    of the lowered-but-uncompiled program. Args may be real arrays or
    jax.ShapeDtypeStruct. Returns 0.0 if the backend reports nothing."""
    lowered = jax.jit(fn).lower(*args, **kwargs)
    ca = lowered.cost_analysis()
    if ca is None:
        return 0.0
    if isinstance(ca, (list, tuple)):  # one entry per device
        ca = ca[0] if ca else {}
    return float(ca.get("flops", 0.0))


# Dense bf16 peak per chip, from published TPU specs. Conservative where a
# device kind is ambiguous; None => caller should skip MFU rather than lie.
_PEAKS = {
    "v4": 275e12,
    "v5e": 197e12,
    "v5 lite": 197e12,
    "v5p": 459e12,
    "v6e": 918e12,
}


def device_peak_flops(device: Optional[jax.Device] = None) -> Optional[float]:
    """Best-effort bf16 peak FLOP/s for `device` (default: first local).
    Returns None when the device kind isn't a known TPU — MFU is then
    unreportable, not fabricated."""
    try:
        device = device or jax.local_devices()[0]
        kind = (device.device_kind or "").lower()
    except Exception:
        return None
    for name, peak in _PEAKS.items():
        if name in kind:
            return peak
    return None
