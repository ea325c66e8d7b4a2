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

import math
from typing import Any, Callable, Optional

import jax

__all__ = ["lowered_flops", "traced_flops", "jaxpr_flops",
           "jaxpr_flops_by_class", "device_peak_flops"]


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


def _dot_flops(eqn) -> float:
    """2*M*N*K for dot_general (batch dims folded into the multiply)."""
    (lhs_c, rhs_c), (lhs_b, rhs_b) = eqn.params["dimension_numbers"]
    lhs = eqn.invars[0].aval.shape
    rhs = eqn.invars[1].aval.shape
    k = math.prod(lhs[d] for d in lhs_c)
    b = math.prod(lhs[d] for d in lhs_b)
    m = math.prod(s for d, s in enumerate(lhs) if d not in (*lhs_c, *lhs_b))
    n = math.prod(s for d, s in enumerate(rhs) if d not in (*rhs_c, *rhs_b))
    return 2.0 * b * m * n * k


def _conv_flops(eqn) -> float:
    """2 * prod(output) * (C_in / groups) * prod(kernel_spatial)."""
    dn = eqn.params["dimension_numbers"]
    groups = eqn.params.get("feature_group_count", 1) or 1
    lhs = eqn.invars[0].aval.shape
    rhs = eqn.invars[1].aval.shape
    out = eqn.outvars[0].aval.shape
    c_in = lhs[dn.lhs_spec[1]]
    k_spatial = math.prod(rhs[d] for d in dn.rhs_spec[2:])
    return 2.0 * math.prod(out) * (c_in / groups) * k_spatial


def _pallas_flops(eqn) -> float:
    """Price this repo's Pallas flash-attention kernels (the only
    pallas_calls in the codebase; ops/flash_attention.py). XLA's cost
    analysis can't see inside a kernel, so estimate from the q/k operands:
    each (bq x d)@(d x bk) / (bq x bk)@(bk x d) matmul pair over the full
    grid is 2 * BH*Sq*Skv*D each. fwd = QK^T + PV (2 matmuls); bwd_dq =
    S-recompute + dP + dQ (3); bwd_dkv = S-recompute + dV + dK (3)."""
    if len(eqn.invars) < 3:
        return 0.0
    q, k = eqn.invars[0].aval.shape, eqn.invars[1].aval.shape
    if len(q) != 3 or len(k) != 3:
        return 0.0
    bh, sq, d = q
    skv = k[1]
    base = float(bh) * sq * skv * d
    matmuls = 2 if len(eqn.invars) == 3 else 3   # fwd vs bwd_dq / bwd_dkv
    return 2.0 * matmuls * base


def jaxpr_flops(jaxpr) -> float:
    """Matmul + conv + flash-kernel FLOPs of a (Closed)Jaxpr, recursing into
    call/control-flow primitives. Post-AD jaxprs include rematerialized
    recompute, so grad-of-remat programs price EXECUTED FLOPs (hardware MFU),
    not idealized model FLOPs. while_loop bodies are priced for ONE trip
    (trip counts are dynamic); the train/sampling programs here use scan,
    which is priced exactly (body x length)."""
    jaxpr = getattr(jaxpr, "jaxpr", jaxpr)
    total = 0.0
    for eqn in jaxpr.eqns:
        name = eqn.primitive.name
        if name == "dot_general":
            total += _dot_flops(eqn)
        elif name == "conv_general_dilated":
            total += _conv_flops(eqn)
        elif name == "pallas_call":
            total += _pallas_flops(eqn)
        elif name == "scan":
            total += eqn.params["length"] * jaxpr_flops(eqn.params["jaxpr"])
        elif name == "cond":
            branches = eqn.params["branches"]
            total += max((jaxpr_flops(b) for b in branches), default=0.0)
        elif name == "while":
            total += jaxpr_flops(eqn.params["body_jaxpr"])
        else:
            for key in ("jaxpr", "call_jaxpr"):
                sub = eqn.params.get(key) if eqn.params else None
                if sub is not None:
                    total += jaxpr_flops(sub)
                    break
    return total


def jaxpr_flops_by_class(jaxpr) -> dict:
    """Like jaxpr_flops but split {'dot': …, 'conv': …, 'flash': …} — the
    MXU-work composition of a step (tools/profile_step.py uses this to say
    where the FLOPs go)."""
    jaxpr = getattr(jaxpr, "jaxpr", jaxpr)
    out = {"dot": 0.0, "conv": 0.0, "flash": 0.0}

    def add(d):
        for k in out:
            out[k] += d.get(k, 0.0)

    for eqn in jaxpr.eqns:
        name = eqn.primitive.name
        if name == "dot_general":
            out["dot"] += _dot_flops(eqn)
        elif name == "conv_general_dilated":
            out["conv"] += _conv_flops(eqn)
        elif name == "pallas_call":
            out["flash"] += _pallas_flops(eqn)
        elif name == "scan":
            sub = jaxpr_flops_by_class(eqn.params["jaxpr"])
            add({k: eqn.params["length"] * v for k, v in sub.items()})
        elif name == "cond":
            subs = [jaxpr_flops_by_class(b) for b in eqn.params["branches"]]
            if subs:
                add(max(subs, key=lambda d: sum(d.values())))
        elif name == "while":
            add(jaxpr_flops_by_class(eqn.params["body_jaxpr"]))
        else:
            for key in ("jaxpr", "call_jaxpr"):
                sub = eqn.params.get(key) if eqn.params else None
                if sub is not None:
                    add(jaxpr_flops_by_class(sub))
                    break
    return out


def traced_flops(fn: Callable, *args: Any, **kwargs: Any) -> float:
    """FLOPs of one `fn(*args)` execution, counted from the traced jaxpr.
    Unlike `lowered_flops` this works on backends whose PJRT client returns
    no cost analysis (the axon TPU relay) and prices Pallas flash-attention
    kernels, which XLA's HLO analysis can't see into."""
    return jaxpr_flops(jax.make_jaxpr(fn)(*args, **kwargs))


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
