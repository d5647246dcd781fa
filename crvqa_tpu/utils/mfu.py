"""MFU accounting shared by every benchmark surface.

The reference publishes no utilization numbers (SURVEY.md §6); this repo's
bar is "as fast as the chip allows", which needs the same honest denominator
on every benched surface: FLOPs are taken from the XLA-compiled executable's
own cost analysis (not hand-derived), wall time is the value-fetch-fenced
measurement, and peak is the chip's public bf16 spec by device_kind.

Used by bench.py (stage-2 LXMERT headline) and benchmarks/bench_mplug.py /
bench_generate.py / bench_visualbert.py / bench_stage1.py.
"""
from __future__ import annotations

from typing import Optional

# peak bf16 FLOP/s by device kind (public chip specs)
PEAK_FLOPS = (
    ("v6 lite", 918e12),  # v6e
    ("v5p", 459e12),
    ("v5 lite", 197e12),  # v5e
    ("v5", 459e12),
    ("v4", 275e12),
)


def peak_flops(device_kind: str) -> float:
    kind = device_kind.lower()
    for name, peak in PEAK_FLOPS:
        if name in kind:
            return peak
    return 197e12  # conservative default (v5e)


def compiled_flops(compiled) -> float:
    """FLOPs of a `jitted.lower(...).compile()` executable per invocation.

    Caveat (measured on-chip, bench.py docstring): XLA's cost analysis counts
    a `lax.scan` body ONCE regardless of trip count, so a multi-step window
    under-reports by 1/window — always count the single-step executable and
    multiply.
    """
    try:
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        return float(ca.get("flops", 0.0))
    except Exception:
        return 0.0


def lowered_flops(jitted, *args, **kwargs) -> float:
    """Lower+compile a jitted callable on the given args and return its
    per-call FLOPs (0.0 when cost analysis is unavailable)."""
    try:
        return compiled_flops(jitted.lower(*args, **kwargs).compile())
    except Exception:
        return 0.0


def mfu(flops_per_call: float, calls: int, seconds: float,
        device_kind: str) -> Optional[float]:
    """Measured-FLOPs / wall-time / peak. None when FLOPs are unknown."""
    if not flops_per_call or seconds <= 0:
        return None
    return (flops_per_call * calls / seconds) / peak_flops(device_kind)
