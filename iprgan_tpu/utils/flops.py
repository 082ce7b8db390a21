"""FLOPs accounting and MFU (model FLOPs utilization).

The reference never measures throughput (BASELINE.md), so our perf
numbers must be self-justifying: steps/s alone says nothing about how
close a step runs to the hardware ceiling. MFU = flops_per_step *
steps_per_sec / chip_peak_flops gives that context.

FLOPs come from XLA's own cost analysis of the compiled executable —
the same graph that is timed, so the count includes everything the step
actually does (both GAN losses, the protection branches, optimizer
update) and stays correct as the model evolves. For these small conv
models XLA performs no rematerialization, so this matches the analytic
fwd+bwd count.
"""

from __future__ import annotations

import jax

# Peak dense-matmul FLOP/s by TPU generation (bf16; f32 runs at half on
# v4/v5 MXUs). Public numbers from cloud.google.com/tpu/docs.
_PEAK_BF16 = {
    "v4": 275e12,
    "v5 lite": 197e12,  # v5e
    "v5e": 197e12,
    "v5p": 459e12,
    "v5": 459e12,
    "v6 lite": 918e12,  # Trillium
    "v6e": 918e12,
}


def chip_peak_flops(device=None) -> float | None:
    """Peak bf16 FLOP/s of the attached chip, or None when unknown
    (e.g. the CPU backend)."""
    device = device or jax.devices()[0]
    kind = getattr(device, "device_kind", "").lower()
    if "tpu" not in kind and device.platform not in ("tpu", "axon"):
        return None
    for name, peak in sorted(_PEAK_BF16.items(), key=lambda kv: -len(kv[0])):
        if name in kind:
            return peak
    return _PEAK_BF16["v5e"]  # this image's axon tunnel is a v5e


def compiled_flops(jitted_fn, *args) -> float | None:
    """Total FLOPs of one call of a jitted function, from XLA cost
    analysis of the lowered+compiled executable. None if the backend
    does not expose a cost model."""
    try:
        compiled = jitted_fn.lower(*args).compile()
        analysis = compiled.cost_analysis()
        if isinstance(analysis, list):  # older jax returns per-device list
            analysis = analysis[0]
        return float(analysis["flops"])
    except Exception:
        return None


def compiled_cost(jitted_fn, *args) -> dict | None:
    """Full XLA cost analysis of one call (``flops``, ``bytes accessed``
    and per-space breakdowns) — the basis for roofline attribution:
    arithmetic intensity = flops / bytes accessed, vs the chip ridge
    point (peak FLOP/s / HBM bandwidth)."""
    try:
        compiled = jitted_fn.lower(*args).compile()
        analysis = compiled.cost_analysis()
        if isinstance(analysis, list):
            analysis = analysis[0]
        return dict(analysis)
    except Exception:
        return None


# Public HBM bandwidth by generation (cloud.google.com/tpu/docs), for
# roofline ridge points.
_HBM_BYTES_PER_S = {
    "v4": 1228e9,
    "v5 lite": 819e9,
    "v5e": 819e9,
    "v5p": 2765e9,
    "v6 lite": 1640e9,
    "v6e": 1640e9,
}


def chip_hbm_bandwidth(device=None) -> float | None:
    device = device or jax.devices()[0]
    kind = getattr(device, "device_kind", "").lower()
    if "tpu" not in kind and device.platform not in ("tpu", "axon"):
        return None
    for name, bw in sorted(_HBM_BYTES_PER_S.items(),
                           key=lambda kv: -len(kv[0])):
        if name in kind:
            return bw
    return _HBM_BYTES_PER_S["v5e"]


def mfu(flops_per_step: float | None, steps_per_sec: float,
        peak: float | None) -> float | None:
    if not flops_per_step or not peak:
        return None
    return flops_per_step * steps_per_sec / peak
