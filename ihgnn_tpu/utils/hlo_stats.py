"""Collective statistics from compiled (optimized) HLO text.

Scaling-efficiency numbers measured on a virtual CPU host mesh are
confounded by host-core contention; the program's REAL communication
volume is a property of the compiled HLO, not the host. This module
parses the optimized module text of a compiled jit function and sums the
output bytes of every collective op, so scaling artifacts can report
`comm_bytes_per_step` next to wall-clock examples/s (VERDICT r2 item 9).

Byte counts are the collective RESULT shapes (the payload a device
materializes); wire traffic per device is bounded by result bytes for
all-gather/all-to-all and by 2x(P-1)/P result bytes for all-reduce.
"""

from __future__ import annotations

import re
from typing import Dict

_DTYPE_BYTES = {
    "pred": 1, "s8": 1, "u8": 1, "s16": 2, "u16": 2, "bf16": 2, "f16": 2,
    "s32": 4, "u32": 4, "f32": 4, "s64": 8, "u64": 8, "f64": 8,
}

# collective op names as they appear in optimized HLO (incl. async -start
# forms; -done forms carry the same shape and are skipped to avoid double
# counting)
_COLLECTIVES = ("all-reduce", "all-gather", "reduce-scatter", "all-to-all",
                "collective-permute")

_SHAPE_RE = re.compile(r"(pred|[suf]\d+|bf16)\[([\d,]*)\]")
_OP_RE = re.compile(
    r"=\s*(\([^)]*\)|\S+)\s+(" + "|".join(_COLLECTIVES) + r")(?:-start)?\(")


def _shape_bytes(shapes_txt: str) -> int:
    total = 0
    for dt, dims in _SHAPE_RE.findall(shapes_txt):
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * _DTYPE_BYTES.get(dt, 4)
    return total


def collective_stats(hlo_text: str) -> Dict[str, Dict[str, int]]:
    """Per-collective-kind {count, bytes} from optimized HLO text."""
    stats: Dict[str, Dict[str, int]] = {}
    for line in hlo_text.splitlines():
        m = _OP_RE.search(line)
        if not m:
            continue
        kind = m.group(2)
        s = stats.setdefault(kind, {"count": 0, "bytes": 0})
        s["count"] += 1
        s["bytes"] += _shape_bytes(m.group(1))
    return stats


def comm_bytes(hlo_text: str) -> int:
    """Total collective result bytes per execution of the module."""
    return sum(s["bytes"] for s in collective_stats(hlo_text).values())


# --- per-collective attribution (VERDICT r3 item 4: "name the all-reduces")

_META_RE = re.compile(r'op_name="([^"]*)"')


def _attribute(op_name: str) -> str:
    """Collapse an XLA op_name path into a short human label naming the
    array the collective carries. Optimized-HLO metadata keeps the jaxpr
    path (e.g. ``jit(step)/transpose(jvp(jit(apply)))/.../psum``), whose
    segments name the model scope that produced the collective."""
    if not op_name:
        return "(no metadata)"
    path = op_name.split("/")
    grad = any(s.startswith("transpose(jvp") for s in path)
    # the most specific named scope: last segment that looks like a module
    # or parameter scope rather than a primitive
    scopes = [s for s in path
              if not s.startswith(("jit(", "transpose(", "jvp(", "remat"))
              and "(" not in s]
    label = "/".join(scopes[-3:]) if scopes else path[-1]
    return ("grad:" if grad else "") + label


def collective_table(hlo_text: str):
    """One row per collective op in the optimized module:
    {kind, bytes, shape, attribution, op_name} — so scaling artifacts can
    report WHICH arrays ride each all-reduce instead of one opaque sum."""
    rows = []
    for line in hlo_text.splitlines():
        m = _OP_RE.search(line)
        if not m:
            continue
        meta = _META_RE.search(line)
        op_name = meta.group(1) if meta else ""
        rows.append({
            "kind": m.group(2),
            "bytes": _shape_bytes(m.group(1)),
            "shape": m.group(1).strip(),
            "attribution": _attribute(op_name),
            "op_name": op_name,
        })
    rows.sort(key=lambda r: -r["bytes"])
    return rows
