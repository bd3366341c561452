"""GSPMD collective audit of the compiled multi-device train step.

The reference's pod story is three NCCL uses: DDP grad all-reduce
(network/__init__.py:30-38), SyncBatchNorm stat sync (config.py:92-93), and
the explicit mean/cov all_reduce inside SyncSwitchWhiten fwd+bwd
(sync_switchwhiten.py:22,26,44-45). Under GSPMD all of those are collectives
*inserted by the compiler*, so the only way to know what a pod will actually
pay per step is to lower the sharded program and read the HLO. This module
parses the compiled HLO's collectives into a typed table so tests can pin
the count/placement/dtype (a mis-placed per-BN all-gather would tax every
one of the ~53 norm layers every step).
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from typing import Dict, List

# f32[4,128]{1,0} etc; bf16, s32, u32, pred...
_SHAPE_RE = re.compile(r"([a-z]+[0-9]*)\[([0-9,]*)\]")
_DTYPE_BYTES = {"f64": 8, "f32": 4, "bf16": 2, "f16": 2, "s64": 8, "u64": 8,
                "s32": 4, "u32": 4, "s16": 2, "u16": 2, "s8": 1, "u8": 1,
                "pred": 1, "f8e4m3fn": 1, "f8e5m2": 1}

COLLECTIVE_OPS = ("all-reduce", "all-gather", "all-to-all",
                  "collective-permute", "reduce-scatter")


@dataclass
class Collective:
    op: str              # e.g. 'all-reduce'
    dtypes: List[str]    # result element dtypes (tuple-shaped ops have many)
    bytes: int           # total result bytes (one shard's worth)
    line: str            # the defining HLO line (truncated)


def _shape_bytes(shape_text: str):
    """All (dtype, bytes) pairs in an HLO shape string like
    '(f32[64]{0}, f32[3,3,64,64]{...})'."""
    out = []
    for dt, dims in _SHAPE_RE.findall(shape_text):
        if dt not in _DTYPE_BYTES:
            continue
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        out.append((dt, n * _DTYPE_BYTES[dt]))
    return out


def parse_collectives(hlo_text: str) -> List[Collective]:
    """Extract every collective instruction from compiled HLO text."""
    found = []
    for line in hlo_text.splitlines():
        s = line.strip()
        # defining instructions look like:  %all-reduce.5 = f32[...] all-reduce(
        m = re.match(r"%?[\w.-]+\s*=\s*(\([^)]*\)|[a-z0-9]+\[[^\]]*\]\S*)\s+"
                     r"([a-z-]+)", s)
        if not m:
            continue
        op = m.group(2)
        base = op
        for suf in ("-start", "-done"):
            if base.endswith(suf):
                base = base[:-len(suf)]
        if base not in COLLECTIVE_OPS:
            continue
        # async pairs: count only the -start (or the sync form), never the
        # -done (it has the same payload)
        if op.endswith("-done"):
            continue
        pairs = _shape_bytes(m.group(1))
        if op.endswith("-start") and len(pairs) >= 2:
            # An async -start's tuple shape aliases (operands..., results...,
            # context...): counting every entry would double the payload.
            # Keep the results: the second half when the tuple splits into
            # two dtype-identical halves (k operands + k results), else
            # everything after the first entry (single operand + result +
            # scalar u32/s32 contexts, which are bytes-negligible).
            half = len(pairs) // 2
            if len(pairs) % 2 == 0 and [d for d, _ in pairs[:half]] == \
                    [d for d, _ in pairs[half:]]:
                pairs = pairs[half:]
            else:
                pairs = pairs[1:]
        op = base
        found.append(Collective(
            op=op,
            dtypes=sorted({dt for dt, _ in pairs}),
            bytes=sum(b for _, b in pairs),
            line=s[:160]))
    return found


def summarize(colls: List[Collective]) -> Dict[str, Dict[str, float]]:
    """{op: {count, bytes}} rollup."""
    out: Dict[str, Dict[str, float]] = {}
    for c in colls:
        d = out.setdefault(c.op, {"count": 0, "bytes": 0})
        d["count"] += 1
        d["bytes"] += c.bytes
    return out
