"""Compiled-HLO introspection: comm-volume accounting and overlap checks.

The measurable multi-chip evidence available without a pod (SURVEY.md §5
"Distributed communication backend"): parse a compiled program's optimized
HLO for its collectives, attribute them to the while-loop bodies (= per
solver iteration), and check which body instructions are data-independent
of the halo ``collective-permute``s (the set XLA's latency-hiding scheduler
may overlap with the exchange).  Used by ``tools/comm_volume.py`` and the
regression tests.
"""

from __future__ import annotations

import re
from collections import defaultdict

_DTYPE_BYTES = {
    "f64": 8, "f32": 4, "bf16": 2, "f16": 2,
    "s64": 8, "u64": 8, "s32": 4, "u32": 4, "s8": 1, "u8": 1, "pred": 1,
    "c64": 8, "c128": 16,
}

_SHAPE_RE = re.compile(r"(\w+)\[([\d,]*)\]")

COLLECTIVE_KINDS = ("collective-permute", "all-reduce", "all-gather",
                    "reduce-scatter", "all-to-all")


def shape_bytes(shape_str: str) -> int:
    """Total bytes of an HLO shape string (tuples sum their elements)."""
    total = 0
    for dt, dims in _SHAPE_RE.findall(shape_str):
        if dt not in _DTYPE_BYTES:
            continue
        count = 1
        if dims:
            for d in dims.split(","):
                count *= int(d)
        total += count * _DTYPE_BYTES[dt]
    return total


def parse_computations(hlo_text: str) -> dict:
    """{computation_name: [instruction lines]} from optimized HLO text."""
    comps = {}
    name = None
    lines: list = []
    for ln in hlo_text.splitlines():
        # computation headers contain nested parens (tuple types): match the
        # leading name and the trailing brace only
        m = re.match(r"^(?:ENTRY )?%?([\w\.\-]+)\s*\(.*\{\s*$", ln)
        if m:
            name = m.group(1)
            lines = []
            comps[name] = lines
        elif name is not None:
            if ln.strip() == "}":
                name = None
            else:
                lines.append(ln.strip())
    return comps


def collective_summary(hlo_text: str) -> dict:
    """{computation: {op_kind: (count, total_bytes)}} over the module.

    Async pairs are counted once at their ``-start``.
    """
    comps = parse_computations(hlo_text)
    out = defaultdict(lambda: defaultdict(lambda: [0, 0]))
    for cname, lines in comps.items():
        for ln in lines:
            # shape is either a bare `f64[32]{0}` token or a parenthesized
            # tuple `(f64[], f64[])` — tuple-shaped collectives are exactly
            # what a fused multi-operand psum lowers to, so missing them
            # here would undercount synchronization rounds
            m = re.match(r"%?[\w\.\-]+ = (\([^)]*\)|\S+) ([\w\-\.]+)\(", ln)
            if not m:
                continue
            shape, op = m.group(1), m.group(2)
            kind = next(
                (k for k in COLLECTIVE_KINDS
                 if op == k or op.startswith(k + "-start")), None
            )
            if kind is None or op.endswith("-done"):
                continue
            rec = out[cname][kind]
            rec[0] += 1
            rec[1] += shape_bytes(shape)
    return {c: {k: tuple(v) for k, v in kk.items()} for c, kk in out.items()}


def body_computations(hlo_text: str) -> set:
    """Names of computations used as while-loop bodies."""
    return set(re.findall(r"body=%?([\w\.\-]+)", hlo_text))


def while_body_collective_bytes(hlo_text: str) -> dict:
    """{op_kind: bytes} summed over every while-loop body — i.e. the
    per-iteration communication volume of the compiled solve."""
    summary = collective_summary(hlo_text)
    bodies = body_computations(hlo_text)
    per_iter: dict = {}
    for cname in bodies:
        for kind, (cnt, byts) in summary.get(cname, {}).items():
            per_iter[kind] = per_iter.get(kind, 0) + byts
    return per_iter


def while_body_collective_counts(hlo_text: str) -> dict:
    """{op_kind: instruction count} summed over every while-loop body — the
    number of per-iteration synchronization rounds (each all-reduce is one
    mesh-wide latency hit regardless of its payload, so the COUNT — not the
    bytes — is what a reduced-synchronization solver like
    ``cg_single_sync`` changes)."""
    summary = collective_summary(hlo_text)
    bodies = body_computations(hlo_text)
    per_iter: dict = {}
    for cname in bodies:
        for kind, (cnt, _byts) in summary.get(cname, {}).items():
            per_iter[kind] = per_iter.get(kind, 0) + cnt
    return per_iter


def independent_of_permutes(lines) -> tuple:
    """(n_total, n_independent): instructions with no transitive data
    dependence on any collective-permute result — the overlap-legal set."""
    deps = {}
    tainted = set()
    for ln in lines:
        m = re.match(r"%?([\w\.\-]+) = \S+ (\S+)\((.*)", ln)
        if not m:
            continue
        name, op, rest = m.groups()
        operands = set(re.findall(r"%([\w\.\-]+)", rest))
        deps[name] = operands
        if op.startswith("collective-permute"):
            tainted.add(name)
    changed = True
    while changed:
        changed = False
        for name, operands in deps.items():
            if name not in tainted and operands & tainted:
                tainted.add(name)
                changed = True
    n_total = len(deps)
    return n_total, n_total - len(tainted)
