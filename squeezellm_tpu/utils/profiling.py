"""Profiler-trace summary: print a per-op self-time table from a
`jax.profiler.trace` output directory.

The reference prints a torch.profiler self-time table after its benchmark
(`--torch_profile`, reference llama.py:341-353); this is the TPU analogue —
it parses the Perfetto JSON the TPU runtime writes and aggregates device-op
durations by fused-op base name, so the workflow stays "read the table"
instead of "open a trace viewer"."""

from __future__ import annotations

import collections
import glob
import gzip
import json
import os
import re
from typing import List, Tuple


def _find_trace_json(trace_dir: str) -> List[str]:
    return sorted(
        glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"),
                  recursive=True),
        key=os.path.getmtime,
    )


def summarize_trace(trace_dir: str, top: int = 25) -> List[Tuple[str, float, int]]:
    """Aggregate device-side op events by base name.

    Returns [(base_name, total_ms, count)] sorted by total time, or [] if
    no trace file is found."""
    files = _find_trace_json(trace_dir)
    if not files:
        return []
    with gzip.open(files[-1]) as f:
        d = json.load(f)
    events = d.get("traceEvents", [])
    pid_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e.get("args", {}).get("name", "")
    device_pids = {p for p, n in pid_names.items()
                   if "TPU" in n or "GPU" in n or "device" in n.lower()}

    by = collections.Counter()
    counts = collections.Counter()
    for e in events:
        if e.get("ph") != "X" or "dur" not in e:
            continue
        if e.get("pid") not in device_pids:
            continue
        name = e["name"]
        # nesting containers, not ops
        if name.startswith(("jit_", "while", "body", "cond")):
            continue
        base = re.sub(r"[.\d]+$", "", name)
        by[base] += e["dur"]
        counts[base] += 1
    return [(n, us / 1e3, counts[n]) for n, us in by.most_common(top)]


def print_trace_summary(trace_dir: str, top: int = 25) -> None:
    rows = summarize_trace(trace_dir, top)
    if not rows:
        print(f"(no device trace events found under {trace_dir})")
        return
    total = sum(ms for _, ms, _ in rows)
    print(f"{'op':40s} {'total ms':>10s} {'count':>8s} {'%':>6s}")
    print("-" * 68)
    for name, ms, cnt in rows:
        print(f"{name[:40]:40s} {ms:10.2f} {cnt:8d} {100 * ms / total:6.1f}")
    print("-" * 68)
    print(f"{'total (listed)':40s} {total:10.2f}")
