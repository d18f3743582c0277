"""Tracing / profiling hooks (SURVEY §5 tracing row — absent in the
reference; production frameworks need one).

Thin wrappers over ``jax.profiler``: a context manager for Perfetto traces
and a kernel-time summarizer for quick hotspot attribution without the UI
(parses the trace's kernel durations and maps fusions back to source lines
via the compiled HLO metadata — the loop used to drive this framework's own
optimization).
"""
from __future__ import annotations

import collections
import contextlib
import glob
import gzip
import json
import re
from typing import Optional


@contextlib.contextmanager
def trace(out_dir: str):
    """``with profiling.trace('/tmp/trace'): run()`` → Perfetto dump."""
    import jax

    jax.profiler.start_trace(out_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def kernel_times(trace_dir: str):
    """Total device-kernel wall time per kernel name from a trace dir."""
    files = sorted(glob.glob(
        f"{trace_dir}/plugins/profile/*/*.trace.json.gz"))
    if not files:
        raise FileNotFoundError(f"no trace under {trace_dir}")
    with gzip.open(files[-1]) as fh:
        data = json.load(fh)
    dur = collections.Counter()
    for e in data.get("traceEvents", []):
        if e.get("ph") == "X" and "dur" in e:
            dur[e.get("name", "")] += e["dur"]
    return dur


def hotspots(trace_dir: str, compiled_text: Optional[str] = None, top=20):
    """Kernel time attributed to source lines (needs ``compiled.as_text()``).

    Returns [(milliseconds, source_or_kernel_name)] sorted descending.
    """
    dur = kernel_times(trace_dir)
    srcof = {}
    if compiled_text:
        pat = re.compile(
            r'%([\w\.\-]+) = .*?op_name="([^"]*)"'
            r'(?:.*?source_file="([^"]*)" source_line=(\d+))?')
        for m in pat.finditer(compiled_text):
            srcof[m.group(1)] = (
                m.group(3).split("/")[-1] + ":" + m.group(4)
                if m.group(3) else m.group(2)[:60])
        # Fusion kernels carry no metadata on their definition line; pull the
        # source of the best-attributed op INSIDE each %fused_computation
        # block and map the calling %fusion.N to it.
        comp_src = {}
        comp = None
        for line in compiled_text.splitlines():
            ms = re.match(r"\s*%?(fused_computation[\w\.\-]*)\s", line)
            if ms and "{" in line:
                comp = ms.group(1)
            if comp:
                mm = re.search(r'source_file="([^"]*)" source_line=(\d+)',
                               line)
                if mm and comp not in comp_src:
                    comp_src[comp] = (mm.group(1).split("/")[-1] + ":"
                                      + mm.group(2))
                if line.strip() == "}":
                    comp = None
        for m in re.finditer(
                r"%([\w\.\-]+) = [^\n]*? calls=%?(fused_computation"
                r"[\w\.\-]*)", compiled_text):
            if m.group(1) not in srcof and m.group(2) in comp_src:
                srcof[m.group(1)] = comp_src[m.group(2)]
    agg = collections.Counter()
    for name, d in dur.items():
        if name.startswith(("$", "jit_", "while", "PjitF")) \
                or name in ("np.asarray(jax.Array)",):
            continue
        agg[srcof.get(name, name[:50])] += d
    return [(d / 1000.0, s) for s, d in agg.most_common(top)]
