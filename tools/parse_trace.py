"""Summarise a jax.profiler xplane trace: top device ops by self-time.

Usage: python tools/parse_trace.py <trace_dir_or_xplane.pb> [N]

Works with the traces the drivers write under ``--profile`` (see
samcarriestheburden_tpu/profiling.py).  Requires the baked-in ``xprof``
package (the tensorboard_plugin_profile copy has a protobuf-version
conflict; xprof's converter does not).
"""

from __future__ import annotations

import glob
import json
import sys


def find_xplane(path: str) -> str:
    if path.endswith(".pb"):
        return path
    hits = sorted(glob.glob(f"{path}/**/*.xplane.pb", recursive=True))
    if not hits:
        raise SystemExit(f"no .xplane.pb under {path}")
    return hits[-1]


def main():
    path = find_xplane(sys.argv[1])
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 25
    from xprof.convert import raw_to_tool_data as rtd

    data, _ = rtd.xspace_to_tool_data([path], "framework_op_stats", {})
    tables = json.loads(data)
    cols = [c["id"] for c in tables[0]["cols"]]
    rows = [dict(zip(cols, [c["v"] for c in r["c"]]))
            for r in tables[0]["rows"]]
    dev = [r for r in rows if r["host_or_device"] == "Device"]
    dev.sort(key=lambda r: -r["total_self_time"])
    total = sum(r["total_self_time"] for r in dev)
    print(f"{'self us':>10}  {'%':>5}  {'occ':>5}  operation")
    for r in dev[:top_n]:
        print(f"{r['total_self_time']:10.1f}  {100 * r['total_self_time'] / total:5.1f}"
              f"  {r['occurrences']:5.0f}  {r['operation'][:90]}")
    print(f"device total: {total:.1f} us")


if __name__ == "__main__":
    main()
