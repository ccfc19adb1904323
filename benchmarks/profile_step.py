"""Profile the headline bench step on the real chip and print a per-op
HLO time breakdown plus a speed-of-light (roofline) summary.

Captures a ``jax.profiler`` trace of the jitted full-potential step (energy +
forces + stress on the MPF-scale fcc-Cu batch from :mod:`bench`), then parses
the xplane with xprof's ``hlo_stats`` / ``roofline_model`` converters — the
same data TensorBoard's profiler plugin renders — and aggregates self-time by
op category so the "top bin" the next optimization should attack is explicit
(VERDICT round-1 item 2).

Usage:  python benchmarks/profile_step.py [--steps 30] [--json out.json]
"""

from __future__ import annotations

import argparse
import collections
import csv
import glob
import io
import json
import os
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _log(msg: str) -> None:
    print(f"[profile_step] {msg}", file=sys.stderr, flush=True)


def capture(steps: int, outdir: str) -> dict:
    import jax

    from bench import build_batch
    from torch_m3gnet_tpu.config import M3GNetConfig
    from torch_m3gnet_tpu.models import build_model

    batch = build_batch()
    pot = build_model(M3GNetConfig())
    _log("compiling init ...")
    params = pot.init(jax.random.PRNGKey(0), batch)

    @jax.jit
    def step(params, batch):
        out = pot.apply(params, batch)
        return out.energy, out.forces, out.stress

    _log("compiling step ...")
    out = step(params, batch)
    jax.block_until_ready(out)
    _log("tracing ...")

    with jax.profiler.trace(outdir):
        for _ in range(steps):
            out = step(params, batch)
        jax.block_until_ready(out)

    return {
        "edges": int(np.asarray(batch.edge_mask).sum()),
        "triplets": int(np.asarray(batch.triplet_mask).sum()),
        "device": str(jax.devices()[0]),
        "steps": steps,
    }


def _xplane_paths(outdir: str) -> list[str]:
    return sorted(glob.glob(os.path.join(outdir, "**", "*.xplane.pb"), recursive=True))


def hlo_table(outdir: str) -> list[dict]:
    """Rows of per-HLO stats (self time, category, FLOPs, bytes)."""
    from xprof.convert import raw_to_tool_data

    data, _ = raw_to_tool_data.xspace_to_tool_data(
        _xplane_paths(outdir), "hlo_stats", {}
    )
    if isinstance(data, bytes):
        data = data.decode("utf-8")
    # hlo_stats returns gviz JSON or CSV depending on version; handle both.
    try:
        blob = json.loads(data)
        cols = [c["label"] for c in blob["cols"]]
        rows = [
            {cols[i]: (cell or {}).get("v") for i, cell in enumerate(r["c"])}
            for r in blob["rows"]
        ]
    except (json.JSONDecodeError, KeyError, TypeError):
        rows = list(csv.DictReader(io.StringIO(data)))
    return rows


def summarize(rows: list[dict], steps: int) -> dict:
    """Aggregate self-time by HLO category and by program/op name bins."""

    def fget(row, *keys, default=0.0):
        for k in keys:
            for kk in row:
                if kk.lower().replace(" ", "_") == k:
                    try:
                        return float(row[kk])
                    except (TypeError, ValueError):
                        return default
        return default

    def sget(row, *keys):
        for k in keys:
            for kk in row:
                if kk.lower().replace(" ", "_") == k:
                    return str(row[kk] or "")
        return ""

    by_cat = collections.Counter()
    by_name = collections.Counter()
    flops_total = 0.0
    total_us = 0.0
    for row in rows:
        t = fget(row, "total_self_time_(us)", "self_time_(us)", "total_self_time")
        cat = sget(row, "hlo_category", "category") or "?"
        name = sget(row, "hlo_op_expression", "hlo_op_name", "hlo_name")
        by_cat[cat] += t
        by_name[(cat, name[:160])] += t
        flops_total += fget(row, "flops", "model_flops")
        total_us += t

    return {
        "total_device_us_per_step": total_us / max(steps, 1),
        "by_category_us_per_step": {
            k: round(v / max(steps, 1), 1) for k, v in by_cat.most_common()
        },
        "top_ops_us_per_step": [
            {"category": c, "us": round(v / max(steps, 1), 1), "op": n}
            for (c, n), v in by_name.most_common(25)
        ],
    }


def roofline(outdir: str) -> list[dict]:
    from xprof.convert import raw_to_tool_data

    try:
        data, _ = raw_to_tool_data.xspace_to_tool_data(
            _xplane_paths(outdir), "roofline_model", {}
        )
        if isinstance(data, bytes):
            data = data.decode("utf-8")
        blob = json.loads(data)
        if isinstance(blob, list):
            blob = blob[0]
        cols = [c["label"] for c in blob["cols"]]
        return [
            {cols[i]: (cell or {}).get("v") for i, cell in enumerate(r["c"])}
            for r in blob["rows"]
        ]
    except Exception as exc:  # tool coverage varies by version
        return [{"error": str(exc)}]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--json", type=str, default=None)
    ap.add_argument("--keep-trace", type=str, default=None,
                    help="directory to keep the raw trace in")
    args = ap.parse_args()

    outdir = args.keep_trace or tempfile.mkdtemp(prefix="m3g_trace_")
    meta = capture(args.steps, outdir)
    rows = hlo_table(outdir)
    summary = summarize(rows, args.steps)
    roof = roofline(outdir)
    report = {"meta": meta, "summary": summary, "roofline_head": roof[:8]}
    text = json.dumps(report, indent=2)
    if args.json:
        with open(args.json, "w") as f:
            f.write(text)
    print(text)


if __name__ == "__main__":
    main()
