"""Compare two bench JSON records with noise normalization.

Usage: python tools/bench_compare.py BENCH_rA.json BENCH_rB.json
       python tools/bench_compare.py '{"metric": ...}' BENCH_rB.json

Accepts either the driver's BENCH_r{N}.json wrapper ({"parsed": {...}})
or a raw bench.py JSON line (file path or literal). When both records
carry the r9 ``calibration`` block, every time is divided by that run's
``noise_factor`` before comparison, so the deltas reported are
code-attributable; records without calibration compare raw (flagged).
Prints per-query normalized deltas sorted by regression, then the
totals line. Pure driver-side arithmetic — no Spark session.
"""
from __future__ import annotations

import json
import os
import sys


def _load(arg: str) -> dict:
    if os.path.exists(arg):
        with open(arg) as fh:
            doc = json.load(fh)
    else:
        doc = json.loads(arg)
    if "parsed" in doc:  # driver wrapper
        doc = doc["parsed"]
    if doc is None or "queries" not in (doc or {}):
        raise SystemExit(f"{arg!r} holds no bench record (no 'queries' key)")
    # r11+: per-pass raw timings live in a side file (BENCH_DETAIL.json)
    # so the stdout line stays inside the driver's capture window. Merge
    # them back for the spread columns when the side file is from the
    # same run (headline totals match).
    if "queries_runs" not in doc and doc.get("detail"):
        for base in (os.path.dirname(os.path.abspath(arg)) if os.path.exists(arg) else ".",
                     os.path.dirname(os.path.dirname(os.path.abspath(__file__)))):
            p = os.path.join(base, doc["detail"])
            if os.path.exists(p):
                with open(p) as fh:
                    det = json.load(fh)
                if det.get("value") == doc.get("value"):
                    doc.setdefault("queries_runs", det.get("queries_runs", {}))
                    doc.setdefault("scale_twins_runs", det.get("scale_twins_runs", {}))
                break
    return doc


def main() -> None:
    if len(sys.argv) != 3:
        raise SystemExit(__doc__)
    a, b = _load(sys.argv[1]), _load(sys.argv[2])

    def _factor(doc: dict):
        """The conservative normalizer: the WORST of the CPU and (when
        present, r10+) memory-bandwidth probes — the CPU probe alone
        under-corrects Arrow/BLAS-heavy queries (SCALE.md r9)."""
        cal = doc.get("calibration", {})
        fs = [f for f in (cal.get("noise_factor"),
                          cal.get("bw_noise_factor")) if f]
        return max(fs) if fs else None

    fa, fb = _factor(a), _factor(b)
    note = "" if (fa and fb) else (
        " (no calibration on "
        + "/".join(s for s, f in (("A", fa), ("B", fb)) if not f)
        + " — that side compares RAW)"
    )
    fa, fb = fa or 1.0, fb or 1.0
    print(f"noise factors applied (max of cpu/bw probes): A={fa} B={fb}{note}")

    def _spread(doc: dict, group: str, name: str) -> float | None:
        """max/min across the persisted raw passes (r10+): a large
        spread marks a reading where best-of papered over host noise."""
        rs = doc.get(f"{group}_runs", {}).get(name)
        return (max(rs) / min(rs)) if rs and min(rs) > 0 else None

    rows = []
    for group in ("queries", "scale_twins"):
        qa, qb = a.get(group, {}), b.get(group, {})
        for name in sorted(set(qa) | set(qb)):
            if name in qa and name in qb:
                na, nb = qa[name] / fa, qb[name] / fb
                rows.append(
                    (nb / na if na else float("inf"), name, na, nb, group,
                     _spread(a, group, name), _spread(b, group, name))
                )
            else:
                side = "A" if name in qa else "B"
                print(f"  only in {side}: {group}/{name}")
    rows.sort(key=lambda r: r[0], reverse=True)
    print(f"{'ratio':>7}  {'A(norm)':>8}  {'B(norm)':>8}  {'sprA':>5}  {'sprB':>5}  query")
    for ratio, name, na, nb, group, sa, sb in rows:
        tag = " [twin]" if group == "scale_twins" else ""
        fmt = lambda s: f"{s:5.2f}" if s else "    -"
        print(f"{ratio:7.2f}  {na:8.3f}  {nb:8.3f}  {fmt(sa)}  {fmt(sb)}  {name}{tag}")
    ta = sum(v / fa for v in a["queries"].values())
    tb = sum(v / fb for v in b["queries"].values())
    print(
        f"\nheadline totals: raw {a.get('value')} -> {b.get('value')} | "
        f"normalized {ta:.2f} -> {tb:.2f} ({tb / ta:.3f}x)"
    )


if __name__ == "__main__":
    try:
        main()
    except BrokenPipeError:  # `| head` is a normal way to read this
        import os

        os.dup2(os.open(os.devnull, os.O_WRONLY), sys.stdout.fileno())
