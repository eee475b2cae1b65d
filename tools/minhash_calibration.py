#!/usr/bin/env python
"""Calibrate estimate-mode MinHash against exact-verify at scale (r6,
VERDICT r5 #5): the scale default's accuracy was previously asserted
only via +-1/sqrt(num_perm) theory and golden signatures. This measures
precision/recall of the ESTIMATE path (signature-agreement Jaccard)
against ground truth = the EXACT path (true shingle-set Jaccard on the
same banded candidates, max_bucket=None so candidate coverage is
identical) at the 0.6 threshold.

Both runs share banding, so this isolates the VERIFICATION estimator --
banding recall is a separate, analytically-pinned quantity (miss prob
(1-j^r)^b, see queries.neardup_pairs_panel).

Usage: python tools/minhash_calibration.py [--sf-dir .soak/sf1]
       [--num-perm 64] [--threshold 0.6]
Prints one JSON line; floors are pinned in tests/test_operators.py
(test_minhash_estimate_calibration) at driver-testdata scale and the
soak numbers go to SCALE.md.
"""

from __future__ import annotations

import argparse
import json
import sys

sys.path.insert(0, ".")


def calibrate(spark, sf_dir: str, num_perm: int, threshold: float) -> dict:
    from xdump_spark.operators.dedup import minhash_lsh_pairs
    from xdump_spark.queries import _cat

    docs = _cat(spark, sf_dir).tables["documents"]
    kw = dict(threshold=threshold, num_perm=num_perm, bands=16, max_bucket=None)
    truth = {
        (r.id_a, r.id_b)
        for r in minhash_lsh_pairs(docs, verify="exact", **kw).collect()
    }
    est = {
        (r.id_a, r.id_b)
        for r in minhash_lsh_pairs(docs, verify="estimate", **kw).collect()
    }
    tp = len(truth & est)
    return {
        "sf_dir": sf_dir,
        "num_perm": num_perm,
        "threshold": threshold,
        "n_truth": len(truth),
        "n_est": len(est),
        "precision": round(tp / len(est), 4) if est else None,
        "recall": round(tp / len(truth), 4) if truth else None,
    }


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=".soak/sf1")
    ap.add_argument("--num-perm", type=int, default=64)
    ap.add_argument("--threshold", type=float, default=0.6)
    args = ap.parse_args()

    from xdump_spark.session import get_spark

    spark = get_spark("minhash_calibration")
    print(json.dumps(calibrate(spark, args.sf_dir, args.num_perm, args.threshold)))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
