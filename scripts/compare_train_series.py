"""Compare the train/loss series of two runs' metrics.jsonl.

Used by the round-5 fixed-estimator f600 retrains: the val_noise_draws
estimator must leave the TRAINING stream bit-identical (perm/scan keys
unchanged, trainer.py), so a retrain's per-epoch train losses must
match the committed run exactly — only the val series (and therefore
the selected best epoch) may differ. Exit 0 on bit-identical train
series, 1 otherwise.
"""

from __future__ import annotations

import json
import sys
from pathlib import Path


def series(run_dir: Path, key: str) -> list[float]:
    rows = [json.loads(l) for l in (run_dir / "metrics.jsonl").open()]
    return [r[key] for r in rows if key in r]


def main() -> int:
    a, b = Path(sys.argv[1]), Path(sys.argv[2])
    ta, tb = series(a, "train/loss"), series(b, "train/loss")
    n = min(len(ta), len(tb))
    mism = [i for i in range(n) if ta[i] != tb[i]]
    va, vb = series(a, "val/loss"), series(b, "val/loss")
    v_same = sum(1 for x, y in zip(va, vb) if x == y)
    print(f"train/loss: {len(ta)} vs {len(tb)} epochs, "
          f"{len(mism)} mismatches in first {n}"
          + (f" (first at epoch {mism[0]})" if mism else ""))
    print(f"val/loss: {v_same}/{min(len(va), len(vb))} epochs identical "
          f"(expected ~0 under the fixed-noise estimator)")
    if mism or len(ta) != len(tb):
        print("TRAIN SERIES DIFFER — weights are NOT bit-identical")
        return 1
    print("TRAIN SERIES BIT-IDENTICAL — per-epoch weights match the committed run")
    return 0


if __name__ == "__main__":
    sys.exit(main())
