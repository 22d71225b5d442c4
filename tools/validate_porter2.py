"""Exhaustive Porter2 validation against the published Snowball test data.

The canonical pair (~29k words) lives in the public snowball-data repo:

    https://raw.githubusercontent.com/snowballstem/snowball-data/master/english/voc.txt
    https://raw.githubusercontent.com/snowballstem/snowball-data/master/english/output.txt

This sandbox has no network access, so the full-vocabulary diff cannot run
here (the rule-level goldens + hypothesis suites in tests/test_porter2.py
are the offline gate). Run this whenever the files are available:

    python tools/validate_porter2.py english/voc.txt english/output.txt

Exit code 0 = zero divergences.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from letarette_spark.analysis.porter2 import stem


def main(voc_path: str, out_path: str) -> int:
    with open(voc_path, encoding="utf-8") as f:
        voc = [w.strip() for w in f if w.strip()]
    with open(out_path, encoding="utf-8") as f:
        expected = [w.strip() for w in f if w.strip()]
    if len(voc) != len(expected):
        print(f"length mismatch: {len(voc)} words vs {len(expected)} outputs")
        return 1
    bad = 0
    for w, e in zip(voc, expected):
        got = stem(w)
        if got != e:
            bad += 1
            if bad <= 50:
                print(f"DIVERGE {w!r}: got {got!r}, want {e!r}")
    print(f"{len(voc)} words checked, {bad} divergences")
    return 1 if bad else 0


if __name__ == "__main__":
    if len(sys.argv) != 3:
        print(__doc__)
        sys.exit(2)
    sys.exit(main(sys.argv[1], sys.argv[2]))
