"""Differential probing harness against the compiled libstemmer.

Used while porting a new Snowball language to pure Python (the same
compiled-oracle technique as tools/gen_snowball_goldens.py): the compiled
library is the ground truth; this tool

- diffs a letarette_spark.analysis module against it over random words
  (``--diff LANG``), printing the first divergences so the porter can see
  exactly what the compiled stemmer did;
- discovers ``delete``-suffix among() entries empirically (``--discover``):
  stem(carrier + s) == carrier with exactly len(s) chars removed proves the
  entry s is in the table (longest-match + delete semantics make the
  deleted span the matched entry);
- single-word probe mode (``--words w1 w2 ...``).

Run: python tools/probe_stemmer.py --lang hindi --words ...
"""

from __future__ import annotations

import argparse
import importlib
import itertools
import random
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])
from tools.gen_snowball_goldens import SnowballStemmer  # noqa: E402


def discover(st: SnowballStemmer, alphabet: str, carrier: str,
             max_len: int = 4, extend_rounds: int = 8) -> set[str]:
    """Empirical among()-entry discovery: exhaustive up to max_len over
    the alphabet, then leftward closure (c + known) to catch longer
    family members, which is how hand-written among tables grow."""
    found: set[str] = set()

    def hit(s: str) -> bool:
        w = carrier + s
        out = st.stem(w)
        return out == carrier

    for n in range(1, max_len + 1):
        for tup in itertools.product(alphabet, repeat=n):
            s = "".join(tup)
            if hit(s):
                found.add(s)
        print(f"len<={n}: {len(found)} entries", file=sys.stderr)
    for _ in range(extend_rounds):
        new = set()
        for s in found:
            for c in alphabet:
                t = c + s
                if t not in found and hit(t):
                    new.add(t)
        if not new:
            break
        found |= new
        print(f"extend: +{len(new)} -> {len(found)}", file=sys.stderr)
    return found


def diff(st: SnowballStemmer, mod, alphabet: str, n: int, seed: int,
         min_len: int = 1, max_len: int = 14, limit: int = 40) -> int:
    rng = random.Random(seed)
    bad = 0
    for _ in range(n):
        w = "".join(rng.choice(alphabet) for _ in range(rng.randint(min_len, max_len)))
        want, got = st.stem(w), mod.stem(w)
        if want is None:  # library-internal error (see SnowballStemmer.stem)
            continue
        if want != got:
            bad += 1
            if bad <= limit:
                print(f"DIFF {w!r}: lib={want!r} mine={got!r}")
    print(f"{bad}/{n} divergences")
    return bad


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--lang", required=True)
    ap.add_argument("--words", nargs="*", default=None)
    ap.add_argument("--discover", action="store_true")
    ap.add_argument("--alphabet", default="abcdefghijklmnopqrstuvwxyz")
    ap.add_argument("--carrier", default="")
    ap.add_argument("--max-len", type=int, default=4)
    ap.add_argument("--diff", action="store_true")
    ap.add_argument("--n", type=int, default=200000)
    ap.add_argument("--seed", type=int, default=1)
    ap.add_argument("--min-len", type=int, default=1)
    ap.add_argument("--word-len", type=int, default=14)
    args = ap.parse_args()
    st = SnowballStemmer(args.lang)
    if args.words:
        for w in args.words:
            print(f"{w}\t{st.stem(w)}")
        return
    if args.discover:
        for s in sorted(discover(st, args.alphabet, args.carrier, args.max_len)):
            print(s)
        return
    if args.diff:
        mod = importlib.import_module(f"letarette_spark.analysis.{args.lang}")
        raise SystemExit(
            1 if diff(st, mod, args.alphabet, args.n, args.seed,
                      args.min_len, args.word_len) else 0)


if __name__ == "__main__":
    main()
