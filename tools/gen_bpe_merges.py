"""Regenerate the checked-in BPE merge tables (dims.BPE_MERGES_500 /
dims_bpe.BPE_MERGES_2000 / dims_bpe50k's 50000-rule resource) from the
deterministic recipe.

The recipe is tools/tok_knee_probe.py's: a 100k-type
syllable-structured vocabulary (synth_word; grown from 20k in r15 so
one trajectory reaches 50k rules), Zipf frequencies (freq ∝ 1/rank),
and the standard greedy BPE trainer (Sennrich et al. 2016; ties
lexical) via the trajectory-identical incremental learn_merges_fast.
One trainer run to K produces a PREFIX-CLOSED table — the 500- and
2000-rule tables are literally the first rows of the 50000-rule run,
asserted in dims_bpe.py / dims_bpe50k.py — so all checked-in tables
regenerate bit-identically from this script and drift is impossible
without a loud diff.

Usage:
    python tools/gen_bpe_merges.py --k 2000 [--vocab 100000]
    python tools/gen_bpe_merges.py --k 50000 --format txt \
        > ig_etl_with_user_reports_2024_spark/data/bpe_merges_50000.txt

Prints the Python literal (4 tuples per line, dims.py's layout) or the
txt resource ("a b" per line), plus a stderr trailer with the table
md5 (the checksum dims_bpe.py / dims_bpe50k.py pin).
"""

from __future__ import annotations

import argparse
import hashlib
import os
import sys
import time

# tok_knee_probe lives in tools/ — direct script invocation happens to
# put tools/ at sys.path[0], but `python -m tools.gen_bpe_merges` (or an
# import of this module) needs it added explicitly (ADVICE r14).
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from tok_knee_probe import learn_merges, learn_merges_fast, synth_word  # noqa: E402


def table_md5(merges: list[tuple[str, str]]) -> str:
    """Layout-independent checksum of an ordered merge table."""
    return hashlib.md5(
        "\n".join(f"{a} {b}" for a, b in merges).encode()
    ).hexdigest()


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--k", type=int, default=2000)
    ap.add_argument("--vocab", type=int, default=100_000)
    ap.add_argument(
        "--format",
        choices=("py", "txt"),
        default="py",
        help="py = dims.py literal layout; txt = one 'a b' pair per "
        "line (dims_bpe50k's data resource)",
    )
    ap.add_argument(
        "--naive",
        action="store_true",
        help="use the reference O(K·corpus) trainer instead of the "
        "trajectory-identical incremental one (learn_merges_fast "
        "reproduces the pinned K=2000 md5 bit-exactly; the naive path "
        "stays as the independent cross-check)",
    )
    args = ap.parse_args()

    words = [synth_word(i) for i in range(args.vocab)]
    word_freq = {w: max(1, args.vocab // (r + 1)) for r, w in enumerate(words)}
    t0 = time.time()
    trainer = learn_merges if args.naive else learn_merges_fast
    merges = trainer(word_freq, args.k)
    print(f"# trained {len(merges)} merges in {time.time() - t0:.1f}s",
          file=sys.stderr)

    if args.format == "txt":
        print("\n".join(f"{a} {b}" for a, b in merges))
    else:
        out = []
        for i in range(0, len(merges), 4):
            row = ", ".join(f'("{a}","{b}")' for a, b in merges[i : i + 4])
            out.append(f"    {row},")
        print("[\n" + "\n".join(out) + "\n]")
    print(f"# table_md5 = {table_md5(merges)}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
