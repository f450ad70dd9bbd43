"""Regenerate the checked-in BPE merge tables (dims.BPE_MERGES_500 /
dims_bpe.BPE_MERGES_2000) from the deterministic recipe.

The recipe is tools/tok_knee_probe.py's: a 20k-type syllable-structured
vocabulary (synth_word), Zipf frequencies (freq ∝ 1/rank), and the
standard greedy BPE trainer (learn_merges, Sennrich et al. 2016; ties
lexical). One trainer run to K produces a PREFIX-CLOSED table — the
500-rule table is literally the first 500 rows of the 2000-rule run,
asserted in dims_bpe.py — so both checked-in literals regenerate
bit-identically from this script and drift is impossible without a
loud diff.

Usage:
    python tools/gen_bpe_merges.py --k 2000 [--vocab 20000]

Prints the Python literal (4 tuples per line, dims.py's layout) plus a
trailer line with the table md5 (the checksum dims_bpe.py pins).
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
    ap.add_argument("--vocab", type=int, default=20_000)
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

    out = []
    for i in range(0, len(merges), 4):
        row = ", ".join(f'("{a}","{b}")' for a, b in merges[i : i + 4])
        out.append(f"    {row},")
    print("[\n" + "\n".join(out) + "\n]")
    print(f"# table_md5 = {table_md5(merges)}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
