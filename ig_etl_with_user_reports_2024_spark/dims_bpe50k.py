"""tok6's 50000-rule BPE merge table — GENERATED data, do not hand-edit.

The table ships as a text resource (``data/bpe_merges_50000.txt``, one
``a b`` pair per line in merge order) rather than a ~12.5k-line Python
literal: same generation recipe, same md5 pin, same prefix-closure
assertion as dims_bpe's 2000-rule literal, but the data reads as data —
a 50k-row module would drown every diff and LoC count without adding
reviewability (the dated trade VERDICT r14 "Next round" #3 asked to
adjudicate; SCALE_r15 records it).

Regenerate with ``python tools/gen_bpe_merges.py --k 50000 --format
txt`` (the deterministic recipe shared with tools/tok_knee_probe.py:
100k-type syllable-structured Zipf vocabulary + the standard greedy BPE
trainer, Sennrich et al. 2016, ties lexical, via the
trajectory-identical incremental learn_merges_fast — 36s; the naive
trainer's O(K·corpus) recount would take hours at this K, which is WHY
the fast path exists and is identity-pinned in tests). One trajectory
produced all three shipped tables: dims.BPE_MERGES_500 is rows 0..499,
dims_bpe.BPE_MERGES_2000 is rows 0..1999, and this table is the full
50000 — the prefix-closure chain is asserted at import, so silent
drift between any pair fails loudly here rather than in a driver
verdict.

Scale note (why 50k): this is a REAL tokenizer's vocabulary size
(GPT-2's BPE ships 50k merges). tok6 runs this table through tok5's
registered production shape — Arrow-batched pandas UDF over the
DISTINCT vocabulary, broadcast join-back, corpus rows never leave the
JVM — against the same depth-50000 recursive-CTE oracle whose
feasibility SCALE_r14 §7 measured (DuckDB recursion linear in depth).
"""

from __future__ import annotations

import hashlib
import os

from .dims_bpe import BPE_MERGES_2000

# md5 of "\n".join(f"{a} {b}") over the ordered table, pinned so a
# regeneration that silently changes the recipe fails loudly here
# rather than in a driver verdict (tools/gen_bpe_merges.py prints it).
BPE_MERGES_50000_MD5 = "7334a7bd39fdbe846b268968f3bcd02b"

_PATH = os.path.join(os.path.dirname(__file__), "data", "bpe_merges_50000.txt")


def _load() -> list[tuple[str, str]]:
    with open(_PATH, encoding="ascii") as f:
        raw = f.read()
    if hashlib.md5(raw.strip().encode()).hexdigest() != BPE_MERGES_50000_MD5:
        raise ValueError(
            "bpe_merges_50000.txt checksum mismatch — the resource was "
            "edited or the generator recipe changed; regenerate via "
            "tools/gen_bpe_merges.py --k 50000 --format txt"
        )
    out: list[tuple[str, str]] = []
    for line in raw.split("\n"):
        if not line:
            continue
        a, b = line.split(" ")
        out.append((a, b))
    return out


BPE_MERGES_50000 = _load()

if len(BPE_MERGES_50000) != 50000:
    raise ValueError(
        f"expected 50000 merge rules, got {len(BPE_MERGES_50000)}"
    )

# tok6's SQL twin interpolates these symbols into a VALUES list and
# into literal replace patterns — a quote would break the oracle text,
# a space the two-space encoding's separator invariant (the space-split
# load above already guarantees the latter; both enforced for parity
# with dims/dims_bpe).
if not all(
    "'" not in a + b and " " not in a + b for a, b in BPE_MERGES_50000
):
    raise ValueError(
        "BPE_MERGES_50000 symbols must not contain quotes or spaces"
    )

# prefix-closure: one trainer trajectory produced all three shipped
# tables (tok5's 2000-rule literal IS rows 0..1999 of this one, and is
# itself asserted prefix-closed over tok4's 500 in dims_bpe)
if BPE_MERGES_50000[:2000] != list(BPE_MERGES_2000):
    raise ValueError(
        "BPE_MERGES_50000 is not prefix-closed over dims_bpe."
        "BPE_MERGES_2000 — regenerate all tables from "
        "tools/gen_bpe_merges.py"
    )
