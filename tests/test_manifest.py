"""cm1_corpus_manifest contract tests beyond the oracle net: every
document gets exactly one manifest row, including token-less documents
(which txt8 has no row for — the left-join + null-as-not-keep path)."""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

import __spark_entry__ as entry_mod


@pytest.fixture(scope="module")
def tiny_sf(spark):
    # a documents table with an empty-text and a whitespace-only doc —
    # both tokenize to nothing, so txt8 emits no row for them
    out = tempfile.mkdtemp(prefix="manifest_sf_")
    spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog again and again", "en", "src0", 60),
            (2, "the quick brown fox jumps over the lazy dog again and again", "en", "src0", 60),
            (3, "", "en", "src1", 0),
            (4, "   ", "en", "src1", 3),
            (5, "completely different words here that share nothing at all okay", "en", "src2", 62),
        ],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    ).write.mode("overwrite").parquet(f"{out}/documents.parquet")
    yield out
    shutil.rmtree(out, ignore_errors=True)


def test_manifest_covers_every_document(spark, tiny_sf):
    out = entry_mod.queries()["cm1_corpus_manifest"](spark, tiny_sf)
    rows = {r.doc_id: r for r in out.collect()}
    assert set(rows) == {1, 2, 3, 4, 5}  # token-less docs 3/4 included
    # token-less train docs are drop_quality with a null score, never
    # missing — unless the hash split holds them out
    for d in (3, 4):
        assert rows[d].action in ("drop_quality", "hold_out")
        assert rows[d].quality_score is None
    # the duplicate pair: exactly one of (1, 2) survives dedup unless
    # held out / contaminated by the split
    actions = {rows[1].action, rows[2].action}
    assert "drop_duplicate" in actions or actions <= {"hold_out", "drop_contaminated"}
