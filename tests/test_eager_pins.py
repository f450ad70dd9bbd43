"""Eager localCheckpoint pin lifecycle (optimization r16).

Two invariants from VERDICT/ADVICE r15:

1. Bench-integrity: ``pin_bounded(eager=True)`` moves materialization to
   CONSTRUCTION time, which is only inside the bench clock for queries
   registered ``eager=True`` — a lazy-registered query reaching an eager
   pin would silently run timed work outside the clock. The test walks
   every non-eager registration and constructs its plan with eager pins
   instrumented to fail.

2. Bounded storage: eager checkpoints bypass the lazy FIFO registry, so
   without explicit release their blocks live until RDD GC. After a
   bench-style run (construct → noop write → release_eager_pins) the
   persistent-RDD map must return to its pre-query size — no orphans.
"""

from __future__ import annotations

import __spark_entry__  # noqa: F401 — imports the plan modules, filling QUERIES

from ig_etl_with_user_reports_2024_spark.operators import dedup as dd


def _persistent_count(spark) -> int:
    return spark.sparkContext._jsc.sc().getPersistentRDDs().size()


def _drain_lazy_pins() -> None:
    while dd._PERSISTED_HANDLES:
        dd._PERSISTED_HANDLES.pop(0).unpersist()


def test_release_eager_pins_frees_all_blocks(spark, sf_smoke):
    # dd10 exercises the full eager-pin surface: shingle/band pins via
    # eager_pins=True plus connected_components' edge + per-round label
    # checkpoints (whose final labels handle rides the same registry).
    from ig_etl_with_user_reports_2024_spark.plans import QUERIES

    dd.release_eager_pins()
    _drain_lazy_pins()
    before = _persistent_count(spark)
    spec = QUERIES["dd10_keep_list_banded"]
    assert spec.eager, "dd10 must be eager-registered for this probe"
    df = spec.fn(spark, sf_smoke)
    df.write.format("noop").mode("overwrite").save()
    assert dd._EAGER_HANDLES, "eager query should have registered pins"
    dd.release_eager_pins()
    _drain_lazy_pins()
    assert dd._EAGER_HANDLES == []
    after = _persistent_count(spark)
    assert after == before, (
        f"orphaned persistent RDDs after release: {before} -> {after}"
    )


def test_non_eager_queries_never_request_eager_pins(
    spark, sf_smoke, monkeypatch
):
    # Walk the whole catalog: constructing any NON-eager query's plan
    # must never reach pin_bounded(eager=True). All eager-capable call
    # sites resolve pin_bounded late (module attribute / function-local
    # import), so patching the dedup module attribute intercepts them.
    from ig_etl_with_user_reports_2024_spark.plans import QUERIES

    real = dd.pin_bounded
    offenders: list[str] = []
    current = {"name": ""}

    def guarded(df, eager=False):
        if eager:
            offenders.append(current["name"])
        return real(df, eager=eager)

    monkeypatch.setattr(dd, "pin_bounded", guarded)
    for name, spec in QUERIES.items():
        if spec.eager:
            continue
        current["name"] = name
        try:
            spec.fn(spark, sf_smoke)  # construction only, no action
        except Exception:  # noqa: BLE001 — a construction error at the
            # smoke SF is not this invariant's concern (bench.warm
            # tolerates the same); the eager-pin guard above still saw
            # every pin the construction reached before raising
            continue
    assert offenders == [], (
        f"non-eager queries requested eager pins (timed work would move "
        f"outside the bench clock): {sorted(set(offenders))}"
    )
