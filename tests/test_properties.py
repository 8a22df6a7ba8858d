"""Property-based tests (hypothesis) for the invariants that matter
at any scale. Example counts are small — each example round-trips
through the JVM."""

from __future__ import annotations

import hashlib
from datetime import datetime, timedelta

from hypothesis import given, settings, strategies as st

from canadiannewsdatapipeline_spark.functions.keys import NULL_PLACEHOLDER

TEXT = st.text(
    alphabet=st.characters(whitelist_categories=("Ll", "Lu", "Nd"), max_codepoint=0x7F),
    min_size=0,
    max_size=20,
)


@settings(max_examples=8, deadline=None)
@given(st.lists(st.one_of(TEXT, st.none()), min_size=1, max_size=4))
def test_surrogate_key_matches_reference_recipe(spark, cols):
    """surrogate_key == md5(concat_ws('-', coalesce(col, placeholder)))
    for arbitrary string/null inputs (dbt_utils 1.3.0 recipe)."""
    from pyspark.sql import functions as F

    from canadiannewsdatapipeline_spark.functions.keys import surrogate_key

    df = spark.createDataFrame(
        [tuple(cols)], ", ".join(f"c{i} string" for i in range(len(cols)))
    )
    got = df.select(
        surrogate_key(*[F.col(f"c{i}") for i in range(len(cols))]).alias("k")
    ).first().k
    expected = hashlib.md5(
        "-".join(c if c is not None else NULL_PLACEHOLDER for c in cols).encode()
    ).hexdigest()
    assert got == expected


@settings(max_examples=6, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 2), st.integers(0, 10_000)),  # (user, offset_min)
        min_size=1,
        max_size=25,
        unique=True,
    )
)
def test_sessionize_invariants(spark, events):
    """For any event stream: session ids are contiguous from 1 per
    user, non-decreasing in time order, and adjacent events in the
    same session are <= gap apart."""
    from canadiannewsdatapipeline_spark.operators.sessionize import sessionize

    t0 = datetime(2024, 1, 1)
    rows = [
        (i, user, t0 + timedelta(minutes=off), 1.0)
        for i, (user, off) in enumerate(events)
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, value double"
    )
    out = sessionize(df, gap_minutes=30).collect()
    by_user: dict[int, list] = {}
    for r in sorted(out, key=lambda r: (r.user_id, r.ts, r.event_id)):
        by_user.setdefault(r.user_id, []).append(r)
    for rs in by_user.values():
        assert rs[0].session_id == 1
        for a, b in zip(rs, rs[1:]):
            gap = (b.ts - a.ts).total_seconds()
            if b.session_id == a.session_id:
                assert gap <= 1800
            else:
                assert b.session_id == a.session_id + 1 and gap > 1800


@settings(max_examples=6, deadline=None)
@given(st.lists(TEXT, min_size=1, max_size=6))
def test_exact_dedup_partitions_rows(spark, texts):
    """Dedup groups partition the input: group sizes sum to the row
    count, and canonical ids are members of their group."""
    from canadiannewsdatapipeline_spark.operators.dedup import exact_dup_groups

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "id long, t string"
    )
    groups = exact_dup_groups(df, "t", "id").collect()
    assert sum(g.n_dups for g in groups) == len(texts)
    assert all(0 <= g.canonical_id < len(texts) for g in groups)


@settings(max_examples=6, deadline=None)
@given(
    st.lists(st.integers(0, 30), min_size=1, max_size=12, unique=True),
    st.lists(st.integers(0, 40), min_size=0, max_size=12, unique=True),
)
def test_merge_upsert_key_algebra(spark, target_keys, source_keys):
    """Merged key set == target ∪ source; matched rows take source
    values; unmatched target rows pass through unchanged."""
    from canadiannewsdatapipeline_spark.operators.merge import merge_upsert

    t = spark.createDataFrame([(k, f"t{k}") for k in target_keys], "k long, v string")
    s = spark.createDataFrame(
        [(k, f"s{k}") for k in source_keys], "k long, v string"
    ) if source_keys else spark.createDataFrame([], "k long, v string")
    out = {r.k: r.v for r in merge_upsert(t, s, ["k"]).collect()}
    assert set(out) == set(target_keys) | set(source_keys)
    for k in set(target_keys) | set(source_keys):
        assert out[k] == (f"s{k}" if k in source_keys else f"t{k}")


@settings(max_examples=5, deadline=None)
@given(st.integers(min_value=2, max_value=28))
def test_scd2_incremental_equals_rebuild_any_cutoff(spark, cutoff_day):
    # the incremental-apply invariant must hold for EVERY cutoff, not
    # just the registered query's fixed date
    from pyspark.sql import functions as F

    from canadiannewsdatapipeline_spark.operators.scd import (
        scd2_apply_changes,
        scd2_history,
    )
    from canadiannewsdatapipeline_spark.sources.registry import load_table

    ev = load_table(spark, "/root/testdata/sf0.001", "events").filter(
        F.col("event_type") == "signup"
    )
    cutoff = F.lit(f"2024-01-{cutoff_day:02d}").cast("timestamp")
    full = scd2_history(
        ev, ["user_id"], "ts", ["value"], tiebreak_cols=["event_id"]
    )
    # event_id rides through dim and batch so the incremental rebuild
    # tiebreaks duplicate (user_id, ts) rows exactly like the full build
    dim = scd2_history(
        ev.filter(F.col("ts") < cutoff), ["user_id"], "ts",
        ["value", "event_id"], tiebreak_cols=["event_id"],
    )
    batch = ev.filter(F.col("ts") >= cutoff).select(
        "user_id", "value", "event_id", F.col("ts").alias("valid_from")
    )
    inc = scd2_apply_changes(
        dim, batch, ["user_id"], "valid_from", tiebreak_cols=["event_id"]
    )
    cols = ["user_id", "value", "valid_from", "valid_to", "is_current", "version"]
    a = {tuple(r) for r in full.select(*cols).collect()}
    b = {tuple(r) for r in inc.select(*cols).collect()}
    assert a == b and len(a) > 0


@settings(max_examples=5, deadline=None)
@given(st.integers(min_value=2, max_value=11))
def test_kmv_merge_invariant_any_grouping(spark, n_groups):
    # k smallest of unioned per-group sketches == direct global sketch,
    # for ANY partition of the values into groups
    from pyspark.sql import functions as F

    from canadiannewsdatapipeline_spark.operators.sketch import (
        kmv_distinct,
        kmv_merged_global,
    )
    from canadiannewsdatapipeline_spark.sources.registry import load_table

    ev = load_table(spark, "/root/testdata/sf0.001", "events").withColumn(
        "g", (F.col("event_id") % n_groups).cast("int")
    )
    merged = kmv_merged_global(ev, "g", "user_id", k=32).collect()[0]
    direct = (
        kmv_distinct(ev.withColumn("g", F.lit(0)), "g", "user_id", k=32)
        .select("n_kept", "u_k", "kmv_est")
        .collect()[0]
    )
    assert (merged.n_kept, merged.u_k, merged.kmv_est) == (
        direct.n_kept, direct.u_k, direct.kmv_est,
    )
