"""Enrichment (UD1/UD2) + JSONL batch source/sink tests."""

from __future__ import annotations

import json

from canadiannewsdatapipeline_spark.enrich import (
    score_sentiment,
    translate_language,
)
from canadiannewsdatapipeline_spark.sources.jsonl import (
    read_responses_jsonl,
    write_requests_jsonl,
)


def test_score_sentiment_deterministic(spark):
    df = spark.createDataFrame(
        [(1, "Carney said things."), (2, "Poilievre replied."), (3, None)],
        "id long, content string",
    )
    a = {r.id: (r.sentiment_mark, r.sentiment_poilievre)
         for r in score_sentiment(df, "content").collect()}
    b = {r.id: (r.sentiment_mark, r.sentiment_poilievre)
         for r in score_sentiment(df, "content").collect()}
    assert a == b
    assert a[3] == (None, None)
    for mark, _ in (a[1], a[2]):
        assert mark is None or 0.0 <= mark <= 1.0


def test_translate_conditional_overwrite(spark):
    df = spark.createDataFrame(
        [(1, "bonjour", "french"), (2, "hello", "english")],
        "id long, title string, language string",
    )
    out = {r.id: (r.title, r.language)
           for r in translate_language(df, ["title"]).collect()}
    assert out[1] == ("[en] bonjour", "english")
    assert out[2] == ("hello", "english")  # untouched


def test_jsonl_round_trip(spark, tmp_path):
    df = spark.createDataFrame([(7, "text seven"), (8, "text eight")], "id long, c string")
    req_path = str(tmp_path / "requests")
    write_requests_jsonl(df, req_path, "id", "c")
    lines = [json.loads(r.value) for r in spark.read.text(req_path).collect()]
    assert {l["custom_id"] for l in lines} == {"7", "8"}
    assert lines[0]["body"]["messages"][1]["role"] == "user"

    # synthesize the doubly-encoded response shape (S16)
    resp_rows = [
        json.dumps(
            {
                "custom_id": "7",
                "response": {
                    "body": {
                        "choices": [
                            {"message": {"content": json.dumps(
                                {"sentiment_mark": 0.75, "sentiment_poilievre": "N/A"}
                            )}}
                        ]
                    }
                },
            }
        )
    ]
    resp_path = tmp_path / "responses"
    resp_path.mkdir()
    (resp_path / "part-0.jsonl").write_text("\n".join(resp_rows))
    parsed = read_responses_jsonl(spark, str(resp_path)).collect()
    assert len(parsed) == 1
    assert parsed[0].custom_id == "7"
    assert parsed[0].sentiment_mark == 0.75
    assert parsed[0].sentiment_poilievre is None  # 'N/A' scrub


def test_two_phase_enrich_checkpoint_shape(spark, tmp_path):
    """Phase 1 writes requests; phase 2 joins responses back on id —
    the reference's submit/poll/load-later DAG shape (SURVEY §3.2)."""
    import json as _json

    from canadiannewsdatapipeline_spark.enrich.batch import two_phase_enrich

    df = spark.createDataFrame([(1, "alpha"), (2, "beta")], "id long, c string")
    req = str(tmp_path / "req")
    resp = tmp_path / "resp"
    resp.mkdir()
    # phase 2 input arrives "later" from the external batch job
    (resp / "part-0.jsonl").write_text(
        _json.dumps(
            {
                "custom_id": "1",
                "response": {"body": {"choices": [{"message": {"content": _json.dumps(
                    {"sentiment_mark": 0.25, "sentiment_poilievre": 0.5}
                )}}]}},
            }
        )
    )
    out = two_phase_enrich(df, "id", "c", req, str(resp))
    got = {r.id: (r.sentiment_mark, r.sentiment_poilievre) for r in out.collect()}
    assert got == {1: (0.25, 0.5), 2: (None, None)}  # unanswered row survives
    # phase-1 artifact exists and is replayable
    assert spark.read.text(req).count() == 2
