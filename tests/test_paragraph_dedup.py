"""Cross-document paragraph dedup (doc_dedupe.dedupe_paragraphs):
global keep-first semantics, order preservation, blank paragraphs
never deduped, every doc present in output."""

from __future__ import annotations

from mergeaddressesandbuildings_spark.operators import doc_dedupe


def test_keep_first_occurrence_globally(spark):
    mk = lambda *ls: "\n".join(ls)  # noqa: E731
    df = spark.createDataFrame(
        [(1, mk("shared promo", "body A")),
         (2, mk("shared promo", "body B", "", "body A")),
         (3, mk("body C", "shared promo"))],
        "doc_id long, text string")
    out = {r["doc_id"]: r
           for r in doc_dedupe.dedupe_paragraphs(df).collect()}
    # doc 1 is the first occurrence of both its paragraphs
    assert out[1]["clean_text"] == "shared promo\nbody A"
    assert out[1]["n_dropped"] == 0
    # doc 2 loses the promo AND 'body A' (doc 1 owns it); blank kept
    assert out[2]["clean_text"] == "body B\n"
    assert out[2]["n_dropped"] == 2
    assert out[2]["n_paragraphs"] == 4
    # doc 3 keeps its unique body, loses the promo
    assert out[3]["clean_text"] == "body C"
    assert len(out) == 3


def test_within_doc_repeats_keep_position_order(spark):
    df = spark.createDataFrame(
        [(7, "x\ny\nx\nx")], "doc_id long, text string")
    out = doc_dedupe.dedupe_paragraphs(df).collect()[0]
    # the FIRST x survives, later in-doc repeats drop
    assert out["clean_text"] == "x\ny"
    assert out["n_dropped"] == 2


def test_all_dropped_doc_still_present(spark):
    df = spark.createDataFrame(
        [(1, "only"), (2, "only")], "doc_id long, text string")
    out = {r["doc_id"]: r
           for r in doc_dedupe.dedupe_paragraphs(df).collect()}
    assert out[2]["clean_text"] == "" and out[2]["n_dropped"] == 1
