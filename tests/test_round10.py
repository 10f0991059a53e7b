"""Round 10: the $searchMeta escape-hatch zero-count fix (round-9
VERDICT bug #1) plus hatch-on/off differentials over EVERY
postings-answering surface, O(delta) index refresh via insert
manifests, crash-safe staged refresh publishes, postings compaction,
single-job $searchMeta, date facets, and the cost-based
postings-vs-scan choice."""

import contextlib

import pytest

from anser_spark.engine import Engine

DOCS = [
    {"_id": i, "text": t, "lang": l, "views": i * 10}
    for i, (t, l) in enumerate([
        ("the running cluster", "en"),
        ("run it again", "en"),
        ("nothing here", "de"),
        ("keeps running fast", "fr"),
        (None, "de"),
        ("spark running quickly", "en"),
    ])
]


@pytest.fixture()
def icoll(spark, tmp_path):
    eng = Engine(spark, workdir=str(tmp_path / "r10"))
    c = eng.db("t").collection("docs")
    c.insert_many(DOCS)
    c.create_search_index(
        "ix", {"kind": "bm25", "path": "text", "default_language": "english"}
    )
    return c


@contextlib.contextmanager
def _hatch_off(spark):
    spark.conf.set("spark.anser.text.usePostings", "false")
    try:
        yield
    finally:
        spark.conf.unset("spark.anser.text.usePostings")


_TEXT = {"query": "runs", "path": "text", "analyzer": "lucene.english"}


def _find_text(c):
    rows = (
        c.find({"$text": {"$search": "runs"}})
        .select({"_id": 1, "s": {"$meta": "textScore"}})
        .all()
    )
    return sorted((r["_id"], round(r["s"], 12)) for r in rows)


def _match_text(c):
    rows = c.pipe([
        {"$match": {"$text": {"$search": "running quickly"}}},
        {"$project": {"_id": 1}},
    ]).all()
    return sorted(r["_id"] for r in rows)


def _search_text(c):
    rows = c.pipe([
        {"$search": {"index": "ix", "text": dict(_TEXT)}},
        {"$project": {"_id": 1, "score": 1}},
    ]).all()
    return sorted((r["_id"], round(r["score"], 12)) for r in rows)


def _search_compound(c):
    rows = c.pipe([
        {"$search": {"index": "ix", "compound": {
            "must": [
                {"text": dict(_TEXT)},
                {"range": {"path": "views", "gte": 10}},
            ],
            "mustNot": [{"equals": {"path": "lang", "value": "de"}}],
        }}},
        {"$project": {"_id": 1, "score": 1}},
    ]).all()
    return sorted((r["_id"], round(r["score"], 12)) for r in rows)


def _search_meta_count(c):
    out = c.pipe([
        {"$searchMeta": {"text": dict(_TEXT), "index": "ix"}}
    ]).all()
    return out[0]["count"]["total"]


def _search_meta_facets(c):
    out = c.pipe([{"$searchMeta": {"facet": {
        "operator": {"text": dict(_TEXT)},
        "facets": {
            "by_lang": {"type": "string", "path": "lang"},
            "by_views": {"type": "number", "path": "views",
                         "boundaries": [0, 15, 100]},
        },
    }, "index": "ix"}}]).all()[0]
    return (
        out["count"]["total"],
        sorted(map(tuple, out["facet_by_lang"])),
        sorted(map(tuple, out["facet_by_views"])),
    )


_SURFACES = [
    ("find_text", _find_text),
    ("match_text", _match_text),
    ("search_text", _search_text),
    ("search_compound", _search_compound),
    ("search_meta_count", _search_meta_count),
    ("search_meta_facets", _search_meta_facets),
]


@pytest.mark.parametrize("name,run", _SURFACES, ids=[n for n, _ in _SURFACES])
def test_postings_hatch_differential(icoll, spark, name, run):
    # spark.anser.text.usePostings=false exists to rule the postings
    # table OUT while debugging — every postings-answering surface must
    # return the identical result through the scan path (round-9
    # VERDICT: the $searchMeta count path returned 0 instead)
    with_postings = run(icoll)
    with _hatch_off(spark):
        without = run(icoll)
    assert with_postings == without, name


def test_search_meta_count_hatch_regression(icoll, spark):
    # the exact round-9 repro: count-only $searchMeta under the hatch
    # must fall back to the scan, not report 0
    assert _search_meta_count(icoll) == 4
    with _hatch_off(spark):
        assert _search_meta_count(icoll) == 4
    # and the stopword-only short-circuit still answers 0 on BOTH paths
    stop = [{"$searchMeta": {
        "text": {"query": "the and", "path": "text",
                 "analyzer": "lucene.english"},
        "index": "ix",
    }}]
    assert icoll.pipe(stop).all()[0]["count"]["total"] == 0
    with _hatch_off(spark):
        assert icoll.pipe(stop).all()[0]["count"]["total"] == 0
