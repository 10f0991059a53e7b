"""Round-2 expression/accumulator additions: set predicates, N-variants,
$top/$bottom, $median/$percentile, regex find, extended dates, trig."""

import pytest

pytestmark = []


def pipe(coll, stages):
    return coll.pipe(stages).all()


@pytest.fixture()
def nums(engine, spark):
    c = engine.db("appdb").collection("nums2")
    c._rewrite(spark.createDataFrame(
        [("a", 1, 10.0, "2024-03-05 10:20:30"),
         ("a", 2, 30.0, "2024-03-06 11:00:00"),
         ("a", 3, 20.0, "2024-03-07 12:00:00"),
         ("b", 4, 5.0, "2024-12-31 23:59:59"),
         ("b", 5, None, "2024-01-01 00:00:00")],
        "g string, k int, v double, ts_s string"))
    return c


def test_set_predicates(nums):
    out = pipe(nums, [
        {"$limit": 1},
        {"$project": {
            "sub": {"$setIsSubset": [[1, 2], [3, 2, 1]]},
            "nsub": {"$setIsSubset": [[1, 9], [3, 2, 1]]},
            "eq": {"$setEquals": [[1, 2, 2], [2, 1]]},
            "any": {"$anyElementTrue": [[False, None, True]]},
            "all": {"$allElementsTrue": [[1, 2]]},
            "nall": {"$allElementsTrue": [[1, 0]]},
        }},
    ])[0]
    assert out["sub"] is True and out["nsub"] is False
    assert out["eq"] is True
    assert out["any"] is True and out["all"] is True and out["nall"] is False


def test_array_n_variants_and_sort(nums):
    out = pipe(nums, [
        {"$limit": 1},
        {"$project": {
            "f2": {"$firstN": {"input": [5, 1, 4, 2], "n": 2}},
            "l2": {"$lastN": {"input": [5, 1, 4, 2], "n": 2}},
            "mx2": {"$maxN": {"input": [5, 1, None, 4, 2], "n": 2}},
            "mn2": {"$minN": {"input": [5, 1, None, 4, 2], "n": 2}},
            "srt": {"$sortArray": {"input": [3, 1, 2], "sortBy": -1}},
            "fst": {"$first": [7, 8]},
            "lst": {"$last": [7, 8]},
            "emptyfst": {"$first": {"$literal": []}},
            "med": {"$median": {"input": [1, 9, 3]}},
        }},
    ])[0]
    assert out["f2"] == [5, 1] and out["l2"] == [4, 2]
    assert out["mx2"] == [5, 4] and out["mn2"] == [1, 2]
    assert out["srt"] == [3, 2, 1]
    assert out["fst"] == 7 and out["lst"] == 8
    assert out["emptyfst"] is None
    assert out["med"] == 3


def test_group_median_percentile(nums):
    out = {r["_id"]: r for r in pipe(nums, [
        {"$group": {
            "_id": "$g",
            "med": {"$median": {"input": "$v", "method": "approximate"}},
            "p": {"$percentile": {"input": "$v", "p": [0.0, 1.0], "method": "approximate"}},
        }},
    ])}
    assert out["a"]["med"] == 20.0
    assert out["a"]["p"] == [10.0, 30.0]
    assert out["b"]["med"] == 5.0  # null ignored


def test_group_top_bottom(nums):
    out = {r["_id"]: r for r in pipe(nums, [
        {"$group": {
            "_id": "$g",
            "top": {"$top": {"output": "$k", "sortBy": {"v": 1}}},
            "bot": {"$bottom": {"output": "$k", "sortBy": {"v": 1}}},
            "top2": {"$topN": {"output": "$k", "sortBy": {"v": 1}, "n": 2}},
            "bot2": {"$bottomN": {"output": "$k", "sortBy": {"v": 1}, "n": 2}},
        }},
    ])}
    # group a by v asc: (10,k1) (20,k3) (30,k2)
    assert out["a"]["top"] == 1 and out["a"]["bot"] == 2
    assert out["a"]["top2"] == [1, 3] and out["a"]["bot2"] == [3, 2]
    # group b: null v sorts first asc (Spark sort_array null-first)
    assert out["b"]["top2"] == [5, 4]


def test_group_maxn_firstn(nums):
    out = {r["_id"]: r for r in pipe(nums, [
        {"$sort": {"k": 1}},
        {"$group": {
            "_id": "$g",
            "mx": {"$maxN": {"input": "$v", "n": 2}},
            "mn": {"$minN": {"input": "$v", "n": 1}},
            "f2": {"$firstN": {"input": "$v", "n": 2}},
        }},
    ])}
    assert out["a"]["mx"] == [30.0, 20.0]
    assert out["a"]["mn"] == [10.0]
    assert out["b"]["mn"] == [5.0]


def test_regex_find_ops(nums):
    out = pipe(nums, [
        {"$limit": 1},
        {"$project": {
            "f": {"$regexFind": {"input": {"$literal": "foo123bar45"}, "regex": r"\d+"}},
            "fa": {"$regexFindAll": {"input": {"$literal": "foo123bar45"}, "regex": r"\d+"}},
            "none": {"$regexFind": {"input": {"$literal": "xyz"}, "regex": r"\d+"}},
            "r1": {"$replaceOne": {"input": {"$literal": "aXbXc"}, "find": "X", "replacement": "-"}},
            "rnone": {"$replaceOne": {"input": {"$literal": "abc"}, "find": "X", "replacement": "-"}},
        }},
    ])[0]
    assert out["f"]["match"] == "123" and out["f"]["idx"] == 3
    assert out["f"]["captures"] == []
    # Mongo shape: array of {match, idx, captures} documents
    assert [(m["match"], m["idx"]) for m in out["fa"]] == [("123", 3), ("45", 9)]
    assert out["none"] is None
    assert out["r1"] == "a-bXc" and out["rnone"] == "abc"


def test_regex_find_captures_and_repeated_matches(nums):
    out = pipe(nums, [
        {"$limit": 1},
        {"$project": {
            # repeated identical matches: idx must be each occurrence's
            # own position, not the first occurrence's
            "rep": {"$regexFindAll": {"input": {"$literal": "ab ab ab"}, "regex": "ab"}},
            "caps": {"$regexFindAll": {"input": {"$literal": "k=1, j=22"},
                                       "regex": r"(\w+)=(\d+)"}},
            "fcap": {"$regexFind": {"input": {"$literal": "x=9"},
                                    "regex": r"(\w+)=(\d+)"}},
            "ci": {"$regexFindAll": {"input": {"$literal": "Foo foo"},
                                     "regex": "foo", "options": "i"}},
        }},
    ])[0]
    assert [(m["match"], m["idx"]) for m in out["rep"]] == [("ab", 0), ("ab", 3), ("ab", 6)]
    assert [(m["match"], m["idx"], list(m["captures"])) for m in out["caps"]] == [
        ("k=1", 0, ["k", "1"]), ("j=22", 5, ["j", "22"])]
    assert out["fcap"]["captures"] == ["x", "9"]
    assert [(m["match"], m["idx"]) for m in out["ci"]] == [("Foo", 0), ("foo", 4)]


def test_extended_dates(nums):
    out = pipe(nums, [
        {"$match": {"k": 1}},
        {"$addFields": {"ts": {"$dateFromString": {"dateString": "$ts_s",
                                                   "format": "%Y-%m-%d %H:%M:%S"}}}},
        {"$project": {
            "iso_dow": {"$isoDayOfWeek": "$ts"},     # 2024-03-05 is a Tuesday
            "iso_w": {"$isoWeek": "$ts"},
            "parts": {"$dateToParts": {"date": "$ts"}},
            "made": {"$dateFromParts": {"year": 2024, "month": 3, "day": 5,
                                        "hour": 10, "minute": 20, "second": 30}},
            "ms": {"$millisecond": "$ts"},
        }},
    ])[0]
    assert out["iso_dow"] == 2
    assert out["parts"]["year"] == 2024 and out["parts"]["second"] == 30
    assert str(out["made"]).startswith("2024-03-05 10:20:30")
    assert out["ms"] == 0


def test_trig_and_bits(nums):
    import math
    out = pipe(nums, [
        {"$limit": 1},
        {"$project": {
            "s": {"$sin": {"$divide": [math.pi, 2]}},
            "at2": {"$atan2": [1.0, 1.0]},
            "deg": {"$radiansToDegrees": math.pi},
            "band": {"$bitAnd": [12, 10]},
            "bor": {"$bitOr": [12, 10]},
            "bxor": {"$bitXor": [12, 10]},
            "bnot": {"$bitNot": 0},
            "bsz": {"$binarySize": "hello"},
        }},
    ])[0]
    assert abs(out["s"] - 1.0) < 1e-12
    assert abs(out["at2"] - math.pi / 4) < 1e-12
    assert abs(out["deg"] - 180.0) < 1e-9
    assert out["band"] == 8 and out["bor"] == 14 and out["bxor"] == 6
    assert out["bnot"] == -1
    assert out["bsz"] == 5


def test_get_set_unset_field(doc_collection):
    out = {r["_id"]: r for r in pipe(doc_collection, [
        {"$project": {
            "owner": {"$getField": {"input": "$meta", "field": "owner"}},
            "meta2": {"$setField": {"input": "$meta", "field": "repo", "value": "X"}},
            "meta3": {"$unsetField": {"input": "$meta", "field": "attempt"}},
        }},
    ])}
    assert out["a1"]["owner"] == "alice"
    assert out["a1"]["meta2"]["repo"] == "X"
    assert "attempt" not in out["a1"]["meta3"]


def test_window_median_percentile(nums):
    out = {r["k"]: r for r in pipe(nums, [
        {"$setWindowFields": {
            "partitionBy": "$g",
            "sortBy": {"k": 1},
            "output": {
                "med": {"$median": {"input": "$v", "method": "approximate"}},
                "p50": {"$percentile": {"input": "$v", "p": [0.5],
                                        "method": "approximate"}},
            },
        }},
    ])}
    # whole-partition default frame: group a vals {10,30,20} → med 20
    assert out[1]["med"] == 20.0 and out[2]["med"] == 20.0
    assert out[1]["p50"] == [20.0]
    assert out[4]["med"] == 5.0  # group b: null ignored


def test_let_and_type_introspection(doc_collection):
    out = {r["_id"]: r for r in pipe(doc_collection, [
        {"$project": {
            "tot": {"$let": {
                "vars": {"p": {"$ifNull": ["$priority", 0]}, "v": "$version"},
                "in": {"$add": ["$$p", "$$v"]},
            }},
            "t_status": {"$type": "$status"},
            "t_prio": {"$type": "$priority"},
            "t_tags": {"$type": "$tags"},
            "t_meta": {"$type": "$meta"},
            "t_missing": {"$type": "$nope"},
            "isnum": {"$isNumber": "$priority"},
            "isarr": {"$isArray": "$tags"},
        }},
    ])}
    assert out["a1"]["tot"] == 10
    assert out["a3"]["tot"] == 2  # null priority → 0 + version 2
    assert out["a1"]["t_status"] == "string"
    assert out["a1"]["t_prio"] == "long"
    assert out["a3"]["t_prio"] == "null"   # null value
    assert out["a1"]["t_tags"] == "array"
    assert out["a1"]["t_meta"] == "object"
    assert out["a1"]["t_missing"] == "missing"
    assert out["a1"]["isnum"] is True and out["a3"]["isnum"] is False
    assert out["a1"]["isarr"] is True


def test_sample_rate_match(engine):
    orders = engine.db("tpch").collection("orders")
    n_all = orders.count()
    n_half = len(orders.find({"$sampleRate": 0.5}).all())
    assert 0 < n_half < n_all
    assert len(orders.find({"$sampleRate": 0.0}).all()) == 0
    assert len(orders.find({"$sampleRate": 1.0}).all()) == n_all


def test_to_object_id(spark):
    from pyspark.sql import functions as F

    from anser_spark.functions.expressions import compile_expr

    df = spark.createDataFrame(
        [("507F1F77BCF86CD799439011",), (None,)], "s string"
    )
    out = df.select(
        compile_expr({"$toObjectId": "$s"}, df.schema).alias("o")
    ).collect()
    assert out[0]["o"] == "507f1f77bcf86cd799439011"
    assert out[1]["o"] is None
    bad = spark.createDataFrame([("nope",)], "s string")
    import pytest as _pytest

    with _pytest.raises(Exception, match="invalid ObjectId"):
        bad.select(
            compile_expr({"$toObjectId": "$s"}, bad.schema).alias("o")
        ).collect()
