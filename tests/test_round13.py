"""Round-13 surface: Tarjan all-SCC cycle reporting, schema-evolving
partial COW, multi-path phrase/autocomplete from weighted postings,
named ivfpq index kind, stale-ivf freshness fallback.

Reference parity notes: dependency_network.go:114-119 (all SCCs per
validate), example_test.go:50-66 / README.rst:34-38 ($rename / add-field
migrations as the flagship simple-migration shapes).
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from anser_spark.migrations.network import DependencyNetwork


# ---------------------------------------------------------------------
# VERDICT r12 #5: all SCCs in one validate pass
# ---------------------------------------------------------------------

def test_network_reports_all_disjoint_cycles_in_one_pass():
    net = DependencyNetwork()
    # cycle 1: a <-> b; cycle 2: x -> y -> z -> x; acyclic tail m -> a
    net.add("a", "b")
    net.add("b", "a")
    net.add("x", "y")
    net.add("y", "z")
    net.add("z", "x")
    net.add("m", "a")
    problems = net.validate()
    cycles = [p for p in problems if p.startswith("cycle detected")]
    assert len(cycles) == 2, problems
    joined = "\n".join(cycles)
    assert "a" in joined and "b" in joined
    assert "x" in joined and "y" in joined and "z" in joined
    # the acyclic node is not reported
    assert not any("m" in c.split(": ")[1].split(" -> ") for c in cycles)


def test_network_self_loop_is_a_cycle():
    net = DependencyNetwork()
    net.add("solo", "solo")
    net.add("fine")
    problems = net.validate()
    assert any("solo" in p and "cycle" in p for p in problems)
    assert len([p for p in problems if "cycle" in p]) == 1


def test_network_acyclic_still_validates_clean():
    net = DependencyNetwork()
    net.add("a")
    net.add("b", "a")
    net.add("c", "b", "a")
    assert net.validate() == []
    assert net.waves() == [["a"], ["b"], ["c"]]


# ---------------------------------------------------------------------
# VERDICT r12 #1: schema-evolving partial COW — a $set adding a new
# field or a $rename (the reference's flagship migration shapes,
# example_test.go:50-66, README.rst:34-38) must not rewrite the corpus
# ---------------------------------------------------------------------

from anser_spark.engine import Engine  # noqa: E402


def _mkc(spark, tmp_path, tag):
    eng = Engine(spark, workdir=str(tmp_path / tag))
    return eng.db("t").collection("docs")


def _seed_files(c, n=12):
    c.insert_many([
        {"_id": i, "text": f"spark doc number {i}", "v": 0}
        for i in range(n // 2)
    ])
    c.insert_many([
        {"_id": i, "text": f"running cluster item {i}", "v": 0}
        for i in range(n // 2, n)
    ])


SPEC = {"kind": "bm25", "path": "text", "default_language": "english"}


def _rows(c):
    return sorted(
        (tuple(sorted(r.items())) for r in c.find({}).all()),
    )


def test_set_new_field_links_untouched_files(spark, tmp_path):
    c = _mkc(spark, tmp_path, "evo1")
    _seed_files(c)
    before_inodes = {
        os.path.relpath(f, c.current_path()): os.stat(f).st_ino
        for f in c._data_files(c.current_path())
    }
    info = c.update_all({"_id": {"$lt": 3}}, {"$set": {"flag": "new"}})
    assert info.updated == 3
    after_dir = c.current_path()
    after_inodes = {
        os.path.relpath(f, after_dir): os.stat(f).st_ino
        for f in c._data_files(after_dir)
    }
    # at least one untouched file was hard-linked byte-identical (the
    # old version dir is reaped, so compare captured inodes)
    shared = [
        rel for rel, ino in before_inodes.items()
        if after_inodes.get(rel) == ino
    ]
    assert shared, "no untouched file survived as a hard link"
    # the union sidecar exists and reads reconcile
    assert os.path.isfile(os.path.join(after_dir, "_SCHEMA.json"))
    assert c.count_documents({"flag": "new"}) == 3
    assert c.count_documents({"flag": None}) == 9  # null/missing on old files
    assert "flag" in c.df().columns


def test_set_new_field_bit_equal_to_full_rewrite(spark, tmp_path):
    a = _mkc(spark, tmp_path, "evo2a")
    b = _mkc(spark, tmp_path, "evo2b")
    for c in (a, b):
        _seed_files(c)
    a.update_all({"v": 0, "_id": {"$gte": 6}}, {"$set": {"stage": "late", "v2": 7}})
    # twin: force the full-rewrite path by touching every file
    b.update_all({"v": 0, "_id": {"$gte": 6}}, {"$set": {"stage": "late", "v2": 7}})
    b._rewrite(b.df())  # homogenize the twin
    assert _rows(a) == _rows(b)


def test_rename_partial_match_stays_partial(spark, tmp_path):
    c = _mkc(spark, tmp_path, "evo3")
    _seed_files(c)
    before_inodes = {
        os.path.relpath(f, c.current_path()): os.stat(f).st_ino
        for f in c._data_files(c.current_path())
    }
    c.update_all({"_id": {"$lt": 2}}, {"$rename": {"v": "version"}})
    after_dir = c.current_path()
    after_inodes = {
        os.path.relpath(f, after_dir): os.stat(f).st_ino
        for f in c._data_files(after_dir)
    }
    linked = [
        rel for rel, ino in before_inodes.items()
        if after_inodes.get(rel) == ino
    ]
    assert linked, "rename rewrote every file"
    docs = {r["_id"]: r for r in c.find({}).all()}
    assert docs[0].get("version") == 0 and docs[0].get("v") is None
    assert docs[5].get("v") == 0 and docs[5].get("version") is None


def test_insert_with_new_column_appends_not_rewrites(spark, tmp_path):
    c = _mkc(spark, tmp_path, "evo4")
    _seed_files(c)
    before_inodes = {
        os.path.relpath(f, c.current_path()): os.stat(f).st_ino
        for f in c._data_files(c.current_path())
    }
    c.insert_many([{"_id": 100, "text": "fresh doc", "v": 1, "lang": "en"}])
    after_dir = c.current_path()
    after_inodes = {
        os.path.relpath(f, after_dir): os.stat(f).st_ino
        for f in c._data_files(after_dir)
    }
    shared = [
        rel for rel, ino in before_inodes.items()
        if after_inodes.get(rel) == ino
    ]
    # EVERY pre-existing file must survive as a hard link (pure append)
    assert len(shared) == len(before_inodes), (len(shared), len(before_inodes))
    assert c.count_documents({}) == 13
    assert c.find_id(100).one()["lang"] == "en"
    assert c.find_id(0).one().get("lang") is None


def test_column_drop_still_full_rewrites_correctly(spark, tmp_path):
    # non-additive evolution (a $unset matching EVERY doc drops the
    # column under BSON semantics) takes the conservative full rewrite
    c = _mkc(spark, tmp_path, "evo5")
    _seed_files(c)
    c.update_all({}, {"$unset": {"v": ""}})
    assert "v" not in c.df().columns
    assert c.count_documents({}) == 12
    # homogeneous again: no sidecar needed
    assert not os.path.isfile(os.path.join(c.current_path(), "_SCHEMA.json"))


def test_schema_evolution_keeps_index_refresh_incremental(spark, tmp_path):
    from tests.test_round12 import _bm25_state

    c = _mkc(spark, tmp_path, "evo6")
    _seed_files(c)
    c.create_search_index("ix", dict(SPEC))
    c.update_all({"_id": {"$lt": 3}}, {"$set": {"tag": "alpha"}})
    out = c.refresh_search_index("ix")
    assert out["mode"] == "incremental", out
    # a second, value-only mutation chains on the mixed dataset
    c.update_all({"_id": 4}, {"$set": {"text": "replaced text four"}})
    out = c.refresh_search_index("ix")
    assert out["mode"] == "incremental", out
    # and a second schema-adding one
    c.update_all({"_id": {"$gte": 10}}, {"$set": {"extra": 1}})
    out = c.refresh_search_index("ix")
    assert out["mode"] == "incremental", out
    inc = _bm25_state(c, spark, "ix")
    c.create_search_index("ix2", dict(SPEC))
    assert inc == _bm25_state(c, spark, "ix2")
    assert sorted(
        r["_id"] for r in c.find({"$text": {"$search": "replaced"}}).all()
    ) == [4]


def test_time_travel_sees_per_version_schema(spark, tmp_path):
    c = _mkc(spark, tmp_path, "evo7")
    c.set_retention(5)
    _seed_files(c)
    v_old = c._pointer()
    c.update_all({"_id": 0}, {"$set": {"nova": True}})
    assert "nova" not in c.df_at(v_old).columns
    assert "nova" in c.df().columns
    diff = c.diff_versions(v_old)
    kinds = {r["change_type"] for r in diff.collect()}
    assert kinds == {"added", "removed"}


def test_filter_on_added_column_pushes_down(spark, tmp_path):
    c = _mkc(spark, tmp_path, "evo8")
    _seed_files(c)
    c.update_all({"_id": {"$lt": 2}}, {"$set": {"grade": 9}})
    q = c.find({"grade": {"$gte": 5}})
    assert sorted(r["_id"] for r in q.all()) == [0, 1]
    plan = q.to_df()._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan


@pytest.mark.parametrize("seed", [13, 4242])
def test_schema_evolving_mutation_fuzz(spark, tmp_path, seed):
    """The round-12 hybrid-mutation fuzzer extended with schema-ADDING
    ops ($set new fields, partial-match $rename, inserts carrying new
    columns). Invariants per step: engine state equals a driver-side
    truth model (None-normalized), every index refresh is incremental
    or noop, refreshed state is bit-equal to a fresh rebuild, and
    postings-on == postings-off."""
    import random

    from tests.test_round12 import _bm25_state

    rng = random.Random(seed)
    c = _mkc(spark, tmp_path, f"sfz{seed}")
    words = ["spark", "running", "cluster", "mongo", "quick", "delta"]

    truth: dict[int, dict] = {}

    def mk_doc(i, extra=None):
        d = {"_id": i, "text": " ".join(rng.choices(words, k=4)), "v": 0}
        if extra:
            d.update(extra)
        return d

    def seed_batch(ids, extra=None):
        docs = [mk_doc(i, extra) for i in ids]
        c.insert_many([dict(d) for d in docs])
        for d in docs:
            truth[d["_id"]] = dict(d)

    seed_batch(range(5))
    seed_batch(range(5, 10))
    c.create_search_index("ix", dict(SPEC))
    next_id = 1000
    next_field = 0

    def check_state(step):
        got = {}
        for r in c.find({}).all():
            got[r["_id"]] = {k: v for k, v in r.items() if v is not None}
        want = {
            i: {k: v for k, v in d.items() if v is not None}
            for i, d in truth.items()
        }
        assert got == want, (seed, step)

    for step in range(12):
        op = rng.choice(
            ["add_field", "add_field", "insert_new_col", "value_update",
             "rename", "remove", "insert"]
        )
        live = sorted(truth)
        if op == "add_field" and live:
            fname = f"f{next_field}"
            next_field += 1
            victims = rng.sample(live, k=min(len(live), rng.randint(1, 3)))
            val = rng.randint(1, 99)
            c.update_all({"_id": {"$in": victims}}, {"$set": {fname: val}})
            for i in victims:
                truth[i][fname] = val
        elif op == "insert_new_col":
            fname = f"g{next_field}"
            next_field += 1
            ids = [next_id + j for j in range(rng.randint(1, 2))]
            next_id += len(ids)
            seed_batch(ids, extra={fname: "x"})
        elif op == "value_update" and live:
            victim = rng.choice(live)
            txt = " ".join(rng.choices(words, k=3))
            c.update_all({"_id": victim}, {"$set": {"text": txt}})
            truth[victim]["text"] = txt
        elif op == "rename" and len(live) > 2:
            # partial-match rename of a base column onto a fresh name
            fname = f"r{next_field}"
            next_field += 1
            victims = rng.sample(live, k=min(len(live) - 1, 2))
            c.update_all({"_id": {"$in": victims}}, {"$rename": {"v": fname}})
            for i in victims:
                if "v" in truth[i]:
                    truth[i][fname] = truth[i].pop("v")
        elif op == "remove" and live:
            victim = rng.choice(live)
            c.remove_all({"_id": victim})
            del truth[victim]
        else:
            ids = [next_id + j for j in range(rng.randint(1, 2))]
            next_id += len(ids)
            seed_batch(ids)
        check_state(step)
        if rng.random() < 0.6 or step == 11:
            out = c.refresh_search_index("ix")
            assert out["mode"] in ("incremental", "noop"), (seed, step, out)
            inc = _bm25_state(c, spark, "ix")
            c.create_search_index("ix2", dict(SPEC))
            assert inc == _bm25_state(c, spark, "ix2"), (seed, step)
            q = rng.choice(words)
            on = sorted(
                r["_id"] for r in c.find({"$text": {"$search": q}}).all())
            spark.conf.set("spark.anser.text.usePostings", "false")
            try:
                off = sorted(
                    r["_id"] for r in c.find({"$text": {"$search": q}}).all())
            finally:
                spark.conf.unset("spark.anser.text.usePostings")
            assert on == off, (seed, step, q)


# ---------------------------------------------------------------------
# VERDICT r12 #3: multi-path phrase / autocomplete — scan semantics +
# weighted-postings service (round 12 landed multi-path text only)
# ---------------------------------------------------------------------

MDOCS = [
    {"_id": 0, "title": "spark cluster guide",
     "body": "running jobs on the cluster quickly"},
    {"_id": 1, "title": "mongo migration",
     "body": "spark cluster is mentioned here once"},
    {"_id": 2, "title": "cooking pasta", "body": "boil water and add salt"},
    {"_id": 3, "title": None, "body": "spark cluster spark everywhere"},
    {"_id": 4, "title": "quick spark tips", "body": None},
    {"_id": 5, "title": "spark spark again", "body": "cluster notes"},
    {"_id": 6, "title": "cluster spark reversed",
     "body": "quick quick tips"},
]

MWSPEC = {"kind": "bm25", "weights": {"title": 3, "body": 1},
          "default_language": "english"}


def _msearch(c, op, spec, index="wx"):
    return {
        r["_id"]: round(r["score"], 9)
        for r in c.pipe([
            {"$search": {"index": index, op: spec}},
            {"$project": {"_id": 1, "score": 1}},
        ]).all()
    }


def _hatch(c, op, spec, index="wx"):
    spark = c.engine.spark
    served = _msearch(c, op, dict(spec), index)
    spark.conf.set("spark.anser.text.usePostings", "false")
    try:
        scan = _msearch(c, op, dict(spec), index)
    finally:
        spark.conf.unset("spark.anser.text.usePostings")
    return served, scan


@pytest.fixture()
def mcoll(spark, tmp_path):
    c = _mkc(spark, tmp_path, "mp13")
    c.insert_many([dict(d) for d in MDOCS])
    c.create_search_index("wx", dict(MWSPEC))
    return c


def test_multi_path_phrase_postings_scan_parity(mcoll):
    for spec in (
        {"query": "spark cluster", "path": ["title", "body"]},
        {"query": "spark cluster", "path": ["body", "title"]},
        {"query": "spark cluster", "path": ["title", "body"], "slop": 1},
        {"query": "cluster spark", "path": ["title", "body"], "slop": 2},
        {"query": "spark tips", "path": ["title", "body"], "slop": 1,
         "ordered": True},
        {"query": "spark", "path": ["title", "body"]},
    ):
        served, scan = _hatch(mcoll, "phrase", spec)
        assert served == scan, (spec, served, scan)
    # semantics: the phrase must hold WITHIN one field
    hits = _msearch(mcoll, "phrase",
                    {"query": "spark cluster", "path": ["title", "body"]})
    assert sorted(hits) == [0, 1, 3]
    # matching in BOTH fields sums both field scores
    one_field = _msearch(mcoll, "phrase",
                         {"query": "spark cluster", "path": ["title"]})
    assert set(one_field) == {0}


def test_multi_path_phrase_equals_per_field_sum(mcoll):
    """score(path=[f1,f2]) == score(f1) + score(f2) over the union of
    matches — the dedicated-index equivalence shape from round 12
    generalized to path lists."""
    multi = _msearch(mcoll, "phrase",
                     {"query": "spark cluster", "path": ["title", "body"]})
    t = _msearch(mcoll, "phrase",
                 {"query": "spark cluster", "path": "title"})
    b = _msearch(mcoll, "phrase",
                 {"query": "spark cluster", "path": "body"})
    want = {
        i: round(t.get(i, 0.0) + b.get(i, 0.0), 9)
        for i in set(t) | set(b)
    }
    assert multi == want, (multi, want)


def test_multi_path_phrase_single_item_list_matches_scalar(mcoll):
    lst = _msearch(mcoll, "phrase",
                   {"query": "spark cluster", "path": ["title"]})
    scalar = _msearch(mcoll, "phrase",
                      {"query": "spark cluster", "path": "title"})
    assert lst == scalar


def test_multi_path_autocomplete_postings_scan_parity(mcoll):
    for spec in (
        {"query": "spar clu", "path": ["title", "body"]},
        {"query": "quic", "path": ["title", "body"]},
        {"query": "spark clu", "path": ["title", "body"],
         "tokenOrder": "sequential"},
        {"query": "boil wat", "path": ["title", "body"],
         "tokenOrder": "sequential"},
    ):
        served, scan = _hatch(mcoll, "autocomplete", spec)
        assert served == scan, (spec, served, scan)
    # per-field AND, cross-field OR: "spar clu" needs both prefixes in
    # the SAME field
    hits = _msearch(mcoll, "autocomplete",
                    {"query": "spar clu", "path": ["title", "body"]})
    assert sorted(hits) == [0, 1, 3, 6], hits
    # doc 4: "quick spark tips" in title only; doc 6 body "quick quick"
    q = _msearch(mcoll, "autocomplete",
                 {"query": "quic spar", "path": ["title", "body"]})
    assert 4 in q and 6 not in q, q


def test_multi_path_phrase_none_analyzer_index(spark, tmp_path):
    # a 'none'-analyzer weighted index serves the same shapes without
    # the raw sidecar indirection
    c = _mkc(spark, tmp_path, "mp13n")
    c.insert_many([dict(d) for d in MDOCS])
    c.create_search_index("nx", {
        "kind": "bm25", "weights": {"title": 2, "body": 1},
        "default_language": "none"})
    for spec in (
        {"query": "spark cluster", "path": ["title", "body"]},
        {"query": "spark cluster", "path": ["body", "title"], "slop": 1},
    ):
        served, scan = _hatch(c, "phrase", spec, index="nx")
        assert served == scan and served, (spec, served, scan)
    served, scan = _hatch(
        c, "autocomplete",
        {"query": "spar clu", "path": ["title", "body"]}, index="nx")
    assert served == scan and served


def test_multi_path_phrase_search_meta_count(mcoll):
    out = mcoll.pipe([{"$searchMeta": {
        "phrase": {"query": "spark cluster", "path": ["title", "body"]},
        "index": "wx"}}]).all()[0]
    assert out["count"]["total"] == 3


def test_multi_path_phrase_unindexed_field_scans_correctly(spark, tmp_path):
    # a path list naming an unindexed field can't serve from postings —
    # the scan fallback must still produce the right matches
    c = _mkc(spark, tmp_path, "mp13u")
    c.insert_many([{**d, "extra": "spark cluster here"} for d in MDOCS])
    c.create_search_index("wx", dict(MWSPEC))
    hits = _msearch(c, "phrase",
                    {"query": "spark cluster", "path": ["title", "extra"]})
    assert sorted(hits) == [0, 1, 2, 3, 4, 5, 6]


def test_multi_path_phrase_after_incremental_refresh(mcoll):
    # mutate + incremental refresh: the new doc serves from the
    # refreshed field-tagged postings, hatch parity preserved
    mcoll.insert_many([{"_id": 7, "title": "spark cluster fresh",
                        "body": "unrelated words"}])
    out = mcoll.refresh_search_index("wx")
    assert out["mode"] == "incremental", out
    served, scan = _hatch(
        mcoll, "phrase",
        {"query": "spark cluster", "path": ["title", "body"]})
    assert served == scan and 7 in served, (served, scan)
    served, scan = _hatch(
        mcoll, "autocomplete",
        {"query": "fres clu", "path": ["title", "body"]})
    assert served == scan and served == {7: 1.0}, (served, scan)


# ---------------------------------------------------------------------
# VERDICT r12 #4: named ivfpq index kind — PQ codes ride the cells
# table; candidate scoring reads codes (+ stored norm), a bounded exact
# rerank on the stored vectors preserves the rerank-exact contract
# ---------------------------------------------------------------------


def _pq_vec_coll(spark, tmp_path, tag, n=80, dim=8, seed=11):
    import numpy as np

    rng = np.random.default_rng(seed)
    eng = Engine(spark, workdir=str(tmp_path / tag))
    c = eng.db("v").collection("vecs")
    c.insert_many([
        {"_id": i, "embedding": [float(x) for x in rng.normal(size=dim)],
         "grp": i % 3}
        for i in range(n)
    ])
    return c, rng


PQ_SPEC = {"kind": "ivfpq", "path": "embedding", "nlist": 4, "nprobe": 4,
           "m": 4, "nbits": 4}


def _pqvs(c, qv, limit=8, index="px", similarity="cosine", ncand=None,
          flt=None, exact=False):
    arg = {"path": "embedding", "queryVector": [float(x) for x in qv],
           "limit": limit, "similarity": similarity}
    if exact:
        arg["exact"] = True
    else:
        arg["index"] = index
    if ncand is not None:
        arg["numCandidates"] = int(ncand)
    if flt:
        arg["filter"] = flt
    return [
        (r["_id"], round(r["score"], 10))
        for r in c.pipe([{"$vectorSearch": arg}]).all()
    ]


def test_ivfpq_build_materializes_codes(spark, tmp_path):
    c, _ = _pq_vec_coll(spark, tmp_path, "pqb")
    c.create_search_index("px", dict(PQ_SPEC))
    d = c._load_search_index("px", warn_stale=False)
    assert d["kind"] == "ivfpq" and d.get("cells_dir")
    assert len(d["codebooks"]) == 4  # m books
    assert len(d["codebooks"][0]) == 16  # 2^nbits entries
    cells = spark.read.parquet(d["cells_dir"])
    assert {"id", "__vec", "__cell", "__codes", "__norm"} <= set(
        cells.columns
    )
    row = cells.first()
    assert len(row["__codes"]) == 4
    assert row["__norm"] > 0.0


@pytest.mark.parametrize("sim", ["cosine", "euclidean", "dotProduct"])
def test_ivfpq_full_probe_big_beam_is_exact(spark, tmp_path, sim):
    # full probe + numCandidates ≥ corpus ⇒ the rerank scores every
    # candidate on its true vector — provably the exact top-k
    c, rng = _pq_vec_coll(spark, tmp_path, f"pqe_{sim}")
    c.create_search_index("px", dict(PQ_SPEC))
    qv = rng.normal(size=8)
    got = _pqvs(c, qv, similarity=sim, ncand=1 << 30)
    exact = _pqvs(c, qv, similarity=sim, exact=True)
    assert got == exact


def test_ivfpq_hatches_match(spark, tmp_path):
    # usePQ=false serves the same index like a plain ivf cells table;
    # useCells=false serves inline — all three agree at full probe
    c, rng = _pq_vec_coll(spark, tmp_path, "pqh")
    c.create_search_index("px", dict(PQ_SPEC))
    qv = rng.normal(size=8)
    on = _pqvs(c, qv, ncand=1 << 30)
    spark.conf.set("spark.anser.vector.usePQ", "false")
    try:
        no_pq = _pqvs(c, qv)
    finally:
        spark.conf.unset("spark.anser.vector.usePQ")
    spark.conf.set("spark.anser.vector.useCells", "false")
    try:
        inline = _pqvs(c, qv)
    finally:
        spark.conf.unset("spark.anser.vector.useCells")
    assert on == no_pq == inline


def test_ivfpq_prefilter_applies(spark, tmp_path):
    c, rng = _pq_vec_coll(spark, tmp_path, "pqf")
    c.create_search_index("px", dict(PQ_SPEC))
    qv = rng.normal(size=8)
    got = _pqvs(c, qv, ncand=1 << 30, flt={"grp": 2})
    assert got and all(i % 3 == 2 for i, _ in got)
    spark.conf.set("spark.anser.vector.useCells", "false")
    try:
        inline = _pqvs(c, qv, flt={"grp": 2})
    finally:
        spark.conf.unset("spark.anser.vector.useCells")
    assert got == inline


def test_ivfpq_bounded_beam_recall(spark, tmp_path):
    # ADC is approximate, but a 4-bit codebook over clustered data must
    # keep most of the true top-10 in a 30-candidate beam; and a query
    # AT a stored vector must put that vector first (its ADC estimate
    # dominates: every subquantizer is near its own code)
    c, rng = _pq_vec_coll(spark, tmp_path, "pqr", n=120)
    c.create_search_index("px", dict(PQ_SPEC))
    target = c.find_one({"_id": 17})["embedding"]
    got = _pqvs(c, target, limit=10, ncand=30)
    assert got[0][0] == 17
    exact = _pqvs(c, target, limit=10, exact=True)
    overlap = len({i for i, _ in got} & {i for i, _ in exact})
    assert overlap >= 8, (got, exact)


def test_ivfpq_incremental_refresh_mutations(spark, tmp_path):
    # insert + update + remove in one window: refresh stays
    # incremental, delta rows carry codes, layered result == exact scan
    import numpy as np

    c, rng = _pq_vec_coll(spark, tmp_path, "pqm")
    c.create_search_index("px", dict(PQ_SPEC))
    new_vecs = {
        200: [float(x) for x in rng.normal(size=8)],
        201: [float(x) for x in rng.normal(size=8)],
    }
    c.insert_many([
        {"_id": i, "embedding": v, "grp": i % 3}
        for i, v in new_vecs.items()
    ])
    upd = [float(x) for x in rng.normal(size=8)]
    c.update_all({"_id": 7}, {"$set": {"embedding": upd}})
    c.remove_all({"_id": 11})
    out = c.refresh_search_index("px")
    assert out["mode"] == "incremental", out
    d = c._load_search_index("px", warn_stale=False)
    assert d.get("cells_deltas"), d
    delta = spark.read.parquet(d["cells_deltas"][-1])
    assert {"__codes", "__norm"} <= set(delta.columns)
    assert delta.where(F.col("__codes").isNull()).count() == 0
    qv = np.array(new_vecs[200])
    got = _pqvs(c, qv, limit=10, ncand=1 << 30)
    exact = _pqvs(c, qv, limit=10, exact=True)
    assert got == exact
    assert got[0][0] == 200
    assert all(i != 11 for i, _ in got)
    got_upd = _pqvs(c, upd, limit=1, ncand=1 << 30)
    assert got_upd[0][0] == 7


def test_ivfpq_stale_snapshot_falls_back_inline(spark, tmp_path):
    # un-refreshed mutations stay visible: the stale stamp routes the
    # query through live inline assignment (round-13 freshness contract
    # shared with ivf)
    c, rng = _pq_vec_coll(spark, tmp_path, "pqs")
    c.create_search_index("px", dict(PQ_SPEC))
    fresh = [float(x) for x in rng.normal(size=8)]
    c.insert_many([{"_id": 500, "embedding": fresh, "grp": 0}])
    got = _pqvs(c, fresh, limit=1)  # NO refresh yet
    assert got[0][0] == 500


def test_ivfpq_duplicate_ids_degrade_to_centroids_only(spark, tmp_path):
    c, rng = _pq_vec_coll(spark, tmp_path, "pqd", n=40)
    c.insert_many([
        {"_id": 3, "embedding": [float(x) for x in rng.normal(size=8)],
         "grp": 0}
    ])  # duplicate _id
    c.create_search_index("px", dict(PQ_SPEC))
    d = c._load_search_index("px", warn_stale=False)
    assert not d.get("cells_dir") and not d.get("codebooks")
    qv = rng.normal(size=8)
    got = _pqvs(c, qv, limit=5)  # inline ivf path still serves
    assert len(got) == 5


def test_ivfpq_dim_not_divisible_raises(spark, tmp_path):
    c, _ = _vec13_coll6(spark, tmp_path)
    with pytest.raises(ValueError, match="not divisible"):
        c.create_search_index("px", dict(PQ_SPEC))


def _vec13_coll6(spark, tmp_path):
    import numpy as np

    rng = np.random.default_rng(3)
    eng = Engine(spark, workdir=str(tmp_path / "pq6"))
    c = eng.db("v").collection("vecs")
    c.insert_many([
        {"_id": i, "embedding": [float(x) for x in rng.normal(size=6)]}
        for i in range(40)
    ])
    return c, rng


def test_ivfpq_adc_pass_prunes_vectors(spark, tmp_path):
    # 100 TB contract, plan-asserted: the ADC candidate pass pushes the
    # __cell probe into the parquet scan and NEVER reads the float
    # vector column — that IO cut is the whole point of riding codes
    # on the cells table
    import re

    c, _ = _pq_vec_coll(spark, tmp_path, "pqplan", n=100)
    c.create_search_index("px", dict(PQ_SPEC))
    d = c._load_search_index("px", warn_stale=False)

    from anser_spark.operators.pq import pq_adc_scores
    from anser_spark.operators.ranking import read_layered_table

    cells = read_layered_table(spark, [d["cells_dir"]], [], "id")
    probed = cells.where(F.col("__cell").isin([0, 1]))
    sl = pq_adc_scores(probed, d["codebooks"], [0.1] * 8,
                       similarity="cosine")
    plan = sl._jdf.queryExecution().executedPlan().toString()
    reads = re.findall(r"ReadSchema: ([^\n]+)", plan)
    assert reads and all("__vec" not in r for r in reads), plan
    assert any("In(__cell" in m for m in
               re.findall(r"PushedFilters: ([^\n]+)", plan)), plan


@pytest.mark.parametrize("seed,kind", [(101, "ivfpq"), (202, "ivfpq"),
                                       (303, "ivf")])
def test_vector_index_mutation_fuzz(spark, tmp_path, seed, kind):
    """Seeded mutation fuzzer for the vector index kinds: random
    insert/update/remove batches against a live collection, refreshes
    interleaved. Invariants per refresh: mode is incremental (the
    in-distribution batches never trip drift), full-probe + full-beam
    index service equals the exact scan bit-for-bit, and the
    useCells=false inline hatch agrees."""
    import random

    import numpy as np

    rng = random.Random(seed)
    nrng = np.random.default_rng(seed)
    eng = Engine(spark, workdir=str(tmp_path / f"vfz{seed}{kind}"))
    c = eng.db("v").collection("vecs")

    def vec():
        return [float(x) for x in nrng.normal(size=8)]

    live = {}

    def ins(ids):
        docs = [{"_id": i, "embedding": vec(), "grp": i % 3} for i in ids]
        c.insert_many([dict(d) for d in docs])
        for d in docs:
            live[d["_id"]] = d["embedding"]

    ins(range(50))
    spec = {"kind": kind, "path": "embedding", "nlist": 4, "nprobe": 4}
    if kind == "ivfpq":
        spec.update({"m": 4, "nbits": 4})
    c.create_search_index("vx", dict(spec))
    next_id = 1000

    def q(qv, limit=10, exact=False, inline=False):
        arg = {"path": "embedding", "queryVector": qv, "limit": limit}
        if exact:
            arg["exact"] = True
        else:
            arg["index"] = "vx"
            arg["numCandidates"] = 1 << 30
        if inline:
            spark.conf.set("spark.anser.vector.useCells", "false")
        try:
            return [
                (r["_id"], round(r["score"], 10))
                for r in c.pipe([{"$vectorSearch": arg}]).all()
            ]
        finally:
            if inline:
                spark.conf.unset("spark.anser.vector.useCells")

    for step in range(8):
        op = rng.choice(["insert", "insert", "update", "remove", "mixed"])
        ids = sorted(live)
        if op == "insert" or len(ids) < 10:
            new = [next_id + j for j in range(rng.randint(1, 3))]
            next_id += len(new)
            ins(new)
        elif op == "update":
            victims = rng.sample(ids, k=rng.randint(1, 3))
            for i in victims:
                nv = vec()
                c.update_all({"_id": i}, {"$set": {"embedding": nv}})
                live[i] = nv
        elif op == "remove":
            victims = rng.sample(ids, k=rng.randint(1, 2))
            c.remove_all({"_id": {"$in": victims}})
            for i in victims:
                del live[i]
        else:  # mixed window: insert + update + remove before refresh
            new = [next_id]
            next_id += 1
            ins(new)
            v_upd = rng.choice(sorted(live))
            nv = vec()
            c.update_all({"_id": v_upd}, {"$set": {"embedding": nv}})
            live[v_upd] = nv
            v_rm = rng.choice([i for i in sorted(live) if i != v_upd])
            c.remove_all({"_id": v_rm})
            del live[v_rm]
        out = c.refresh_search_index("vx")
        assert out["mode"] == "incremental", (seed, kind, step, out)
        # probe: a fresh random query + a query AT a live vector
        for qv in (vec(), live[rng.choice(sorted(live))]):
            served = q(qv)
            exact = q(qv, exact=True)
            assert served == exact, (seed, kind, step)
        if rng.random() < 0.4:
            qv = vec()
            assert q(qv) == q(qv, inline=True), (seed, kind, step)
    # end state: layered index bit-equal to a fresh rebuild's answers
    qv = vec()
    before = q(qv, limit=20)
    c.create_search_index("vx2", {**spec})
    arg = {"path": "embedding", "queryVector": qv, "limit": 20,
           "index": "vx2", "numCandidates": 1 << 30}
    rebuilt = [(r["_id"], round(r["score"], 10))
               for r in c.pipe([{"$vectorSearch": arg}]).all()]
    assert before == rebuilt, (seed, kind)


def test_ivfpq_removed_id_reuse_is_plain_insert(spark, tmp_path):
    # r12 proved this for ivf; the shared tombstone machinery must give
    # ivfpq the same guarantee: remove a vector, reuse its _id with a
    # DIFFERENT vector next window — both refreshes incremental, the
    # reused id serves under its new vector, full probe+beam == exact
    c, rng = _pq_vec_coll(spark, tmp_path, "pqreuse")
    c.create_search_index("px", dict(PQ_SPEC))
    c.remove_all({"_id": 13})
    assert c.refresh_search_index("px")["mode"] == "incremental"
    nv = [float(x) for x in rng.normal(size=8)]
    c.insert_many([{"_id": 13, "embedding": nv, "grp": 1}])
    assert c.refresh_search_index("px")["mode"] == "incremental"
    got = _pqvs(c, nv, limit=1, ncand=1 << 30)
    assert got[0][0] == 13
    qv = rng.normal(size=8)
    assert _pqvs(c, qv, ncand=1 << 30) == _pqvs(c, qv, exact=True)


def test_analyzer_upgrade_reads_stale_and_rebuild_recovers(spark, tmp_path):
    # an english index stamped with an older analyzer version must read
    # stale (scan fallback, correct results), and a rebuild under the
    # current analyzer restores postings service with scan parity
    import json
    import os as _os

    eng = Engine(spark, workdir=str(tmp_path / "anlz"))
    c = eng.db("t").collection("docs")
    c.insert_many([
        {"_id": 0, "text": "running jobs quickly"},
        {"_id": 1, "text": "the quick brown fox"},
        {"_id": 2, "text": "nothing relevant"},
    ])
    c.create_search_index("ix", {
        "kind": "bm25", "path": "text", "default_language": "english",
    })
    assert not c.search_index_status("ix")["stale"]
    # forge an OLD analyzer stamp on disk (what a pre-upgrade build
    # left behind)
    p = _os.path.join(c._search_index_dir(), "ix.json")
    with open(p) as fh:
        d = json.load(fh)
    d["analyzer_version"] = "snowball-porter2-v1"
    with open(p, "w") as fh:
        json.dump(d, fh)
    assert c.search_index_status("ix")["stale"]
    hits = sorted(r["_id"] for r in c.find(
        {"$text": {"$search": "run"}}).all())
    assert hits == [0]  # stale index → scan fallback, still correct
    c.create_search_index("ix", {
        "kind": "bm25", "path": "text", "default_language": "english",
    })
    assert not c.search_index_status("ix")["stale"]
    on = sorted(r["_id"] for r in c.find(
        {"$text": {"$search": "run"}}).all())
    spark.conf.set("spark.anser.text.usePostings", "false")
    try:
        off = sorted(r["_id"] for r in c.find(
            {"$text": {"$search": "run"}}).all())
    finally:
        spark.conf.unset("spark.anser.text.usePostings")
    assert on == off == [0]


# ---------------------------------------------------------------------
# Probe-derived regression tests: round-13 surfaces in combinations the
# feature tests don't cover (schema evolution × txn/backup/optimize,
# multi-path phrase × compound/$searchMeta/$rankFusion)
# ---------------------------------------------------------------------


def test_schema_evolution_rename_chain_and_unset(spark, tmp_path):
    # rename a→b then b→c across windows (index refresh incremental at
    # each), then $unset the evolved column on one doc
    c = _mkc(spark, tmp_path, "evochain")
    _seed_files(c)
    c.create_search_index("ix", dict(SPEC))
    c.update_all({"_id": {"$lt": 3}}, {"$rename": {"v": "b"}})
    assert c.refresh_search_index("ix")["mode"] == "incremental"
    c.update_all({"_id": {"$lt": 2}}, {"$rename": {"b": "cc"}})
    assert c.refresh_search_index("ix")["mode"] == "incremental"
    c.update_all({"_id": 0}, {"$unset": {"cc": ""}})
    d = {r["_id"]: r for r in c.find({}).all()}
    assert d[0].get("cc") is None and d[0].get("b") is None
    assert d[1].get("cc") == 0 and d[2].get("b") == 0
    assert d[5].get("v") == 0


def test_schema_evolution_inside_transaction(spark, tmp_path):
    # a txn staging a schema-adding update + an insert with another new
    # column: read-your-writes sees the union schema, commit publishes
    from anser_spark.engine import Engine as _E

    eng = _E(spark, workdir=str(tmp_path / "evotxn"))
    c = eng.db("t").collection("docs")
    _seed_files(c)
    with eng.transaction():
        c.update_all({"_id": {"$lt": 2}}, {"$set": {"flag": 1}})
        c.insert_many([{"_id": 100, "text": "fresh", "v": 0,
                        "extra": "x"}])
        assert c.count_documents({"flag": 1}) == 2  # read-your-writes
    got = {r["_id"]: r for r in c.find({}).all()}
    assert got[0]["flag"] == 1 and got[100]["extra"] == "x"
    assert got[5].get("flag") is None


def test_schema_evolution_backup_restore_optimize(spark, tmp_path):
    from anser_spark.sources.backup import (
        BackupOptions,
        backup_collection,
        restore_collection,
    )

    eng = Engine(spark, workdir=str(tmp_path / "evobk"))
    c = eng.db("t").collection("docs")
    _seed_files(c)
    c.update_all({"_id": {"$lt": 2}}, {"$set": {"flag": 1}})
    c.insert_many([{"_id": 100, "text": "fresh", "v": 0, "extra": "x"}])
    bdir = str(tmp_path / "bk")
    backup_collection(c, BackupOptions(target_dir=bdir))
    restore_collection(eng, bdir, db="t2", collection="docs2")
    c2 = eng.db("t2").collection("docs2")
    assert _rows(c2) == _rows(c)
    before = _rows(c)
    c.optimize()
    assert _rows(c) == before
    assert c.count_documents({"flag": 1}) == 2


def test_multi_path_phrase_in_compound_and_fusion(mcoll):
    # compound must=multi-path-phrase + equals filter, postings/scan
    # hatch parity; $searchMeta facet over the multi-path operator;
    # $rankFusion with a multi-path-phrase-ranked leg
    def run():
        return sorted(r["_id"] for r in mcoll.pipe([
            {"$search": {"compound": {
                "must": [{"phrase": {"query": "spark cluster",
                                     "path": ["title", "body"]}}],
                "filter": [{"range": {"path": "_id", "gte": 1}}],
            }, "index": "wx"}},
            {"$project": {"_id": 1}},
        ]).all())

    served = run()
    spark = mcoll.engine.spark
    spark.conf.set("spark.anser.text.usePostings", "false")
    try:
        scan = run()
    finally:
        spark.conf.unset("spark.anser.text.usePostings")
    assert served == scan and 1 in served and 0 not in served
    meta = mcoll.pipe([
        {"$searchMeta": {
            "facet": {
                "operator": {"phrase": {"query": "spark cluster",
                                        "path": ["title", "body"]}},
                "facets": {"ids": {"type": "number", "path": "_id",
                                   "boundaries": [0, 4, 8]}},
            },
            "index": "wx"}},
    ]).all()
    assert meta[0]["count"]["total"] >= 2
    rf = mcoll.pipe([
        {"$rankFusion": {"input": {"pipelines": {
            "p1": [{"$search": {"phrase": {"query": "spark cluster",
                                           "path": ["title", "body"]},
                                "index": "wx"}}, {"$limit": 3}],
            "p2": [{"$search": {"text": {"query": "cluster",
                                         "path": "body"},
                                "index": "wx"}}, {"$limit": 3}],
        }}}},
    ]).all()
    assert rf, "fusion over multi-path phrase returned nothing"


def test_index_definition_cache_invalidates_on_write(spark, tmp_path):
    # the parse cache must serve the same parsed object while the file
    # is unchanged and invalidate on every publish (os.replace bumps
    # mtime_ns); consumers treat it as immutable
    c, _ = _pq_vec_coll(spark, tmp_path, "defcache", n=40)
    c.create_search_index("px", dict(PQ_SPEC))
    d1 = c._load_search_index("px", warn_stale=False)
    d2 = c._load_search_index("px", warn_stale=False)
    assert d1 is d2  # cache hit
    c.insert_many([{"_id": 500, "embedding": [0.5] * 8, "grp": 0}])
    c.refresh_search_index("px")
    d3 = c._load_search_index("px", warn_stale=False)
    assert d3 is not d1 and d3["built_at_version"] != d1["built_at_version"]
    # the cached pre-refresh object was not poisoned by the refresh
    assert not d1.get("cells_deltas")
    assert d3.get("cells_deltas")


def test_streaming_ingest_then_ivfpq_incremental_refresh(spark, tmp_path):
    # the round-9 streaming steady-state loop, with the VECTOR index:
    # micro-batches stream into a collection (exactly-once
    # foreachBatch), one refresh brings the ivfpq cells table up to
    # date incrementally, and $vectorSearch serves the new vectors with
    # exact-scan parity at full probe + full beam
    import numpy as np
    import pandas as pd

    from anser_spark.streaming.ingest import stream_into_collection

    rng = np.random.default_rng(21)
    src = tmp_path / "vsrc"
    src.mkdir()
    ckpt = str(tmp_path / "vckpt")
    eng = Engine(spark, workdir=str(tmp_path / "r13si"))
    c = eng.db("t").collection("vecs")
    c.set_retention(6)

    def batch(name, ids):
        pd.DataFrame([
            {"_id": i, "embedding": [float(x) for x in rng.normal(size=8)]}
            for i in ids
        ]).to_parquet(src / name)

    schema = "_id bigint, embedding array<double>"
    batch("b0.parquet", range(40))
    q = stream_into_collection(
        spark.readStream.schema(schema).parquet(str(src)),
        c, ckpt, available_now=True,
    )
    q.awaitTermination(120)
    c.create_search_index("px", dict(PQ_SPEC))
    batch("b1.parquet", range(100, 110))
    q = stream_into_collection(
        spark.readStream.schema(schema).parquet(str(src)),
        c, ckpt, available_now=True,
    )
    q.awaitTermination(120)
    out = c.refresh_search_index("px")
    assert out == {"mode": "incremental", "inserted": 10}
    assert c.search_index_status("px")["stale"] is False
    target = c.find_id(105).one()["embedding"]
    got = _pqvs(c, target, limit=5, ncand=1 << 30)
    exact = _pqvs(c, target, limit=5, exact=True)
    assert got == exact and got[0][0] == 105


@pytest.mark.parametrize("seed,lang", [(31337, "none"), (99401, "none"),
                                       (60601, "english")])
def test_multi_path_search_fuzz_postings_scan_parity(
    spark, tmp_path, seed, lang
):
    """Randomized multi-path $search shapes: random 3-field docs,
    random operator (text/phrase/autocomplete), random path subsets
    (scalar or list, any order), random slop — weighted-postings
    service must stay bit-parity with the scan hatch on ids AND
    scores, including after an incremental refresh mid-stream."""
    import random

    rng = random.Random(seed)
    words = ["spark", "cluster", "quick", "data", "column", "merge",
             "window", "batch"]
    fields = ["title", "body", "note"]

    def doc(i):
        d = {"_id": i}
        for f in fields:
            d[f] = (" ".join(rng.choices(words, k=rng.randint(2, 6)))
                    if rng.random() > 0.15 else None)
        return d

    eng = Engine(spark, workdir=str(tmp_path / f"mpf{seed}{lang}"))
    c = eng.db("t").collection("docs")
    c.insert_many([doc(i) for i in range(30)])
    c.create_search_index("wx", {
        "kind": "bm25",
        "weights": {"title": 3, "body": 1, "note": 2},
        "default_language": lang,
    })

    def run(op, spec):
        out = c.pipe([
            {"$search": {op: spec, "index": "wx"}},
            {"$project": {"_id": 1, "s": {"$meta": "searchScore"}}},
        ]).all()
        return {r["_id"]: round(r["s"], 9) for r in out}

    def one_query(step):
        op = rng.choice(["text", "phrase", "autocomplete"])
        paths = rng.sample(fields, k=rng.randint(1, 3))
        path = paths[0] if (len(paths) == 1 and rng.random() < 0.5) \
            else paths
        if op == "phrase":
            spec = {"query": " ".join(rng.choices(words, k=2)),
                    "path": path}
            if rng.random() < 0.4:
                spec["slop"] = rng.randint(1, 2)
        elif op == "autocomplete":
            toks = [w[: rng.randint(2, len(w))]
                    for w in rng.choices(words, k=rng.randint(1, 2))]
            spec = {"query": " ".join(toks), "path": path}
        else:
            spec = {"query": " ".join(rng.choices(words, k=2)),
                    "path": path}
        served = run(op, spec)
        spark.conf.set("spark.anser.text.usePostings", "false")
        try:
            scan = run(op, spec)
        finally:
            spark.conf.unset("spark.anser.text.usePostings")
        assert served == scan, (seed, step, op, spec)

    for step in range(10):
        one_query(step)
    # mutate + incremental refresh, then keep fuzzing on the new state
    c.insert_many([doc(i) for i in range(200, 205)])
    c.update_all({"_id": 3}, {"$set": {
        "title": "spark cluster fresh title"}})
    c.remove_all({"_id": 7})
    assert c.refresh_search_index("wx")["mode"] == "incremental"
    for step in range(10, 18):
        one_query(step)


def test_vector_search_per_query_nprobe_override(spark, tmp_path):
    # nprobe widens per query without touching the stored index: full
    # override (= nlist) must equal the exact scan; a narrow probe
    # returns a subset of the full probe's candidates
    c, rng = _pq_vec_coll(spark, tmp_path, "npq")
    c.create_search_index("px", {**PQ_SPEC, "nprobe": 1})
    qv = [float(x) for x in rng.normal(size=8)]
    wide = _pqvs(c, qv, ncand=1 << 30)  # helper can't pass nprobe; build args here
    arg = {"path": "embedding", "queryVector": qv, "limit": 8,
           "index": "px", "numCandidates": 1 << 30, "nprobe": 4}
    full = [(r["_id"], round(r["score"], 10))
            for r in c.pipe([{"$vectorSearch": arg}]).all()]
    exact = _pqvs(c, qv, exact=True)
    assert full == exact  # nprobe=nlist override ⇒ exact
    narrow = [(r["_id"], round(r["score"], 10))
              for r in c.pipe([{"$vectorSearch": {**arg, "nprobe": 1}}]).all()]
    # pruning can only lose candidates: the narrow probe's best score
    # can't beat the full probe's best, and its hits rank within the
    # exact ordering (they ARE exact scores of a candidate subset)
    assert narrow and narrow[0][1] <= full[0][1]
    exact_scores = dict(_pqvs(c, qv, limit=200, exact=True))
    assert all(exact_scores.get(i) == s for i, s in narrow)


def test_ivfpq_drift_trips_rebuild_retrains_codebooks(spark, tmp_path):
    # a far-out-of-distribution delta must retrain BOTH quantizers:
    # refresh reports rebuild and the stored codebooks change
    c, rng = _pq_vec_coll(spark, tmp_path, "pqdrift")
    c.create_search_index("px", dict(PQ_SPEC))
    cb_before = c._load_search_index("px", warn_stale=False)["codebooks"]
    c.insert_many([
        {"_id": 900 + i, "embedding": [1000.0 + i] * 8, "grp": 0}
        for i in range(8)
    ])
    out = c.refresh_search_index("px")
    assert out["mode"] == "rebuild", out
    d = c._load_search_index("px", warn_stale=False)
    assert d["codebooks"] != cb_before
    qv = [1000.0] * 8
    got = _pqvs(c, qv, limit=3, ncand=1 << 30)
    exact = _pqvs(c, qv, limit=3, exact=True)
    assert got == exact and got[0][0] in range(900, 908)
