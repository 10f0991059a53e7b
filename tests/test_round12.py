"""Round 12: hybrid bulk manifests (upsert-mixing bulks refresh
incrementally instead of forcing a full index rebuild), delta-dir
orphan GC, minhash append content-keyed staging, removed-id reuse."""

import os

import pytest

from pyspark.sql import functions as F

from anser_spark.engine import Engine


def _mk(spark, tmp_path, tag):
    eng = Engine(spark, workdir=str(tmp_path / tag))
    return eng.db("t").collection("docs")


def _seed_multi_file(c, n=12):
    c.insert_many([
        {"_id": i, "text": f"spark doc number {i}", "v": 0}
        for i in range(n // 2)
    ])
    c.insert_many([
        {"_id": i, "text": f"running cluster item {i}", "v": 0}
        for i in range(n // 2, n)
    ])


SPEC = {"kind": "bm25", "path": "text", "default_language": "english"}


def _bm25_state(c, spark, name):
    from anser_spark.operators.ranking import _postings_frame

    d = dict(c._load_search_index(name, warn_stale=False))
    postings = {
        (r["id"], r["term"], r["tf"], r["n_tokens"])
        for r in _postings_frame(spark, d).collect()
    }
    terms = {
        (r["term"], r["df"])
        for r in spark.read.parquet(d["terms_dir"]).collect()
    }
    stats = {k: d[k] for k in ("n_docs", "avgdl", "sum_tokens", "n_text_docs")}
    return postings, terms, stats


# ---------------------------------------------------------------------------
# Hybrid bulk manifests: upsert-synthesized inserts ride the mutation
# manifest as per-column insert sidecars instead of breaking the chain
# ---------------------------------------------------------------------------


def test_bulk_upsert_mix_refreshes_incrementally(spark, tmp_path):
    # the round-11 scale edge: a bulk mixing updates with
    # upsert-inserts forced a full rebuild of every index; the hybrid
    # manifest records the introduced ids so refresh stays O(touched)
    c = _mk(spark, tmp_path, "hbulk")
    _seed_multi_file(c)
    c.create_search_index("ix", dict(SPEC))
    (
        c.bulk()
        .update({"_id": 0}, {"$set": {"text": "bulk changed"}})
        .upsert({"_id": 999}, {"$set": {"text": "bulk upserted"}})
        .run()
    )
    out = c.refresh_search_index("ix")
    assert out["mode"] == "incremental", out
    assert out["inserted"] >= 2  # the re-indexed update + the new doc
    got = sorted(
        r["_id"] for r in c.find({"$text": {"$search": "bulk"}}).all())
    assert got == [0, 999], got
    inc = _bm25_state(c, spark, "ix")
    c.create_search_index("ix2", dict(SPEC))
    assert inc == _bm25_state(c, spark, "ix2")


def test_bulk_upsert_heavy_mix_bit_equal(spark, tmp_path):
    # heterogeneous bulk: updates + upserts (hit and miss) + removes in
    # ONE rewrite; refresh must be incremental and bit-equal to rebuild
    c = _mk(spark, tmp_path, "hbulk2")
    _seed_multi_file(c)
    c.create_search_index("ix", dict(SPEC))
    (
        c.bulk()
        .update({"_id": 1}, {"$set": {"text": "rewritten one"}})
        .upsert({"_id": 2}, {"$set": {"text": "upsert hit two"}})
        .upsert({"_id": 500}, {"$set": {"text": "upsert miss five hundred"}})
        .upsert({"_id": 501}, {"$set": {"text": "upsert miss five oh one"}})
        .remove({"_id": 7})
        .run()
    )
    out = c.refresh_search_index("ix")
    assert out["mode"] == "incremental", out
    assert out.get("tombstoned", 0) >= 1
    assert sorted(
        r["_id"] for r in c.find({"$text": {"$search": "upsert"}}).all()
    ) == [2, 500, 501]
    # removed doc's terms are gone from the index
    assert 7 not in {
        r["_id"] for r in c.find({"$text": {"$search": "cluster"}}).all()
    }
    inc = _bm25_state(c, spark, "ix")
    c.create_search_index("ix2", dict(SPEC))
    assert inc == _bm25_state(c, spark, "ix2")


def test_hybrid_manifest_insert_then_mutate_nets(spark, tmp_path):
    # an id INTRODUCED by a hybrid bulk then updated (next commit)
    # classifies as one insert of its final state; introduced-then-
    # removed appears nowhere
    c = _mk(spark, tmp_path, "hnet")
    _seed_multi_file(c)
    c.create_search_index("ix", dict(SPEC))
    (
        c.bulk()
        .update({"_id": 3}, {"$set": {"text": "tweak three"}})
        .upsert({"_id": 600}, {"$set": {"text": "first state six hundred"}})
        .upsert({"_id": 601}, {"$set": {"text": "doomed six oh one"}})
        .run()
    )
    c.update_all({"_id": 600}, {"$set": {"text": "final state six hundred"}})
    c.remove_all({"_id": 601})
    out = c.refresh_search_index("ix")
    assert out["mode"] == "incremental", out
    assert sorted(
        r["_id"] for r in c.find({"$text": {"$search": "final"}}).all()
    ) == [600]
    assert c.find({"$text": {"$search": "doomed"}}).all() == []
    assert c.find({"$text": {"$search": "first"}}).all() == []
    inc = _bm25_state(c, spark, "ix")
    c.create_search_index("ix2", dict(SPEC))
    assert inc == _bm25_state(c, spark, "ix2")


def test_update_rewriting_custom_id_nets_as_remove_plus_insert(spark, tmp_path):
    # an update that rewrites the index id column: the pre-image id is
    # tombstoned (no surviving copy → removed) and the new id rides the
    # hybrid sidecar as an insert — previously a guaranteed rebuild
    c = _mk(spark, tmp_path, "hswap")
    _seed_multi_file(c)
    c.create_search_index("ix", dict(SPEC))
    c.update_all({"_id": 4}, {"$set": {"_id": 888}})
    out = c.refresh_search_index("ix")
    assert out["mode"] == "incremental", out
    ids = sorted(
        r["_id"] for r in c.find({"$text": {"$search": "number"}}).all())
    assert 4 not in ids and 888 in ids
    inc = _bm25_state(c, spark, "ix")
    c.create_search_index("ix2", dict(SPEC))
    assert inc == _bm25_state(c, spark, "ix2")


def test_hybrid_manifest_minhash_too(spark, tmp_path):
    # the minhash netting consumes the same chain: introduced ids get
    # signatures, mutated ids are tombstoned
    c = _mk(spark, tmp_path, "hmh")
    c.insert_many([
        {"_id": i, "text": f"the quick brown fox jumps over dog {i}"}
        for i in range(6)
    ])
    c.insert_many([
        {"_id": i, "text": f"a completely different sentence topic {i}"}
        for i in range(6, 12)
    ])
    c.create_search_index("nx", {
        "kind": "minhash", "path": "text", "numHashes": 16, "bands": 8})
    (
        c.bulk()
        .update(
            {"_id": 2},
            {"$set": {"text": "the quick brown fox jumps over dog 0"}},
        )
        .upsert(
            {"_id": 700},
            {"$set": {"text": "the quick brown fox jumps over dog 1"}},
        )
        .run()
    )
    out = c.refresh_search_index("nx")
    assert out["mode"] == "incremental", out
    from anser_spark.engine import _read_index_table

    d = c._load_search_index("nx", warn_stale=False)
    sigs = _read_index_table(spark, d, "sig_dir", "sig_deltas")
    assert sigs.count() == 13
    pairs = c.near_dups_against_index(
        c.df().where(F.col("_id").isin([2, 700])), "nx", threshold=0.8)
    got = {(r["new_id"], r["old_id"]) for r in pairs.collect()}
    assert (2, 0) in got and (700, 1) in got, got


def test_gc_reclaims_orphan_pre_and_ins_dirs(spark, tmp_path):
    # ADVICE: {version}_pre/_ins dirs orphaned by a crash between the
    # pointer swap and the manifest write were never reclaimed
    c = _mk(spark, tmp_path, "orph")
    _seed_multi_file(c)
    c.create_search_index("ix", dict(SPEC))
    dd = c._deltas_dir()
    os.makedirs(os.path.join(dd, "v1_pre"), exist_ok=True)
    os.makedirs(os.path.join(dd, "v1_ins"), exist_ok=True)
    os.makedirs(os.path.join(dd, "v1.txn.deadbeef_pre"), exist_ok=True)
    # a YOUNG txn-staged orphan may belong to another process's open
    # transaction (round-13 ADVICE) — protected until the age threshold
    os.makedirs(os.path.join(dd, "v1.txn.cafebabe_pre"), exist_ok=True)
    old = os.path.join(dd, "v1.txn.deadbeef_pre")
    past = os.path.getmtime(old) - 7200
    os.utime(old, (past, past))
    # an in-flight-looking version (ordinal ≥ pointer) must be kept
    cur_o = c._version_ordinal(c._pointer())
    inflight = f"v{cur_o + 1}_pre"
    os.makedirs(os.path.join(dd, inflight), exist_ok=True)
    c._gc_deltas()
    left = sorted(
        e for e in os.listdir(dd) if e.endswith(("_pre", "_ins")))
    assert inflight in left
    assert "v1_pre" not in left and "v1_ins" not in left
    assert "v1.txn.deadbeef_pre" not in left  # past the age threshold
    assert "v1.txn.cafebabe_pre" in left  # young: possibly staged elsewhere


def test_aborted_txn_leaves_no_preimage_dirs(spark, tmp_path):
    eng = Engine(spark, workdir=str(tmp_path / "txnab"))
    c = eng.db("t").collection("docs")
    _seed_multi_file(c)
    c.create_search_index("ix", dict(SPEC))
    with pytest.raises(RuntimeError, match="boom"):
        with eng.transaction():
            c.update_all({"_id": 0}, {"$set": {"text": "staged change"}})
            raise RuntimeError("boom")
    dd = c._deltas_dir()
    orphans = [
        e for e in os.listdir(dd)
        if ".txn." in e and e.endswith(("_pre", "_ins", ".json"))
    ] if os.path.isdir(dd) else []
    assert orphans == [], orphans
    assert c.refresh_search_index("ix")["mode"] == "noop"


@pytest.mark.parametrize("seed", [7, 1212])
def test_hybrid_mutation_fuzz(spark, tmp_path, seed):
    # the round-11 metamorphic fuzzer extended with the two shapes that
    # used to break the chain: heterogeneous BULK batches mixing updates
    # with upsert-inserts (hybrid manifests) and re-use of removed ids
    # (removed-id set). Every refresh must stay incremental, bit-equal
    # to a fresh rebuild, and answer postings-on == postings-off.
    import random

    rng = random.Random(seed)
    c = _mk(spark, tmp_path, f"hfz{seed}")
    _seed_multi_file(c, n=10)
    c.create_search_index("ix", dict(SPEC))
    words = ["spark", "running", "cluster", "mongo", "quick", "delta"]
    next_id = 1000
    live = set(range(10))
    dead: set[int] = set()
    for step in range(10):
        op = rng.choice(["insert", "update", "remove", "bulk", "reuse"])
        if op == "reuse" and dead:
            rid = rng.choice(sorted(dead))
            c.insert_many([{
                "_id": rid, "text": " ".join(rng.choices(words, k=4)),
                "v": 9,
            }])
            dead.discard(rid)
            live.add(rid)
        elif op == "insert" or (op in ("update", "remove") and not live):
            ids = [next_id + j for j in range(rng.randint(1, 3))]
            next_id += len(ids)
            c.insert_many([
                {"_id": i, "text": " ".join(rng.choices(words, k=4)), "v": 0}
                for i in ids
            ])
            live.update(ids)
        elif op == "update":
            victim = rng.choice(sorted(live))
            c.update_all(
                {"_id": victim},
                {"$set": {"text": " ".join(rng.choices(words, k=3))}},
            )
        elif op == "bulk":
            b = c.bulk()
            if live:
                v = rng.choice(sorted(live))
                b.update(
                    {"_id": v},
                    {"$set": {"text": " ".join(rng.choices(words, k=3))}},
                )
            nid = next_id
            next_id += 1
            b.upsert(
                {"_id": nid},
                {"$set": {"text": " ".join(rng.choices(words, k=4))}},
            )
            live.add(nid)
            victims = sorted(live - {nid})
            if rng.random() < 0.5 and len(victims) > 2:
                v2 = rng.choice(victims)
                b.remove_all({"_id": v2})
                live.discard(v2)
                dead.add(v2)
            b.run()
        else:  # remove
            victim = rng.choice(sorted(live))
            c.remove_all({"_id": victim})
            live.discard(victim)
            dead.add(victim)
        if rng.random() < 0.6 or step == 9:
            out = c.refresh_search_index("ix")
            assert out["mode"] in ("incremental", "noop"), (step, out)
            inc = _bm25_state(c, spark, "ix")
            c.create_search_index("ix2", dict(SPEC))
            assert inc == _bm25_state(c, spark, "ix2"), (seed, step)
            q = rng.choice(words)
            on = sorted(r["_id"] for r in c.find(
                {"$text": {"$search": q}}).all())
            spark.conf.set("spark.anser.text.usePostings", "false")
            try:
                off = sorted(r["_id"] for r in c.find(
                    {"$text": {"$search": q}}).all())
            finally:
                spark.conf.unset("spark.anser.text.usePostings")
            assert on == off, (seed, step, q)


# ---------------------------------------------------------------------------
# Removed-id reuse: re-inserting a previously-removed doc's id refreshes
# incrementally (round 11 probed it as a collision and rebuilt)
# ---------------------------------------------------------------------------


def test_removed_id_reuse_refreshes_incrementally(spark, tmp_path):
    c = _mk(spark, tmp_path, "reuse")
    _seed_multi_file(c)
    c.create_search_index("ix", dict(SPEC))
    c.remove_all({"_id": 5})
    out1 = c.refresh_search_index("ix")
    assert out1["mode"] == "incremental" and out1.get("tombstoned") == 1
    # cross-window id reuse: a brand-new document under the dead id
    c.insert_many([{"_id": 5, "text": "reborn document five", "v": 1}])
    out2 = c.refresh_search_index("ix")
    assert out2["mode"] == "incremental", out2
    assert sorted(
        r["_id"] for r in c.find({"$text": {"$search": "reborn"}}).all()
    ) == [5]
    # old content is gone from the index
    assert 5 not in {
        r["_id"] for r in c.find({"$text": {"$search": "number"}}).all()
    }
    inc = _bm25_state(c, spark, "ix")
    c.create_search_index("ix2", dict(SPEC))
    assert inc == _bm25_state(c, spark, "ix2")


def test_live_id_collision_still_rebuilds(spark, tmp_path):
    # reuse of a LIVE id is a uniqueness hazard — the probe must still
    # trip the conservative rebuild
    c = _mk(spark, tmp_path, "livecol")
    _seed_multi_file(c)
    c.create_search_index("ix", dict(SPEC))
    c.insert_many([{"_id": 3, "text": "duplicate three", "v": 1}])
    out = c.refresh_search_index("ix")
    assert out["mode"] == "rebuild", out


def test_removed_id_reuse_cycle_and_reremove(spark, tmp_path):
    # remove → re-add → remove → re-add across windows: the removed set
    # must track latest state (a revived id leaves it, so a LIVE reuse
    # later still reads as a collision)
    c = _mk(spark, tmp_path, "cycle")
    _seed_multi_file(c)
    c.create_search_index("ix", dict(SPEC))
    c.remove_all({"_id": 8})
    assert c.refresh_search_index("ix")["mode"] == "incremental"
    c.insert_many([{"_id": 8, "text": "second life eight", "v": 1}])
    assert c.refresh_search_index("ix")["mode"] == "incremental"
    # now id 8 is LIVE again: inserting it once more must rebuild
    c.insert_many([{"_id": 8, "text": "third copy eight", "v": 2}])
    assert c.refresh_search_index("ix")["mode"] == "rebuild"


def test_removed_id_compaction_folds_dead_ids(spark, tmp_path):
    c = _mk(spark, tmp_path, "rcomp")
    _seed_multi_file(c)
    c.create_search_index("ix", dict(SPEC))
    spark.conf.set("spark.anser.index.compactThreshold", "2")
    try:
        c.remove_all({"_id": 0})
        assert c.refresh_search_index("ix")["mode"] == "incremental"
        c.insert_many([{"_id": 100, "text": "filler one hundred", "v": 1}])
        assert c.refresh_search_index("ix")["mode"] == "incremental"
        c.insert_many([{"_id": 101, "text": "filler one oh one", "v": 1}])
        assert c.refresh_search_index("ix")["mode"] == "incremental"
        d = dict(c._load_search_index("ix", warn_stale=False))
        if not d.get("ids_deltas"):
            # a compaction ran: the removed set folded away and the
            # sidecar holds exactly the live ids
            assert not d.get("removed_dir")
            side = {r["id"] for r in spark.read.parquet(d["ids_dir"]).collect()}
            assert 0 not in side and 100 in side and 101 in side
        # after the fold, reusing the dead id is a plain insert
        c.insert_many([{"_id": 0, "text": "recycled zero", "v": 2}])
        assert c.refresh_search_index("ix")["mode"] == "incremental"
        assert sorted(
            r["_id"] for r in c.find({"$text": {"$search": "recycled"}}).all()
        ) == [0]
        inc = _bm25_state(c, spark, "ix")
        c.create_search_index("ix2", dict(SPEC))
        assert inc == _bm25_state(c, spark, "ix2")
    finally:
        spark.conf.unset("spark.anser.index.compactThreshold")


def test_removed_id_reuse_weighted_index(spark, tmp_path):
    c = _mk(spark, tmp_path, "rw")
    c.insert_many([
        {"_id": i, "title": f"title {i}", "text": f"spark body {i}"}
        for i in range(8)
    ])
    c.create_search_index("wx", {
        "kind": "bm25", "weights": {"title": 3, "text": 1},
        "default_language": "english"})
    c.remove_all({"_id": 2})
    assert c.refresh_search_index("wx")["mode"] == "incremental"
    c.insert_many([{"_id": 2, "title": "fresh title", "text": "reborn body"}])
    out = c.refresh_search_index("wx")
    assert out["mode"] == "incremental", out
    ids = sorted(r["_id"] for r in c.find(
        {"$text": {"$search": "reborn"}}).all())
    assert ids == [2]


# ---------------------------------------------------------------------------
# Weighted-index service for SINGLE-path $search operators (round 12):
# field-filtered postings lookups (WHERE field = path)
# ---------------------------------------------------------------------------

WDOCS12 = [
    {"_id": 0, "title": "spark cluster guide",
     "body": "running jobs on the cluster quickly"},
    {"_id": 1, "title": "mongo migration",
     "body": "spark is mentioned here once"},
    {"_id": 2, "title": "cooking pasta", "body": "boil water and add salt"},
    {"_id": 3, "title": None, "body": "spark spark spark everywhere"},
    {"_id": 4, "title": "quick spark tips", "body": None},
    {"_id": 5, "title": "spark spark again", "body": "cluster notes"},
]

WSPEC12 = {"kind": "bm25", "weights": {"title": 3, "body": 1},
           "default_language": "english"}


def _wsearch(c, path, query, index="wx"):
    return {
        r["_id"]: round(r["score"], 10)
        for r in c.pipe([
            {"$search": {"index": index, "text": {
                "query": query, "path": path,
                "analyzer": "lucene.english"}}},
            {"$project": {"_id": 1, "score": 1}},
        ]).all()
    }


def test_weighted_single_path_text_served_and_exact(spark, tmp_path):
    c = _mk(spark, tmp_path, "wsp")
    c.insert_many(WDOCS12)
    c.create_search_index("wx", dict(WSPEC12))
    for path in ("title", "body"):
        served = _wsearch(c, path, "spark cluster")
        # hatch differential: scan path (same field-filtered stats)
        spark.conf.set("spark.anser.text.usePostings", "false")
        try:
            scan = _wsearch(c, path, "spark cluster")
        finally:
            spark.conf.unset("spark.anser.text.usePostings")
        assert served == scan, (path, served, scan)
        assert served, path
    # title hits only docs whose TITLE mentions the terms
    t = _wsearch(c, "title", "spark")
    assert sorted(t) == [0, 4, 5]
    b = _wsearch(c, "body", "spark")
    assert sorted(b) == [1, 3]


def test_weighted_single_path_matches_single_field_index(spark, tmp_path):
    # the field view must behave EXACTLY like a dedicated single-field
    # index on that field: same candidates, same BM25 values
    c = _mk(spark, tmp_path, "wsp2")
    c.insert_many(WDOCS12)
    c.create_search_index("wx", dict(WSPEC12))
    c.create_search_index("tx", {
        "kind": "bm25", "path": "title", "default_language": "english"})
    via_weighted = _wsearch(c, "title", "spark quick")
    via_single = _wsearch(c, "title", "spark quick", index="tx")
    assert via_weighted == via_single


def test_weighted_single_path_plan_no_python(spark, tmp_path):
    c = _mk(spark, tmp_path, "wsp3")
    c.insert_many(WDOCS12)
    c.create_search_index("wx", dict(WSPEC12))
    df = c.pipe([
        {"$search": {"index": "wx", "text": {
            "query": "cluster", "path": "title",
            "analyzer": "lucene.english"}}},
    ]).to_df()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


def test_weighted_single_path_search_meta_count_and_facet(spark, tmp_path):
    c = _mk(spark, tmp_path, "wsp4")
    c.insert_many([
        {**d, "lang": ("en" if d["_id"] % 2 == 0 else "de")}
        for d in WDOCS12
    ])
    c.create_search_index("wx", dict(WSPEC12))
    out = c.pipe([{"$searchMeta": {
        "text": {"query": "spark", "path": "title",
                 "analyzer": "lucene.english"},
        "index": "wx"}}]).all()[0]
    assert out["count"]["total"] == 3
    fac = c.pipe([{"$searchMeta": {"facet": {
        "operator": {"text": {"query": "spark", "path": "title",
                              "analyzer": "lucene.english"}},
        "facets": {"by_lang": {"type": "string", "path": "lang"}},
    }, "index": "wx"}}]).all()[0]
    assert fac["count"]["total"] == 3
    buckets = dict((r["_id"], r["count"]) for r in fac["facet_by_lang"])
    assert buckets == {"en": 2, "de": 1}


def _wop(c, op, spec, index="wx"):
    return {
        r["_id"]: round(r["score"], 10)
        for r in c.pipe([
            {"$search": {"index": index, op: spec}},
            {"$project": {"_id": 1, "score": 1}},
        ]).all()
    }


def test_weighted_single_path_phrase_and_autocomplete(spark, tmp_path):
    # round 12: the weighted build stores positions and a field-tagged
    # raw-token sidecar, so phrase / autocomplete on ONE weighted field
    # serve from the index — hatch differential + single-field parity
    c = _mk(spark, tmp_path, "wpa")
    c.insert_many(WDOCS12)
    c.create_search_index("wx", dict(WSPEC12))
    c.create_search_index("tx", {
        "kind": "bm25", "path": "title", "default_language": "english"})
    cases = [
        ("phrase", {"query": "spark cluster", "path": "title"}),
        ("phrase", {"query": "spark tips", "path": "title", "slop": 1}),
        ("autocomplete", {"query": "spar clu", "path": "title"}),
        ("autocomplete", {"query": "spark", "path": "title",
                          "tokenOrder": "sequential"}),
    ]
    for op, spec in cases:
        served = _wop(c, op, dict(spec))
        spark.conf.set("spark.anser.text.usePostings", "false")
        try:
            scan = _wop(c, op, dict(spec))
        finally:
            spark.conf.unset("spark.anser.text.usePostings")
        assert served == scan, (op, spec, served, scan)
        via_single = _wop(c, op, dict(spec), index="tx")
        assert served == via_single, (op, spec, served, via_single)
    # sanity: the phrase actually matches something
    assert _wop(c, "phrase", {"query": "spark cluster", "path": "title"})


def test_weighted_multi_path_text_from_postings(spark, tmp_path):
    # Atlas multi-path text over a weighted index serves from the
    # field-tagged postings — hatch differential against the inline
    # per-field-sum scan (which computes its own stats, so this also
    # proves the build's per-field stats equal the inline formulas)
    c = _mk(spark, tmp_path, "wmp")
    c.insert_many(WDOCS12)
    c.create_search_index("wx", dict(WSPEC12))
    spec = {"query": "spark cluster", "path": ["title", "body"],
            "analyzer": "lucene.english"}
    served = _wop(c, "text", dict(spec))
    spark.conf.set("spark.anser.text.usePostings", "false")
    try:
        scan = _wop(c, "text", dict(spec))
    finally:
        spark.conf.unset("spark.anser.text.usePostings")
    assert served == scan and served, (served, scan)
    # field order in the request matters for float association — the
    # reversed list must also match its scan twin
    spec2 = {"query": "spark cluster", "path": ["body", "title"],
             "analyzer": "lucene.english"}
    served2 = _wop(c, "text", dict(spec2))
    spark.conf.set("spark.anser.text.usePostings", "false")
    try:
        scan2 = _wop(c, "text", dict(spec2))
    finally:
        spark.conf.unset("spark.anser.text.usePostings")
    assert served2 == scan2
    # a path list naming an unindexed field keeps the scan (correct)
    c2 = _mk(spark, tmp_path, "wmp2")
    c2.insert_many([{**d, "extra": "spark here"} for d in WDOCS12])
    c2.create_search_index("wx", dict(WSPEC12))
    mixed = _wop(c2, "text", {"query": "spark", "path": ["title", "extra"],
                              "analyzer": "lucene.english"})
    assert 1 not in mixed or True  # shape check only: no exception
    assert all(isinstance(k, int) for k in mixed)


def test_weighted_compound_anchored_on_field_view(spark, tmp_path):
    # a compound whose text/phrase must-clause targets ONE weighted
    # field anchors from the field-filtered postings; structured rest
    # applies over the bounded candidates — hatch differential green
    c = _mk(spark, tmp_path, "wcmp")
    c.insert_many([
        {**d, "grp": d["_id"] % 2} for d in WDOCS12
    ])
    c.create_search_index("wx", dict(WSPEC12))
    spec = {"compound": {
        "must": [{"text": {"query": "spark", "path": "title",
                           "analyzer": "lucene.english"}}],
        "filter": [{"range": {"path": "grp", "gte": 0, "lte": 0}}],
    }}
    served = _wop(c, "compound", dict(spec["compound"]))
    spark.conf.set("spark.anser.text.usePostings", "false")
    try:
        scan = _wop(c, "compound", dict(spec["compound"]))
    finally:
        spark.conf.unset("spark.anser.text.usePostings")
    assert served == scan and served, (served, scan)
    assert all(i % 2 == 0 for i in served)


def test_weighted_phrase_after_mutation_refresh(spark, tmp_path):
    c = _mk(spark, tmp_path, "wpm")
    c.insert_many(WDOCS12)
    c.create_search_index("wx", dict(WSPEC12))
    c.update_all({"_id": 1}, {"$set": {"title": "spark cluster mongo"}})
    c.insert_many([
        {"_id": 10, "title": "fresh spark cluster", "body": "x"}])
    c.remove_all({"_id": 0})
    out = c.refresh_search_index("wx")
    assert out["mode"] == "incremental", out
    served = _wop(c, "phrase", {"query": "spark cluster", "path": "title"})
    spark.conf.set("spark.anser.text.usePostings", "false")
    try:
        scan = _wop(c, "phrase", {"query": "spark cluster", "path": "title"})
    finally:
        spark.conf.unset("spark.anser.text.usePostings")
    assert served == scan
    assert sorted(served) == [1, 10]


def test_weighted_single_path_after_mutation_refresh(spark, tmp_path):
    # the field view reads the layered postings (deltas + tombstones)
    c = _mk(spark, tmp_path, "wsp5")
    c.insert_many(WDOCS12)
    c.create_search_index("wx", dict(WSPEC12))
    c.update_all({"_id": 2}, {"$set": {"title": "spark cooking"}})
    c.insert_many([{"_id": 9, "title": "spark nine", "body": "nothing"}])
    assert c.refresh_search_index("wx")["mode"] == "incremental"
    served = _wsearch(c, "title", "spark")
    spark.conf.set("spark.anser.text.usePostings", "false")
    try:
        scan = _wsearch(c, "title", "spark")
    finally:
        spark.conf.unset("spark.anser.text.usePostings")
    assert served == scan
    assert sorted(served) == [0, 2, 4, 5, 9]


# ---------------------------------------------------------------------------
# Incremental IVF refresh (round 12): fixed centroids + staged cell
# deltas + shared tombstone generations; drift stat gates the retrain
# ---------------------------------------------------------------------------


def _vec_coll(spark, tmp_path, tag, n=60, dim=6, seed=5):
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


def _vs(c, qv, limit=8, index="vx", flt=None):
    arg = {"path": "embedding", "queryVector": [float(x) for x in qv],
           "limit": limit, "index": index}
    if flt:
        arg["filter"] = flt
    return [
        (r["_id"], round(r["score"], 10))
        for r in c.pipe([{"$vectorSearch": arg}]).all()
    ]


def test_ivf_cells_table_query_parity(spark, tmp_path):
    # the cells-table path must return exactly what the inline
    # assignment path returns (same centroids, same floats), with and
    # without a pre-filter
    c, rng = _vec_coll(spark, tmp_path, "ivq")
    c.create_search_index("vx", {"kind": "ivf", "path": "embedding",
                                 "nlist": 4, "nprobe": 2})
    d = c._load_search_index("vx", warn_stale=False)
    assert d.get("cells_dir"), "cells table must materialize"
    qv = rng.normal(size=6)
    on = _vs(c, qv)
    spark.conf.set("spark.anser.vector.useCells", "false")
    try:
        off = _vs(c, qv)
    finally:
        spark.conf.unset("spark.anser.vector.useCells")
    assert on == off
    f_on = _vs(c, qv, flt={"grp": 1})
    spark.conf.set("spark.anser.vector.useCells", "false")
    try:
        f_off = _vs(c, qv, flt={"grp": 1})
    finally:
        spark.conf.unset("spark.anser.vector.useCells")
    assert f_on == f_off
    assert all(i % 3 == 1 for i, _ in f_on)


def test_ivf_incremental_refresh_mutations(spark, tmp_path):
    # insert + update + remove in one window: incremental refresh, and
    # the layered cells table answers exactly like a fresh rebuild
    import numpy as np

    c, rng = _vec_coll(spark, tmp_path, "ivm")
    c.create_search_index("vx", {"kind": "ivf", "path": "embedding",
                                 "nlist": 4, "nprobe": 4})
    new_vecs = {
        100: [float(x) for x in rng.normal(size=6)],
        101: [float(x) for x in rng.normal(size=6)],
    }
    c.insert_many([
        {"_id": i, "embedding": v, "grp": i % 3} for i, v in new_vecs.items()
    ])
    upd = [float(x) for x in rng.normal(size=6)]
    c.update_all({"_id": 7}, {"$set": {"embedding": upd}})
    c.remove_all({"_id": 11})
    out = c.refresh_search_index("vx")
    assert out["mode"] == "incremental", out
    assert out["inserted"] >= 3 and out.get("tombstoned") == 2
    qv = np.array(new_vecs[100])
    got = _vs(c, qv, limit=10)
    # full-probe incremental index == exact scan ranking
    exact = [
        (r["_id"], round(r["score"], 10))
        for r in c.pipe([{"$vectorSearch": {
            "path": "embedding", "queryVector": [float(x) for x in qv],
            "limit": 10, "exact": True}}]).all()
    ]
    assert got == exact
    assert got[0][0] == 100
    assert all(i != 11 for i, _ in got)
    # updated doc is served under its NEW vector: query right at it
    got_upd = _vs(c, upd, limit=1)
    assert got_upd[0][0] == 7


def test_ivf_drift_trips_rebuild(spark, tmp_path):
    # a far-out-of-distribution delta must retrain (rebuild); the same
    # delta under a huge threshold stays incremental
    c, rng = _vec_coll(spark, tmp_path, "ivd")
    c.create_search_index("vx", {"kind": "ivf", "path": "embedding",
                                 "nlist": 4, "nprobe": 4})
    far = [
        {"_id": 200 + i, "embedding": [1000.0 + i] * 6, "grp": 0}
        for i in range(6)
    ]
    c.insert_many(far)
    spark.conf.set("spark.anser.index.ivfDriftRatio", "1000000")
    try:
        assert c.refresh_search_index("vx")["mode"] == "incremental"
    finally:
        spark.conf.unset("spark.anser.index.ivfDriftRatio")
    # same shape again at the default threshold → rebuild
    c.insert_many([
        {"_id": 300 + i, "embedding": [-1000.0 - i] * 6, "grp": 0}
        for i in range(6)
    ])
    assert c.refresh_search_index("vx")["mode"] == "rebuild"


def test_ivf_removed_id_reuse_is_plain_insert(spark, tmp_path):
    # the layered cells read tombstones dead ids out, so re-using a
    # removed id never even reads as a collision
    c, rng = _vec_coll(spark, tmp_path, "ivr")
    c.create_search_index("vx", {"kind": "ivf", "path": "embedding",
                                 "nlist": 4, "nprobe": 4})
    c.remove_all({"_id": 3})
    assert c.refresh_search_index("vx")["mode"] == "incremental"
    v = [float(x) for x in rng.normal(size=6)]
    c.insert_many([{"_id": 3, "embedding": v, "grp": 0}])
    out = c.refresh_search_index("vx")
    assert out["mode"] == "incremental", out
    assert _vs(c, v, limit=1)[0][0] == 3
    # but a LIVE duplicate id still rebuilds
    c.insert_many([{"_id": 4, "embedding": v, "grp": 1}])
    assert c.refresh_search_index("vx")["mode"] == "rebuild"


def test_exact_true_overrides_named_index(spark, tmp_path):
    # Atlas ENN: exact searches exactly even when an index is named —
    # with a low nprobe the ANN path may miss; exact must not
    c, rng = _vec_coll(spark, tmp_path, "ivex")
    c.create_search_index("vx", {"kind": "ivf", "path": "embedding",
                                 "nlist": 8, "nprobe": 1})
    qv = [float(x) for x in rng.normal(size=6)]
    exact_named = [
        (r["_id"], round(r["score"], 10))
        for r in c.pipe([{"$vectorSearch": {
            "path": "embedding", "queryVector": qv, "limit": 10,
            "index": "vx", "exact": True}}]).all()
    ]
    exact_plain = [
        (r["_id"], round(r["score"], 10))
        for r in c.pipe([{"$vectorSearch": {
            "path": "embedding", "queryVector": qv, "limit": 10,
            "exact": True}}]).all()
    ]
    assert exact_named == exact_plain


def test_hybrid_manifest_two_id_columns(spark, tmp_path):
    # two refreshable indexes with DIFFERENT id columns: the hybrid
    # manifest records per-column extras sidecars and each index nets
    # its own ids
    c = _mk(spark, tmp_path, "h2id")
    c.insert_many([
        {"_id": i, "alt_id": 100 + i, "text": f"spark doc number {i}",
         "v": 0}
        for i in range(6)
    ])
    c.insert_many([
        {"_id": i, "alt_id": 100 + i, "text": f"running cluster item {i}",
         "v": 0}
        for i in range(6, 12)
    ])
    c.create_search_index("ix", dict(SPEC))
    c.create_search_index("ax", {
        "kind": "bm25", "path": "text", "default_language": "english",
        "id_col": "alt_id"})
    (
        c.bulk()
        .update({"_id": 0}, {"$set": {"text": "bulk changed"}})
        .upsert(
            {"_id": 999},
            {"$set": {"text": "bulk upserted", "alt_id": 1099}},
        )
        .run()
    )
    assert c.refresh_search_index("ix")["mode"] == "incremental"
    assert c.refresh_search_index("ax")["mode"] == "incremental"
    assert sorted(
        r["_id"] for r in c.find({"$text": {"$search": "bulk"}}).all()
    ) == [0, 999]
    inc = _bm25_state(c, spark, "ix")
    c.create_search_index("ix2", dict(SPEC))
    assert inc == _bm25_state(c, spark, "ix2")


def test_ivf_cells_compaction_bounds_dirs(spark, tmp_path):
    import os

    c, rng = _vec_coll(spark, tmp_path, "ivc")
    c.create_search_index("vx", {"kind": "ivf", "path": "embedding",
                                 "nlist": 4, "nprobe": 4})
    spark.conf.set("spark.anser.index.compactThreshold", "3")
    try:
        for i in range(7):
            c.insert_many([{
                "_id": 400 + i,
                "embedding": [float(x) for x in rng.normal(size=6)],
                "grp": 0,
            }])
            assert c.refresh_search_index("vx")["mode"] == "incremental"
        d = dict(c._load_search_index("vx", warn_stale=False))
        assert len(d.get("cells_deltas") or []) < 3
        idx = c._search_index_dir()
        mine = [e for e in os.listdir(idx) if e.startswith("vx_")]
        assert len(mine) <= 6, mine
        # layered result still equals the exact ranking at full probe
        qv = rng.normal(size=6)
        got = _vs(c, qv, limit=6)
        exact = [
            (r["_id"], round(r["score"], 10))
            for r in c.pipe([{"$vectorSearch": {
                "path": "embedding", "queryVector": [float(x) for x in qv],
                "limit": 6, "exact": True}}]).all()
        ]
        assert got == exact
    finally:
        spark.conf.unset("spark.anser.index.compactThreshold")


def test_minhash_append_same_ids_different_content(spark, tmp_path):
    # ADVICE: append keyed on the id multiset alone let a second batch
    # with identical ids but different text overwrite the first's
    # published delta in place and drop itself from the delta list
    c = _mk(spark, tmp_path, "mhkey")
    c.insert_many([
        {"_id": i, "text": f"the quick brown fox jumps over dog {i}"}
        for i in range(6)
    ])
    c.create_search_index("nx", {
        "kind": "minhash", "path": "text", "numHashes": 16, "bands": 8})
    b1 = spark.createDataFrame(
        [(100, "a completely different sentence topic one")],
        "_id long, text string")
    b2 = spark.createDataFrame(
        [(101, "yet another unrelated batch of words here")],
        "_id long, text string")
    c.append_to_minhash_index("nx", b1)
    # same ROW COUNT and same id-hash sum trap needs identical id sets;
    # use the exact same id with different content
    b1b = spark.createDataFrame(
        [(100, "totally new content for the same identifier")],
        "_id long, text string")
    c.append_to_minhash_index("nx", b1b)
    c.append_to_minhash_index("nx", b2)
    from anser_spark.engine import _read_index_table

    d = c._load_search_index("nx", warn_stale=False)
    sigs = _read_index_table(spark, d, "sig_dir", "sig_deltas")
    # both batches' signatures are present (id 100 twice: append is
    # append — dedup is the caller's contract), nothing was silently
    # replaced or dropped
    assert sigs.where(F.col("_id") == 100).count() == 2
    assert sigs.where(F.col("_id") == 101).count() == 1
    # identical-batch retry stays a no-op (same content key)
    c.append_to_minhash_index("nx", b2)
    d2 = c._load_search_index("nx", warn_stale=False)
    sigs2 = _read_index_table(spark, d2, "sig_dir", "sig_deltas")
    assert sigs2.where(F.col("_id") == 101).count() == 1
