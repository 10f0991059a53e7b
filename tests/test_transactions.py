"""Engine.transaction(): multi-collection atomic commits over versioned
parquet collections — staged pointer swaps, read-your-writes inside the
scope, all-or-nothing optimistic CAS against concurrent writers, abort
reclaims staged versions, and crash-mid-commit rolls forward from the
fsynced intent journal on the next Engine construction."""

import os

import pytest

from anser_spark.engine import Engine, WriteConflictError


def _mk(spark, tmp_path, name="e"):
    eng = Engine(spark, workdir=str(tmp_path / "work"))
    a = eng.db("appdb").collection("alpha")
    b = eng.db("appdb").collection("beta")
    a._rewrite(spark.createDataFrame([(1, 10), (2, 20)], "_id long, v long"))
    b._rewrite(spark.createDataFrame([(1, 100)], "_id long, v long"))
    return eng, a, b


def test_commit_publishes_both(spark, tmp_path):
    eng, a, b = _mk(spark, tmp_path)
    with eng.transaction():
        a.update_all({}, {"$inc": {"v": 1}})
        b.insert({"_id": 2, "v": 200})
        # read-your-writes inside the scope
        assert a.find({"v": 11}).count() == 1
        assert b.find({}).count() == 2
    assert a.find({"v": 11}).count() == 1
    assert b.find({}).count() == 2


def test_staged_invisible_to_other_engine(spark, tmp_path):
    eng, a, b = _mk(spark, tmp_path)
    other = Engine(spark, workdir=eng.workdir)
    oa = other.db("appdb").collection("alpha")
    with eng.transaction():
        a.update_all({}, {"$inc": {"v": 5}})
        # other engine still sees the committed state mid-transaction
        assert oa.find({"v": 10}).count() == 1
        assert oa.find({"v": 15}).count() == 0
    assert oa.find({"v": 15}).count() == 1


def test_exception_aborts_and_reclaims(spark, tmp_path):
    eng, a, b = _mk(spark, tmp_path)
    before_a = sorted(os.listdir(a._store_dir))
    with pytest.raises(RuntimeError, match="boom"):
        with eng.transaction():
            a.update_all({}, {"$set": {"v": 0}})
            b.update_all({}, {"$set": {"v": 0}})
            raise RuntimeError("boom")
    assert a.find({"v": 0}).count() == 0
    assert b.find({"v": 0}).count() == 0
    # staged version dirs were reclaimed
    assert sorted(os.listdir(a._store_dir)) == before_a
    # engine is usable again (txn state cleared)
    a.update_all({}, {"$inc": {"v": 1}})
    assert a.find({"v": 11}).count() == 1


def test_conflicting_writer_aborts_whole_txn(spark, tmp_path):
    eng, a, b = _mk(spark, tmp_path)
    other = Engine(spark, workdir=eng.workdir)
    with pytest.raises(WriteConflictError):
        with eng.transaction():
            a.update_all({}, {"$inc": {"v": 1}})
            b.update_all({}, {"$inc": {"v": 1}})
            # a concurrent writer commits to alpha mid-transaction
            other.db("appdb").collection("alpha").update_all(
                {}, {"$set": {"v": 777}})
    # NEITHER staged change is visible — beta rolled back too
    assert b.find({"v": 101}).count() == 0
    assert a.find({"v": 777}).count() == 2


def test_multiple_mutations_chain_within_txn(spark, tmp_path):
    eng, a, b = _mk(spark, tmp_path)
    with eng.transaction():
        a.update_all({}, {"$inc": {"v": 1}})
        a.update_all({}, {"$inc": {"v": 1}})
        a.insert({"_id": 3, "v": 30})
    rows = sorted((r["_id"], r["v"]) for r in a.find({}).all())
    assert rows == [(1, 12), (2, 22), (3, 30)]


def test_nested_transaction_rejected(spark, tmp_path):
    eng, a, b = _mk(spark, tmp_path)
    with eng.transaction():
        with pytest.raises(RuntimeError, match="nested"):
            with eng.transaction():
                pass


def test_drop_rejected_in_txn(spark, tmp_path):
    eng, a, b = _mk(spark, tmp_path)
    with pytest.raises(RuntimeError, match="not transactional"):
        with eng.transaction():
            a.drop()
    # and the aborted txn did not break anything
    assert a.find({}).count() == 2


def test_crash_mid_commit_rolls_forward(spark, tmp_path):
    # simulate: journal written + one pointer swapped, then crash —
    # recovery must finish the remaining swaps
    eng, a, b = _mk(spark, tmp_path)
    b.set_retention(5)  # keep v1 around so the hand-rollback below reads
    with eng.transaction() as txn:
        a.update_all({}, {"$set": {"v": 1}})
        b.update_all({}, {"$set": {"v": 2}})
        staged = dict(txn.staged)
    # commit ran on scope exit; reconstruct a half-applied state by
    # hand: restore beta's OLD pointer and write the journal back
    bdir = b._store_dir
    old = "v1"
    jdir = os.path.join(eng.workdir, "_TXNJOURNAL")
    os.makedirs(jdir, exist_ok=True)
    ent = staged[bdir]
    with open(os.path.join(jdir, "txn.crashtest"), "w") as fh:
        fh.write(f"{bdir}\t{ent['versions'][-1]}\t{{}}\n")
    with open(os.path.join(bdir, "_CURRENT"), "w") as fh:
        fh.write(old)
    assert b.find({"v": 2}).count() == 0  # rolled back by hand
    # a fresh engine over the same workdir rolls the journal forward
    eng2 = Engine(spark, workdir=eng.workdir)
    b2 = eng2.db("appdb").collection("beta")
    assert b2.find({"v": 2}).count() == 1
    assert not os.listdir(jdir)


def test_stale_journal_does_not_move_pointer_backward(spark, tmp_path):
    # a journal whose base pointer no longer matches the store's
    # current pointer (a NEWER commit landed after the crash) must be
    # skipped — replaying it would lose the newer commit
    import json

    eng, a, b = _mk(spark, tmp_path)
    b.set_retention(5)
    with eng.transaction() as txn:
        b.update_all({}, {"$set": {"v": 2}})
        staged = dict(txn.staged)
    ent = staged[b._store_dir]
    txn_version = ent["versions"][-1]
    # a NEWER commit moves the pointer past the journaled target
    b.update_all({}, {"$set": {"v": 3}})
    newer = b._pointer()
    assert newer != txn_version
    # resurrect the txn's journal with its (now stale) base pointer
    jdir = os.path.join(eng.workdir, "_TXNJOURNAL")
    os.makedirs(jdir, exist_ok=True)
    with open(os.path.join(jdir, "txn.staletest"), "w") as fh:
        fh.write(
            f"{b._store_dir}\t{txn_version}\t"
            f"{json.dumps(ent['base_ptr'])}\t{{}}\n"
        )
    eng2 = Engine(spark, workdir=eng.workdir)
    b2 = eng2.db("appdb").collection("beta")
    assert b2._pointer() == newer  # untouched — no backward move
    assert b2.find({"v": 3}).count() == 1
    assert not os.listdir(jdir)  # stale journal consumed, not replayed


def test_new_format_journal_rolls_forward(spark, tmp_path):
    # same crash simulation as above but with the 4-field (base-pointer)
    # journal the commit path now writes: base matches → replay applies
    import json

    eng, a, b = _mk(spark, tmp_path)
    b.set_retention(5)
    with eng.transaction() as txn:
        b.update_all({}, {"$set": {"v": 2}})
        staged = dict(txn.staged)
    ent = staged[b._store_dir]
    jdir = os.path.join(eng.workdir, "_TXNJOURNAL")
    os.makedirs(jdir, exist_ok=True)
    with open(os.path.join(jdir, "txn.crash4"), "w") as fh:
        fh.write(
            f"{b._store_dir}\t{ent['versions'][-1]}\t"
            f"{json.dumps(ent['base_ptr'])}\t{{}}\n"
        )
    with open(os.path.join(b._store_dir, "_CURRENT"), "w") as fh:
        fh.write(ent["base_ptr"])  # roll pointer back to pre-txn state
    eng2 = Engine(spark, workdir=eng.workdir)
    b2 = eng2.db("appdb").collection("beta")
    assert b2.find({"v": 2}).count() == 1
    assert not os.listdir(jdir)


def test_empty_transaction_is_noop(spark, tmp_path):
    eng, a, b = _mk(spark, tmp_path)
    with eng.transaction():
        assert a.find({}).count() == 2
    assert eng._txn is None


def test_merge_stage_participates_in_txn(spark, tmp_path):
    # $merge writes through the same staged COW path — a pipeline sink
    # inside a transaction commits atomically with other mutations
    eng, a, b = _mk(spark, tmp_path)
    with pytest.raises(RuntimeError, match="boom"):
        with eng.transaction():
            a.pipe([
                {"$group": {"_id": None, "total": {"$sum": "$v"}}},
                {"$merge": {"into": "summary"}},
            ]).all()
            assert eng.db("appdb").collection("summary").find({}).count() == 1
            raise RuntimeError("boom")
    # aborted: the $merge target was never published
    assert not eng.db("appdb").collection("summary").exists()
    with eng.transaction():
        a.pipe([
            {"$group": {"_id": None, "total": {"$sum": "$v"}}},
            {"$merge": {"into": "summary"}},
        ]).all()
    rows = eng.db("appdb").collection("summary").find({}).all()
    assert rows[0]["total"] == 30


def test_with_transaction_retries_on_conflict(spark, tmp_path):
    eng, a, b = _mk(spark, tmp_path)
    other = Engine(spark, workdir=eng.workdir)
    calls = {"n": 0}

    def body(txn):
        calls["n"] += 1
        a.update_all({}, {"$inc": {"v": 1}})
        if calls["n"] == 1:
            # sabotage the first attempt: a writer commits AFTER this
            # txn took its read snapshot of alpha
            other.db("appdb").collection("alpha").update_all(
                {}, {"$inc": {"v": 1000}})
        return "done"

    assert eng.with_transaction(body) == "done"
    assert calls["n"] == 2
    # first attempt's sabotage (+1000) AND the retried body (+1) landed
    rows = sorted(r["v"] for r in a.find({}).all())
    assert rows == [1011, 1021]


def test_with_transaction_exhausts_retries(spark, tmp_path):
    eng, a, b = _mk(spark, tmp_path)
    other = Engine(spark, workdir=eng.workdir)

    def body(txn):
        a.update_all({}, {"$inc": {"v": 10}})
        other.db("appdb").collection("alpha").update_all(
            {}, {"$inc": {"v": 1}})

    with pytest.raises(WriteConflictError):
        eng.with_transaction(body, max_retries=2)


def test_search_index_staleness(spark, tmp_path):
    import warnings

    eng = Engine(spark, workdir=str(tmp_path / "w"))
    coll = eng.db("appdb").collection("docs")
    coll._rewrite(spark.createDataFrame(
        [(i, f"alpha beta doc {i}") for i in range(30)], "_id long, text string"))
    coll.create_search_index("tix", {"kind": "bm25", "path": "text"})
    st = coll.search_index_status("tix")
    assert st["stale"] is False and st["kind"] == "bm25"
    with warnings.catch_warnings():
        warnings.simplefilter("error")  # fresh index: no warning
        coll._load_search_index("tix")
    coll.update_all({}, {"$set": {"text": "mutated"}})
    st = coll.search_index_status("tix")
    assert st["stale"] is True
    with pytest.warns(UserWarning, match="stale|older snapshot"):
        coll._load_search_index("tix")
