"""Generate a ~10x scale-up of /root/testdata/sf0.1 for the round-6
scale rehearsal (VERDICT r5 next-step #1).  NOT driver data — a local
perf fixture written to .scratch/sf1 (gitignored).

TPC-H tables scale by key-shifted replication (10 replicas; foreign
keys shift together so every join keeps its selectivity); documents
and embeddings are regenerated at 10x from the sf0.1 vocabulary /
distributions with planted exact+near duplicates so the dedup/ANN
operators do real work.  Deterministic (fixed seeds).

Usage: python scripts/gen_sf1.py [out_dir] [replicas]
"""

import os
import sys

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
OUT = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.scratch/sf1"
R = int(sys.argv[2]) if len(sys.argv) > 2 else 10

# table -> {column: offset-key} ; offset = (max(key)+1) per base table
SHIFTS = {
    "customer": {"c_custkey": "c_custkey"},
    "supplier": {"s_suppkey": "s_suppkey"},
    "part": {"p_partkey": "p_partkey"},
    # price columns get a tiny per-replica perturbation (+r cents):
    # exact replication makes every revenue-style aggregate a 10-way
    # bit-level float tie across replicas, which Spark and DuckDB break
    # differently (a fixture artifact, not an engine property)
    "orders": {
        "o_orderkey": "o_orderkey",
        "o_custkey": "c_custkey",
        "o_totalprice": "__cents",
    },
    "lineitem": {
        "l_orderkey": "o_orderkey",
        "l_partkey": "p_partkey",
        "l_suppkey": "s_suppkey",
        "l_extendedprice": "__cents",
    },
    "events": {"event_id": "event_id", "user_id": "user_id"},
}
KEY_TABLE = {
    "c_custkey": "customer",
    "s_suppkey": "supplier",
    "p_partkey": "part",
    "o_orderkey": "orders",
    "event_id": "events",
    "user_id": "events",
}


def main() -> None:
    os.makedirs(OUT, exist_ok=True)
    con = duckdb.connect()

    offsets = {}
    for key, table in KEY_TABLE.items():
        offsets[key] = (
            con.execute(
                f"SELECT max({key}) + 1 FROM read_parquet('{SRC}/{table}.parquet')"
            ).fetchone()[0]
        )

    for table in ("region", "nation"):
        con.execute(
            f"COPY (SELECT * FROM read_parquet('{SRC}/{table}.parquet')) "
            f"TO '{OUT}/{table}.parquet' (FORMAT PARQUET)"
        )
        print(f"{table}: copied")

    for table, shift in SHIFTS.items():
        repl = ", ".join(
            f"round({col} + r * 0.01, 2) AS {col}"
            if key == "__cents"
            else f"{col} + r * {offsets[key]} AS {col}"
            for col, key in shift.items()
        )
        con.execute(
            f"COPY (SELECT * EXCLUDE (r) REPLACE ({repl}) "
            f"FROM read_parquet('{SRC}/{table}.parquet') "
            f"CROSS JOIN range({R}) AS t(r)) "
            f"TO '{OUT}/{table}.parquet' (FORMAT PARQUET, ROW_GROUP_SIZE 262144)"
        )
        n = con.execute(
            f"SELECT count(*) FROM read_parquet('{OUT}/{table}.parquet')"
        ).fetchone()[0]
        print(f"{table}: {n} rows")

    # ---- documents: regenerate at 10x from the sf0.1 vocabulary ------
    rng = np.random.default_rng(4242)
    vocab = [
        r[0]
        for r in con.execute(
            "SELECT DISTINCT unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) "
            f"FROM read_parquet('{SRC}/documents.parquet') WHERE text IS NOT NULL"
        ).fetchall()
        if r[0]
    ]
    lens = [
        r[0]
        for r in con.execute(
            "SELECT len(regexp_split_to_array(lower(trim(text)), '\\s+')) "
            f"FROM read_parquet('{SRC}/documents.parquet') WHERE text IS NOT NULL"
        ).fetchall()
    ]
    lang_src = con.execute(
        "SELECT lang, source, count(*) FROM "
        f"read_parquet('{SRC}/documents.parquet') GROUP BY 1, 2"
    ).fetchall()
    ls_pairs = [(l, s) for l, s, _ in lang_src]
    ls_w = np.array([c for _, _, c in lang_src], dtype=float)
    ls_w /= ls_w.sum()

    n_base = con.execute(
        f"SELECT count(*) FROM read_parquet('{SRC}/documents.parquet')"
    ).fetchone()[0]
    n_docs = n_base * R
    # realistic lexical statistics, not a uniform draw from the tiny
    # base vocabulary: the vocabulary grows with corpus size (Heaps'
    # law; 2R suffix variants per base word) and a mild Zipf exponent
    # weights the draw, so shingle posting lists stay power-law-bounded
    # like a real corpus instead of saturating (the round-6 rehearsal
    # caught the uniform small-vocab version driving Σ postings² up 82x
    # at 10x docs, which read as a fake super-linear ngram_jaccard)
    variants = max(2, 2 * R)
    vocab_arr = np.array(
        [w if j == 0 else f"{w}{j}" for w in vocab for j in range(variants)]
    )
    ranks = np.arange(1, len(vocab_arr) + 1, dtype=float)
    zipf_p = 1.0 / ranks ** 0.7
    zipf_p /= zipf_p.sum()
    texts = []
    doc_lens = rng.choice(lens, size=n_docs)
    for i in range(n_docs):
        toks = vocab_arr[rng.choice(len(vocab_arr), int(doc_lens[i]), p=zipf_p)]
        texts.append(" ".join(toks))
    # plant duplicates: 1% exact copies, 1% near copies (one token edit)
    n_dup = n_docs // 100
    src_ids = rng.choice(n_docs // 2, size=2 * n_dup, replace=False)
    for j in range(n_dup):
        texts[n_docs - 1 - j] = texts[int(src_ids[j])]
    for j in range(n_dup):
        words = texts[int(src_ids[n_dup + j])].split()
        if words:
            words[int(rng.integers(0, len(words)))] = "mutated"
        texts[n_docs - n_dup - 1 - j] = " ".join(words)
    ls_idx = rng.choice(len(ls_pairs), size=n_docs, p=ls_w)
    doc_tbl = pa.table(
        {
            "doc_id": pa.array(range(n_docs), type=pa.int64()),
            "text": pa.array(texts, type=pa.string()),
            "lang": pa.array([ls_pairs[i][0] for i in ls_idx], type=pa.string()),
            "source": pa.array([ls_pairs[i][1] for i in ls_idx], type=pa.string()),
            "n_chars": pa.array([len(t) for t in texts], type=pa.int64()),
        }
    )
    pq.write_table(doc_tbl, f"{OUT}/documents.parquet", row_group_size=8192)
    print(f"documents: {n_docs} rows ({2 * n_dup} planted dups)")

    # ---- embeddings: 10x unit vectors, planted near-duplicates -------
    dim = len(
        con.execute(
            f"SELECT embedding FROM read_parquet('{SRC}/embeddings.parquet') LIMIT 1"
        ).fetchone()[0]
    )
    n_emb_base = con.execute(
        f"SELECT count(*) FROM read_parquet('{SRC}/embeddings.parquet')"
    ).fetchone()[0]
    n_labels = con.execute(
        f"SELECT count(DISTINCT label) FROM read_parquet('{SRC}/embeddings.parquet')"
    ).fetchone()[0]
    n_emb = n_emb_base * R
    X = rng.standard_normal((n_emb, dim)).astype(np.float32)
    n_dup_e = n_emb // 100
    src_e = rng.choice(n_emb // 2, size=n_dup_e, replace=False)
    X[n_emb - n_dup_e :] = X[src_e] + 0.01 * rng.standard_normal(
        (n_dup_e, dim)
    ).astype(np.float32)
    X /= np.linalg.norm(X, axis=1, keepdims=True)
    emb_tbl = pa.table(
        {
            "vec_id": pa.array(range(n_emb), type=pa.int64()),
            "embedding": pa.array(
                [row for row in X.tolist()], type=pa.list_(pa.float32())
            ),
            "label": pa.array(
                rng.integers(0, n_labels, n_emb).tolist(), type=pa.int64()
            ),
        }
    )
    pq.write_table(emb_tbl, f"{OUT}/embeddings.parquet", row_group_size=8192)
    print(f"embeddings: {n_emb} rows dim {dim} ({n_dup_e} planted near-dups)")


if __name__ == "__main__":
    main()
