"""Deterministic scale-up of the driver's synthetic testdata.

Produces an sf1-shaped corpus (or any multiple) from the read-only
sf0.1 tables, so the full oracle gate and the bench suite can run at
10x the largest driver-provided scale. Broadcast thresholds, AQE
decisions, and the LSH guard constants can all flip with 10x data;
sf0.1 cannot see that (round-3 verdict, next-round item 4).

Design:

- Relational tables (customer/supplier/part/orders/lineitem/events)
  are replicated ``--copies`` times with CONSISTENT key shifts — copy c
  adds c * (max_key + 1) to every entity key and its foreign-key
  references, so join cardinalities and per-key event counts match the
  original shape exactly (10x rows AND 10x keys, the realistic
  scale-up). Non-key columns are carried verbatim; copy 0 IS the
  original bytes. region/nation are dimensions and stay as-is.
- documents/embeddings are NOT byte-replicated: appending a copy tag
  to every text would make each doc a 10-clone near-dup family and turn
  the dedup benchmarks degenerate. Copy 0 keeps the originals (with
  their planted duplicate structure); copies >0 are synthesized from
  the ORIGINAL corpus distributions (unigram word frequencies, doc
  length quantiles, lang/source/label marginals) with a matching
  planted exact-duplicate rate, seeded per copy — bit-deterministic.

Everything is driven by numpy RandomState / DuckDB, no wall-clock or
nondeterministic ordering anywhere: two runs produce identical files.

Usage: python tools/gen_testdata.py --src /root/testdata/sf0.1 \
    --out /tmp/testdata/sf1 [--copies 10]
"""

from __future__ import annotations

import argparse
import os

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

# entity key -> (table, fk references in other tables)
KEY_SHIFTS = {
    "customer": {"c_custkey": "customer"},
    "supplier": {"s_suppkey": "supplier"},
    "part": {"p_partkey": "part"},
    "orders": {"o_orderkey": "orders", "o_custkey": "customer"},
    "lineitem": {"l_orderkey": "orders", "l_partkey": "part",
                 "l_suppkey": "supplier"},
    "events": {"event_id": "events", "user_id": "users"},
}
COPY_AS_IS = ["region", "nation"]
PLANTED_DUP_RATE = 0.15  # matches the original corpus' exact-dup rate


def _domain_sizes(con, src: str) -> dict[str, int]:
    """max_key + 1 per shifted domain (the per-copy stride)."""
    q = {
        "customer": "SELECT max(c_custkey) FROM customer",
        "supplier": "SELECT max(s_suppkey) FROM supplier",
        "part": "SELECT max(p_partkey) FROM part",
        "orders": "SELECT max(o_orderkey) FROM orders",
        "events": "SELECT max(event_id) FROM events",
        "users": "SELECT max(user_id) FROM events",
    }
    return {k: con.sql(v).fetchone()[0] + 1 for k, v in q.items()}


def _replicate_relational(con, src: str, out: str, copies: int) -> None:
    strides = _domain_sizes(con, src)
    for table, shifts in KEY_SHIFTS.items():
        cols = [r[0] for r in con.sql(f"DESCRIBE {table}").fetchall()]
        sel = ", ".join(
            f"{c} + c.copy * {strides[shifts[c]]} AS {c}" if c in shifts else c
            for c in cols
        )
        con.sql(
            f"COPY (SELECT {sel} FROM {table}, "
            f"(SELECT unnest(range({copies})) AS copy) c "
            f"ORDER BY c.copy, {cols[0]}) "
            f"TO '{out}/{table}.parquet' (FORMAT parquet)"
        )
    for table in COPY_AS_IS:
        con.sql(f"COPY (SELECT * FROM {table}) "
                f"TO '{out}/{table}.parquet' (FORMAT parquet)")


def _synth_documents(con, out: str, copies: int) -> None:
    docs = con.sql(
        "SELECT doc_id, text, lang, source, n_chars FROM documents "
        "ORDER BY doc_id"
    ).fetchall()
    n = len(docs)
    # empirical distributions from the original corpus
    tokens = [w for _, t, _, _, _ in docs for w in t.split()]
    token_arr = np.array(tokens)
    lens = np.array([len(t.split()) for _, t, _, _, _ in docs])
    langs = np.array([r[2] for r in docs])
    sources = np.array([r[3] for r in docs])

    all_rows = list(docs)  # copy 0 verbatim (keeps planted structure)
    for c in range(1, copies):
        rng = np.random.RandomState(42_000 + c)
        doc_lens = rng.choice(lens, size=n)
        new_texts: list[str] = []
        for i in range(n):
            if i > 0 and rng.rand() < PLANTED_DUP_RATE:
                new_texts.append(new_texts[rng.randint(0, i)])
            else:
                words = rng.choice(token_arr, size=int(doc_lens[i]))
                new_texts.append(" ".join(words.tolist()))
        clangs = rng.choice(langs, size=n)
        csources = rng.choice(sources, size=n)
        for i, t in enumerate(new_texts):
            all_rows.append((c * n + i, t, str(clangs[i]), str(csources[i]),
                             len(t)))

    tbl = pa.table({
        "doc_id": pa.array([r[0] for r in all_rows], pa.int64()),
        "text": pa.array([r[1] for r in all_rows], pa.string()),
        "lang": pa.array([r[2] for r in all_rows], pa.string()),
        "source": pa.array([r[3] for r in all_rows], pa.string()),
        "n_chars": pa.array([r[4] for r in all_rows], pa.int64()),
    })
    pq.write_table(tbl, f"{out}/documents.parquet")


def _synth_embeddings(con, out: str, copies: int) -> None:
    rows = con.sql(
        "SELECT vec_id, embedding, label FROM embeddings ORDER BY vec_id"
    ).fetchall()
    n = len(rows)
    dim = len(rows[0][1])
    labels = np.array([r[2] for r in rows])

    ids = [r[0] for r in rows]
    vecs = [r[1] for r in rows]
    labs = [r[2] for r in rows]
    for c in range(1, copies):
        rng = np.random.RandomState(52_000 + c)
        m = rng.standard_normal((n, dim)).astype(np.float32)
        m /= np.linalg.norm(m, axis=1, keepdims=True)
        for i in range(n):
            if i > 0 and rng.rand() < PLANTED_DUP_RATE:
                j = rng.randint(0, i)
                # EXACT copy, matching the driver corpus' planted-dup
                # structure. A perturbed near-dup (cosine ~0.997) would
                # break the oracle contract the embedding-dedup gate
                # queries rely on: at threshold 0.99 every qualifying
                # pair must be an exact copy, where RP-LSH recall is
                # provably 1.0 (identical vectors collide in every
                # table). Non-copy random pairs in this dim are far
                # below 0.99 cosine.
                m[i] = m[j]
        clabels = rng.choice(labels, size=n)
        ids.extend(c * n + i for i in range(n))
        vecs.extend(m[i].tolist() for i in range(n))
        labs.extend(int(x) for x in clabels)

    tbl = pa.table({
        "vec_id": pa.array(ids, pa.int64()),
        "embedding": pa.array(vecs, pa.list_(pa.float32())),
        "label": pa.array(labs, pa.int32()),
    })
    pq.write_table(tbl, f"{out}/embeddings.parquet")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default="/tmp/testdata/sf1")
    ap.add_argument("--copies", type=int, default=10)
    args = ap.parse_args()

    os.makedirs(args.out, exist_ok=True)
    con = duckdb.connect()
    for t in list(KEY_SHIFTS) + COPY_AS_IS + ["documents", "embeddings"]:
        con.sql(f"CREATE VIEW {t} AS "
                f"SELECT * FROM read_parquet('{args.src}/{t}.parquet')")

    _replicate_relational(con, args.src, args.out, args.copies)
    _synth_documents(con, args.out, args.copies)
    _synth_embeddings(con, args.out, args.copies)
    for t in sorted(os.listdir(args.out)):
        sz = os.path.getsize(os.path.join(args.out, t))
        print(f"{t}: {sz / 1e6:.1f} MB")


if __name__ == "__main__":
    main()
