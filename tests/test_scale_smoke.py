"""Fast unit test of the ×N scale-dir builder (tools/scale_smoke.py):
the decorrelation transforms must preserve row shapes while keeping
replicas disjoint — the properties the smoke's candidate-growth
assertions silently depend on. Runs at sf0.001 with factor 3, pure
DuckDB (no Spark), ~1 s."""

from __future__ import annotations

import os
import shutil
import sys

import duckdb

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tools")
)

from scale_smoke import build_scale_dir  # noqa: E402

SF = "/root/testdata/sf0.001"


def test_scale_dir_replicas_are_shifted_and_decorrelated(tmp_path):
    out = str(tmp_path / "x3")
    built = build_scale_dir(SF, keep=True, cache_dir=out, factor=3)
    try:
        con = duckdb.connect()
        for t in ("documents", "embeddings", "orders", "lineitem"):
            (n0,) = con.execute(
                f"SELECT COUNT(*) FROM '{SF}/{t}.parquet'"
            ).fetchone()
            (n3,) = con.execute(
                f"SELECT COUNT(*) FROM '{built}/{t}.parquet/*.parquet'"
            ).fetchone()
            assert n3 == 3 * n0, t
        # keys stay unique after shifting
        for t, k in (("documents", "doc_id"), ("embeddings", "vec_id")):
            (dup,) = con.execute(
                f"SELECT COUNT(*) - COUNT(DISTINCT {k})"
                f" FROM '{built}/{t}.parquet/*.parquet'"
            ).fetchone()
            assert dup == 0, t
        # lineitem orderkeys must still resolve against shifted orders
        (orphans,) = con.execute(
            f"SELECT COUNT(*) FROM '{built}/lineitem.parquet/*.parquet' l"
            " WHERE NOT EXISTS (SELECT 1 FROM"
            f" '{built}/orders.parquet/*.parquet' o"
            " WHERE o.o_orderkey = l.l_orderkey)"
        ).fetchone()
        assert orphans == 0
        # embedding rotation preserves LENGTH and multiset of values
        rows = con.execute(
            f"SELECT len(embedding), list_sum(embedding)"
            f" FROM '{built}/embeddings.parquet/*.parquet'"
            " WHERE embedding IS NOT NULL LIMIT 10"
        ).fetchall()
        base = con.execute(
            f"SELECT DISTINCT len(embedding) FROM '{SF}/embeddings.parquet'"
            " WHERE embedding IS NOT NULL"
        ).fetchall()
        dims = {r[0] for r in base}
        assert all(r[0] in dims for r in rows)
        # replica texts are decorrelated: same doc across replicas 0/1
        # must differ (letter rotation), lengths preserved
        diff = con.execute(
            f"""
            WITH a AS (SELECT doc_id, text
                       FROM '{built}/documents.parquet/part-0.parquet'),
                 b AS (SELECT doc_id - (SELECT MAX(doc_id) + 1 FROM a)
                         AS doc_id, text
                       FROM '{built}/documents.parquet/part-1.parquet')
            SELECT SUM(CASE WHEN a.text = b.text THEN 1 ELSE 0 END),
                   SUM(CASE WHEN length(a.text) <> length(b.text)
                        THEN 1 ELSE 0 END)
            FROM a JOIN b USING (doc_id) WHERE a.text IS NOT NULL
            """
        ).fetchone()
        same_text, len_mismatch = diff
        assert same_text == 0  # rotation changed every text
        assert len_mismatch == 0  # but never its length
        con.close()
    finally:
        shutil.rmtree(out, ignore_errors=True)
