#!/usr/bin/env python
"""Deterministic ~sf1-equivalent documents+embeddings corpus for the
two-decade scaling probe (r5 verdict item 7).

Expansion is CONTENT-DERIVED — no RNG anywhere — so the corpus is
byte-reproducible from the driver's sf0.1 testdata:

- documents: 10x. Replica k (1..9) of a document keeps doc_id + N*k and
  mutates every token whose (md5-hash + k) is even to ``token~k``.  This
  preserves the ORIGINAL near-dup structure within each slice (two similar
  docs mutate identically, so their replicas stay similar) while keeping
  cross-slice Jaccard ~0.33 — i.e. the corpus really is 10x the data with
  ~10x the true near-dup pairs, not a 100x pair explosion.
- embeddings: 10x. Replica k of a vector keeps vec_id + N*k, same label,
  and each component perturbed by a +-0.05 md5-derived offset — replicas
  are realistic strong neighbors inside the original cluster geometry.

Output dir (default /root/repo/.scaling_sf1) is derived data: gitignored,
regenerated whenever the source fingerprint changes (the driver refreshes
sf0.1 between rounds).
"""

from __future__ import annotations

import json
import os
import sys

import duckdb

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DEFAULT_SRC = "/root/testdata/sf0.1"
DEFAULT_OUT = os.path.join(REPO, ".scaling_sf1")


def _fingerprint(src: str) -> dict:
    out = {}
    for t in ("documents", "embeddings"):
        p = os.path.join(src, f"{t}.parquet")
        st = os.stat(p)
        out[t] = [st.st_size, int(st.st_mtime)]
    return out


def generate(src: str = DEFAULT_SRC, out_dir: str = DEFAULT_OUT) -> str:
    marker = os.path.join(out_dir, "SOURCE.json")
    fp = _fingerprint(src)
    if os.path.exists(marker):
        try:
            with open(marker) as f:
                if json.load(f) == fp:
                    return out_dir  # fresh
        except Exception:
            pass
    os.makedirs(out_dir, exist_ok=True)
    con = duckdb.connect()
    docs = os.path.join(src, "documents.parquet")
    n_docs = con.sql(f"SELECT count(*) FROM read_parquet('{docs}')").fetchone()[0]
    con.execute(
        f"""
        COPY (
          SELECT doc_id, text, lang, source, n_chars
          FROM read_parquet('{docs}')
          UNION ALL
          SELECT doc_id, text, lang, source,
                 CAST(strlen(text) AS BIGINT) AS n_chars
          FROM (
            SELECT d.doc_id + {n_docs} * t.k AS doc_id,
                   array_to_string(list_transform(
                     string_split_regex(d.text, '\\s+'), w ->
                     CASE WHEN (CAST(('0x' || substr(md5(w), 1, 8)) AS BIGINT)
                                + t.k) % 2 = 0
                          THEN w || '~' || CAST(t.k AS VARCHAR) ELSE w END),
                     ' ') AS text,
                   d.lang, d.source
            FROM read_parquet('{docs}') d CROSS JOIN range(1, 10) t(k))
          ORDER BY doc_id
        ) TO '{os.path.join(out_dir, "documents.parquet")}' (FORMAT PARQUET)
        """
    )
    emb = os.path.join(src, "embeddings.parquet")
    n_vec = con.sql(f"SELECT count(*) FROM read_parquet('{emb}')").fetchone()[0]
    con.execute(
        f"""
        COPY (
          SELECT vec_id, embedding, label FROM read_parquet('{emb}')
          UNION ALL
          SELECT e.vec_id + {n_vec} * t.k AS vec_id,
                 list_transform(range(1, len(e.embedding) + 1), i ->
                   CAST(e.embedding[i]
                        + 0.1 * ((CAST(('0x' || substr(md5(
                            CAST(e.vec_id AS VARCHAR) || ':' ||
                            CAST(t.k AS VARCHAR) || ':' ||
                            CAST(i AS VARCHAR)), 1, 8)) AS BIGINT) % 1000)
                          / 1000.0 - 0.5) AS FLOAT)) AS embedding,
                 e.label
          FROM read_parquet('{emb}') e CROSS JOIN range(1, 10) t(k)
          ORDER BY vec_id
        ) TO '{os.path.join(out_dir, "embeddings.parquet")}' (FORMAT PARQUET)
        """
    )
    with open(marker, "w") as f:
        json.dump(fp, f)
    return out_dir


if __name__ == "__main__":
    src = sys.argv[1] if len(sys.argv) > 1 else DEFAULT_SRC
    out = sys.argv[2] if len(sys.argv) > 2 else DEFAULT_OUT
    d = generate(src, out)
    con = duckdb.connect()
    for t in ("documents", "embeddings"):
        n = con.sql(
            f"SELECT count(*) FROM read_parquet('{os.path.join(d, t)}.parquet')"
        ).fetchone()[0]
        print(f"{t}: {n} rows -> {d}")
