"""Round-9b query/operator additions — WebDataset shards, HTML→Markdown,
MIME mail, multi-iteration k-means.

Same contract as queries.py / queries2.py: every entry pairs a Spark
implementation with a DuckDB oracle over the identical parquet tables;
aliases match on both sides; doubles rounded identically. Registered
into queries.QUERIES / queries.ORACLES at the bottom of queries.py.

Fixture-backed gates follow the r8 media pattern (queries.py
_doc_media_df): container bytes are authored per document from
md5(text) ONLY, pushed through the PRODUCTION parser, and the oracle
replays every derived value from DuckDB's md5() — so framing, payload
extraction and grouping are value-checked, not row-counted.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    from .queries import _t as real
    return real(spark, sf_dir, name)


# =====================================================================
# WebDataset / tar shards (sources/tar.py)
# =====================================================================

def webdataset_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WebDataset shard ingestion end-to-end: per document a gzipped
    tar shard is authored with the hand-rolled spec writer
    (sources/tar.tar_build — ustar header bytes, not stdlib) holding
    1-2 interleaved samples (``.txt`` always, ``.cap.json`` md5-gated,
    a LATER duplicate ``.txt`` member md5-gated for sample 0) plus a
    no-extension README sample, then decoded with the production
    streaming reader (tar_decode_file) and folded by
    ``webdataset_group``. Value-checked per sample: part count, the
    ext→payload map content (as sorted ``ext:md5`` signatures — so
    duplicate-ext LAST-WINS is hash-checked), total member bytes
    (duplicates included), and the sample's first archive position.
    One Arrow map stage + one sample-key shuffle."""
    from .sources.tar import tar_decode_file, webdataset_group, TAR_SCHEMA

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")

    def build_and_decode(batches):
        import hashlib as _hashlib

        import pandas as pd

        from .sources.tar import tar_build

        cols = [f.name for f in TAR_SCHEMA.fields]
        for pdf in batches:
            out = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                hx = _hashlib.md5((text or "").encode("utf-8")).hexdigest()
                b0, b1, b2 = (int(hx[0:2], 16), int(hx[2:4], 16),
                              int(hx[4:6], 16))
                n = b0 % 2 + 1
                keys = [f"k{i}-{hx[0:6]}" for i in range(n)]
                members = [(f"d/{keys[i]}.txt", f"T{i}-{hx[6:14]}".encode())
                           for i in range(n)]
                members += [(f"d/{keys[i]}.cap.json",
                             f"J{i}-{hx[14:20]}".encode())
                            for i in range(n) if (b1 >> i) & 1]
                if b2 & 1:
                    members.append((f"d/{keys[0]}.txt",
                                    f"T0b-{hx[20:26]}".encode()))
                members.append(("README", f"R-{hx[26:30]}".encode()))
                shard = tar_build(members, mtime=1600000000,
                                  gzip_compress=True)
                for rows in tar_decode_file(str(doc_id), shard):
                    out.extend(rows)
            yield pd.DataFrame(out, columns=cols)

    member_df = docs.mapInPandas(build_and_decode, schema=TAR_SCHEMA)
    g = webdataset_group(member_df)
    exts = F.array_sort(F.map_keys("parts"))
    sig = F.array_join(
        F.transform(exts, lambda e: F.concat(
            e, F.lit(":"), F.md5(F.element_at(F.col("parts"), e)))), "|")
    return g.select(
        F.col("path").cast("long").alias("doc_id"),
        "sample_key",
        F.col("n_parts").cast("long").alias("n_parts"),
        F.col("total_bytes").cast("long").alias("total_bytes"),
        F.col("first_member_idx").cast("long").alias("first_idx"),
        sig.alias("parts_sig"))


ORACLE_WEBDATASET = """
WITH h AS (
  SELECT doc_id, md5(text) AS hx,
         CAST(('0x' || substr(md5(text), 1, 2)) AS INT) AS b0,
         CAST(('0x' || substr(md5(text), 3, 2)) AS INT) AS b1,
         CAST(('0x' || substr(md5(text), 5, 2)) AS INT) AS b2
  FROM documents
), d AS (
  SELECT doc_id, hx, b0 % 2 + 1 AS n,
         b1 & 1 AS j0, (b1 >> 1) & 1 AS j1, b2 & 1 AS dup
  FROM h
), s0 AS (
  SELECT doc_id, 'd/k0-' || substr(hx, 1, 6) AS sample_key,
         CAST(1 + j0 AS BIGINT) AS n_parts,
         CAST(11 + j0 * 9 + dup * 10 AS BIGINT) AS total_bytes,
         CAST(0 AS BIGINT) AS first_idx,
         CASE WHEN j0 = 1
              THEN 'cap.json:' || md5('J0-' || substr(hx, 15, 6)) || '|'
              ELSE '' END
         || 'txt:' || CASE WHEN dup = 1
              THEN md5('T0b-' || substr(hx, 21, 6))
              ELSE md5('T0-' || substr(hx, 7, 8)) END AS parts_sig
  FROM d
), s1 AS (
  SELECT doc_id, 'd/k1-' || substr(hx, 1, 6) AS sample_key,
         CAST(1 + j1 AS BIGINT) AS n_parts,
         CAST(11 + j1 * 9 AS BIGINT) AS total_bytes,
         CAST(1 AS BIGINT) AS first_idx,
         CASE WHEN j1 = 1
              THEN 'cap.json:' || md5('J1-' || substr(hx, 15, 6)) || '|'
              ELSE '' END
         || 'txt:' || md5('T1-' || substr(hx, 7, 8)) AS parts_sig
  FROM d WHERE n = 2
), rm AS (
  SELECT doc_id, 'README' AS sample_key,
         CAST(1 AS BIGINT) AS n_parts,
         CAST(6 AS BIGINT) AS total_bytes,
         CAST(n + j0 + CASE WHEN n = 2 THEN j1 ELSE 0 END + dup
              AS BIGINT) AS first_idx,
         ':' || md5('R-' || substr(hx, 27, 4)) AS parts_sig
  FROM d
)
SELECT * FROM s0 UNION ALL SELECT * FROM s1 UNION ALL SELECT * FROM rm
"""


# =====================================================================
# HTML → Markdown (operators/markdown.py)
# =====================================================================

def html_markdown_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HTML→Markdown conversion end-to-end: per document a page is
    authored with an h2, a paragraph exercising every inline form
    (bold, italic, inline code, a link), an md5-chosen ul-or-ol list
    and an md5-gated fenced pre block, then ``html_to_markdown`` runs
    the production converter and the oracle replays the EXACT Markdown
    string (newlines and all) by concatenation. One Arrow map stage,
    no shuffle."""
    from .operators.markdown import html_to_markdown

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")

    def build_html(batches):
        import hashlib as _hashlib

        import pandas as pd

        for pdf in batches:
            out = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                h = _hashlib.md5((text or "").encode("utf-8")).hexdigest()
                b0 = int(h[0:2], 16)
                parts = [
                    f"<h2>H-{h[:6]}</h2>",
                    f'<p>P-{h[6:10]} <b>B-{h[10:14]}</b> '
                    f'<i>I-{h[14:18]}</i> <code>C-{h[18:22]}</code> '
                    f'<a href="/u/{h[22:26]}">L-{h[26:30]}</a>.</p>',
                ]
                tag = "ul" if b0 & 1 else "ol"
                parts.append(f"<{tag}><li>i1-{h[2:6]}</li>"
                             f"<li>i2-{h[4:8]}</li></{tag}>")
                if b0 & 2:
                    parts.append(f"<pre>code-{h[8:12]}</pre>")
                out.append((doc_id, "".join(parts)))
            yield pd.DataFrame(out, columns=["doc_id", "text"])

    pages = docs.mapInPandas(build_html, schema="doc_id long, text string")
    return html_to_markdown(pages).select("doc_id", "markdown", "n_chars")


ORACLE_HTML_MARKDOWN = """
WITH h AS (
  SELECT doc_id, md5(text) AS hx,
         CAST(('0x' || substr(md5(text), 1, 2)) AS INT) AS b0
  FROM documents
), m AS (
  SELECT doc_id,
         '## H-' || substr(hx, 1, 6) || chr(10) || chr(10)
         || 'P-' || substr(hx, 7, 4)
         || ' **B-' || substr(hx, 11, 4) || '**'
         || ' *I-' || substr(hx, 15, 4) || '*'
         || ' `C-' || substr(hx, 19, 4) || '`'
         || ' [L-' || substr(hx, 27, 4) || '](/u/' || substr(hx, 23, 4)
         || ').' || chr(10) || chr(10)
         || CASE WHEN b0 & 1 = 1
                 THEN '- i1-' || substr(hx, 3, 4) || chr(10)
                      || '- i2-' || substr(hx, 5, 4)
                 ELSE '1. i1-' || substr(hx, 3, 4) || chr(10)
                      || '2. i2-' || substr(hx, 5, 4) END
         || CASE WHEN b0 & 2 = 2
                 THEN chr(10) || chr(10) || '```' || chr(10)
                      || 'code-' || substr(hx, 9, 4) || chr(10) || '```'
                 ELSE '' END AS markdown
  FROM h
)
SELECT doc_id, markdown, CAST(length(markdown) AS INT) AS n_chars FROM m
"""


QUERIES3 = {
    "webdataset_report": webdataset_report,
    "html_markdown_report": html_markdown_report,
}

ORACLES3 = {
    "webdataset_report": ORACLE_WEBDATASET,
    "html_markdown_report": ORACLE_HTML_MARKDOWN,
}
