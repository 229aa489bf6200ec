"""S1-S3 — PubTator codec (fixture ingest only).

The reference's wire format (bern2/convert.py:9-86, serializer
:338-365): per doc, ``pmid|t|title`` / ``pmid|a|abstract`` lines plus
``pmid<TAB>start<TAB>end<TAB>mention<TAB>type<TAB>id`` entity lines,
blank-line separated. At runtime our engine reads columnar tables; this
codec exists so golden fixtures written in the reference format can be
ingested for parity tests (SURVEY §2.1 S1-S3)."""

from __future__ import annotations

from typing import Dict, List, Tuple

from pyspark.sql import DataFrame, SparkSession


def parse_pubtator(text: str) -> Tuple[List[dict], List[dict]]:
    """-> (docs, entities). docs: {pmid, title, abstract};
    entities: {pmid, start, end, mention, ent_type, id}."""
    docs, ents = [], []
    cur: Dict[str, str] = {}
    for line in text.split("\n"):
        if not line.strip():
            if cur:
                docs.append(cur)
                cur = {}
            continue
        parts = line.split("|", 2)
        if len(parts) == 3 and parts[1] in ("t", "a"):
            pmid, kind, payload = parts
            cur.setdefault("pmid", pmid)
            cur["title" if kind == "t" else "abstract"] = payload
            continue
        cols = line.split("\t")
        if len(cols) >= 5:
            ents.append({
                "pmid": cols[0], "start": int(cols[1]), "end": int(cols[2]),
                "mention": cols[3], "ent_type": cols[4],
                "id": cols[5] if len(cols) > 5 else "",
            })
    if cur:
        docs.append(cur)
    return docs, ents


def serialize_pubtator(docs: List[dict], ents: List[dict]) -> str:
    by_pmid: Dict[str, List[dict]] = {}
    for e in ents:
        by_pmid.setdefault(e["pmid"], []).append(e)
    blocks = []
    for d in docs:
        lines = [f"{d['pmid']}|t|{d.get('title', '')}",
                 f"{d['pmid']}|a|{d.get('abstract', '')}"]
        for e in sorted(by_pmid.get(d["pmid"], []),
                        key=lambda e: (e["start"], e["end"])):
            lines.append("\t".join([e["pmid"], str(e["start"]), str(e["end"]),
                                    e["mention"], e["ent_type"],
                                    e.get("id", "")]))
        blocks.append("\n".join(lines))
    return "\n\n".join(blocks) + "\n"


def read_pubtator(spark: SparkSession, path: str) -> DataFrame:
    """Whole-file read -> documents DataFrame in the engine's input
    shape (content = title + ' ' + abstract, multi_ner/ops.py:153)."""
    # pin the record separator: the default splits on bare \r too,
    # corrupting texts that carry the P4 '\r ' sequence
    raw = spark.read.option("lineSep", "\n").text(path).agg(
        {"value": "collect_list"}).first()[0]
    docs, _ = parse_pubtator("\n".join(raw))
    rows = [("pubtator", f"{d['pmid']}.txt", "0" * 40, "text",
             (d.get("title", "") + " " + d["abstract"]
              if d.get("abstract") else d.get("title", "")))
            for d in docs]
    from pyspark.sql import functions as F

    from bern2_spark.operators.preprocess import normalize_unicode_spaces
    df = spark.createDataFrame(
        rows, "repo string, path string, commit string, lang string, "
              "content string")
    # P4 — real PubTator corpora carry exotic unicode spaces; normalize
    # at ingest, BEFORE any offset exists (multi_ner/ops.py:383-430)
    return df.withColumn("content",
                         normalize_unicode_spaces(F.col("content")))
