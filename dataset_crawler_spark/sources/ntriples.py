"""N-Triples dump source (S8, SURVEY.md §2.1) → interleaved documents.

Twin of DatasetDumpCrawler.processDatasetFromDump's NxParser loop
(/root/reference/src/main/java/dataset_snapshots/DatasetDumpCrawler.java:66-127):
parse each triple, group by subject; ``rdf:type`` objects become type spans,
every other predicate becomes a value span — all as one distributed
groupBy-collect, replacing the reference's single-threaded per-line fold.

Span mapping (matches the engine's interleaved schema):
- kind      = 'rdf:type' for type triples, else the predicate URI
- text      = literal lexical form (quotes stripped), null for IRI objects
- media_ref = object IRI for IRI objects, null for literals
- offset    = triple order within the subject (ascending file position) —
  the twin of the reference's insertion-ordered ArrayList (Resource.java:12)

Line-order determinism, including MULTI-file dumps: the span sort key is
``(file_path, line_no)`` where ``line_no`` is ``monotonically_increasing_id``
— not a true line number, but provably file-order-preserving WITHIN one file
(splits of a file are packed into partitions in ascending byte order, and the
id is (partition << 33) + row-in-partition). Ordering by ``file_path`` first
removes the cross-file interleaving a bare id would allow when several files
land in one scan (files ingest in lexicographic path order), and because
offsets are re-based per document, the arbitrary id VALUES never surface —
only their order does, which is identical at any parallelism. No window, no
shuffle: the key rides along into the per-document fold.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"

# <s> <p> <o> .  |  <s> <p> "lit"(^^<dt>|@lang)? .
_TRIPLE_RE = r'^\s*<([^>]+)>\s+<([^>]+)>\s+(.*?)\s*\.\s*$'


def read_ntriples(spark: SparkSession, path: str) -> DataFrame:
    """Parse N-Triples file(s) → (file_path, line_no, subject, predicate,
    obj_iri, obj_lit). ``(file_path, line_no)`` is the deterministic triple
    order key (see module docstring); ``line_no`` is an opaque ordering id,
    not a literal line number."""
    raw = spark.read.text(path).select(
        F.col("_metadata.file_path").alias("file_path"),
        F.monotonically_increasing_id().alias("line_no"),
        "value",
    )
    s = F.regexp_extract("value", _TRIPLE_RE, 1)
    p = F.regexp_extract("value", _TRIPLE_RE, 2)
    o = F.regexp_extract("value", _TRIPLE_RE, 3)
    parsed = raw.select(
        "file_path", "line_no", s.alias("subject"), p.alias("predicate"), o.alias("obj")
    )
    parsed = parsed.where((F.length("subject") > 0) & (F.length("predicate") > 0))
    is_iri = F.col("obj").startswith("<") & F.col("obj").endswith(">")
    lit = F.regexp_extract("obj", r'^"(.*)"(?:\^\^<[^>]+>|@[A-Za-z-]+)?$', 1)
    return parsed.select(
        "file_path",
        "line_no",
        "subject",
        "predicate",
        F.when(is_iri, F.expr("substring(obj, 2, length(obj) - 2)")).alias("obj_iri"),
        F.when(~is_iri, lit).alias("obj_lit"),
    )


def dump_to_documents(spark: SparkSession, path: str) -> DataFrame:
    """N-Triples dump → interleaved documents (doc_id, spans)."""
    t = read_ntriples(spark, path)
    spans_src = t.select(
        F.col("subject").alias("doc_id"),
        "file_path",
        "line_no",
        F.when(F.col("predicate") == RDF_TYPE, F.lit("rdf:type"))
        .otherwise(F.col("predicate"))
        .alias("kind"),
        F.when(F.col("predicate") == RDF_TYPE, F.col("obj_iri"))
        .otherwise(F.col("obj_lit"))
        .alias("text"),
        F.when(F.col("predicate") != RDF_TYPE, F.col("obj_iri")).alias("media_ref"),
    )
    # lexicographic struct sort = (file_path, in-file order): multi-file dumps
    # get stable cross-file ordering with no window/shuffle
    collected = spans_src.groupBy("doc_id").agg(
        F.sort_array(
            F.collect_list(F.struct("file_path", "line_no", "kind", "text", "media_ref"))
        ).alias("_raw")
    )
    # offsets re-based per document in file order (A8 fold)
    spans = F.transform(
        F.col("_raw"),
        lambda x, i: F.struct(
            x["kind"].alias("kind"),
            x["text"].alias("text"),
            x["media_ref"].alias("media_ref"),
            i.cast("int").alias("offset"),
        ),
    )
    return collected.select("doc_id", spans.alias("spans"))
