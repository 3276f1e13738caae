"""Record-format corpus sources: JSONL and CSV → the ``documents``
shape.

JSONL (one JSON object per line) is the de-facto wire format for LLM
training corpora (The Pile, RedPajama, Dolma, FineWeb all ship it);
CSV is what everything tabular exports.  Both land in the same
``(doc_id, text, source, ...)`` shape the text pipeline consumes.

Schema discipline, the 100 TB rule: the schema is REQUIRED unless you
opt into inference.  ``spark.read.json``/``csv`` without a schema runs
a FULL EXTRA PASS over the data just to infer one — a silent 2× read
at any scale, and a correctness hazard besides (a column that looks
integer for the first terabyte and goes alphanumeric in the second
fails mid-job).  ``infer=True`` exists for exploration and says what it
costs.

Ids follow the text-source convention: ``doc_id`` hashes the record's
natural key if the caller names one (stable across re-reads and
re-partitioning), else (file, line-content, occurrence) exactly as
``load_text_corpus(whole_files=False)`` — repeated records stay
distinct documents for the dedup operators to find.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def _with_doc_id(df: DataFrame, id_field: str | None) -> DataFrame:
    """Mint ``doc_id``.  With a natural key: hash it (shuffle-free).

    Without one, duplicate (source, text) records need an occurrence
    number so they stay distinct documents.  The window partitions on
    ``xxhash64(text)`` — a FIXED-WIDTH key — never on the raw text: at
    corpus scale the full document body must not become a shuffle/sort
    key (ADVICE r6; same hash-at-the-scan rule as the dedup family).
    Caveat (documented, inherent to synthetic ids): when extra schema
    fields differ between identical-(source, text) rows, which physical
    row receives which occurrence number is not deterministic under
    task retries — the documents themselves are interchangeable for
    every text operator, but side-field↔occ pairing is not pinned.
    Callers that care pass ``id_field``."""
    if id_field is not None:
        return df.withColumn("doc_id", F.xxhash64(F.col(id_field)))
    w = Window.partitionBy("source", F.xxhash64("text")).orderBy(
        F.monotonically_increasing_id()
    )
    return (
        df.withColumn("__occ", F.row_number().over(w))
        .withColumn("doc_id", F.xxhash64("source", "text", "__occ"))
        .drop("__occ")
    )


def _project_corpus(df: DataFrame, text_field: str,
                    id_field: str | None) -> DataFrame:
    """(raw reader output) → ``(doc_id, text, source, <rest>)``; batch
    and streaming share this exactly, so a landed stream is row-identical
    to a batch read of the same files."""
    df = df.withColumn("source", F.input_file_name())
    if text_field != "text":
        df = df.withColumnRenamed(text_field, "text")
    out = _with_doc_id(df, id_field)
    front = ["doc_id", "text", "source"]
    rest = [c for c in out.columns if c not in front]
    return out.select(*front, *rest)


def load_jsonl_corpus(spark: SparkSession, path: str, schema: str | None,
                      text_field: str = "text",
                      id_field: str | None = None,
                      infer: bool = False) -> DataFrame:
    """``(doc_id, text, source, <other schema fields>)`` from JSONL.

    ``schema`` is a DDL string (``"text string, url string, lang
    string"``); pass ``infer=True`` instead ONLY for exploration — it
    reads the data twice.  Corrupt lines land in Spark's permissive-mode
    null rows rather than failing the job; filter on ``text IS NOT
    NULL`` downstream if the feed is dirty."""
    if schema is None and not infer:
        raise ValueError(
            "load_jsonl_corpus requires a DDL schema (or infer=True, "
            "which costs a full extra pass over the data)"
        )
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return _project_corpus(reader.json(path), text_field, id_field)


def load_csv_corpus(spark: SparkSession, path: str, schema: str | None,
                    text_field: str = "text",
                    id_field: str | None = None,
                    header: bool = True, sep: str = ",",
                    infer: bool = False,
                    options: dict | None = None) -> DataFrame:
    """CSV analog of :func:`load_jsonl_corpus` — same schema-first rule,
    same id convention, same output shape.

    CSV wire caveats (Spark reader defaults): an empty field reads back
    as NULL, and embedded newlines split records unless the source sets
    ``multiLine`` — pass ``options={"multiLine": "true"}`` (slower: no
    intra-file split) or ``{"nullValue": ...}`` through ``options`` when
    the feed needs them.  JSONL has neither limitation; prefer it for
    free-text corpora."""
    if schema is None and not infer:
        raise ValueError(
            "load_csv_corpus requires a DDL schema (or infer=True, "
            "which costs a full extra pass over the data)"
        )
    reader = spark.read.options(header=str(header).lower(), sep=sep)
    if options:
        reader = reader.options(**options)
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", "true")
    return _project_corpus(reader.csv(path), text_field, id_field)


def load_jsonl_corpus_stream(spark: SparkSession, path: str, schema: str,
                             text_field: str = "text",
                             id_field: str | None = None,
                             max_files_per_trigger: int = 100) -> DataFrame:
    """Streaming form of :func:`load_jsonl_corpus` — a landing zone of
    JSONL files becomes a micro-batched stream of the same
    ``(doc_id, text, source, ...)`` rows (the projection is shared code,
    so the landed stream is row-identical to a batch read).  Pair with
    ``streaming.ingest.stream_into_store_neardup`` for the production
    LLM-corpus ingest shape: JSONL drops in, near-dup-filtered documents
    land.

    The schema is REQUIRED (Structured Streaming cannot infer), and so is
    ``id_field``: the batch reader's no-key fallback numbers duplicate
    occurrences with a window, which has no streaming equivalent — a
    corpus fed through a stream must carry a natural key."""
    if id_field is None:
        raise ValueError(
            "load_jsonl_corpus_stream requires id_field: the batch "
            "reader's duplicate-occurrence window is not expressible "
            "over a stream"
        )
    reader = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
    )
    return _project_corpus(reader.json(path), text_field, id_field)


def load_csv_corpus_stream(spark: SparkSession, path: str, schema: str,
                           text_field: str = "text",
                           id_field: str | None = None,
                           header: bool = True, sep: str = ",",
                           max_files_per_trigger: int = 100) -> DataFrame:
    """CSV analog of :func:`load_jsonl_corpus_stream` — same required
    schema and natural key, same shared projection."""
    if id_field is None:
        raise ValueError(
            "load_csv_corpus_stream requires id_field: the batch "
            "reader's duplicate-occurrence window is not expressible "
            "over a stream"
        )
    reader = (
        spark.readStream.schema(schema)
        .options(header=str(header).lower(), sep=sep)
        .option("maxFilesPerTrigger", max_files_per_trigger)
    )
    return _project_corpus(reader.csv(path), text_field, id_field)
