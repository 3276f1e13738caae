"""Source/format tests: SQLite compat bridge, multi-format round-trips,
SQL UDF surface."""

from __future__ import annotations

import sqlite3

import numpy as np
import pytest
from pyspark.sql import functions as F

from vector_db_at_home_spark.functions.register import (
    register_sql_functions,
    sql_macro,
)
from vector_db_at_home_spark.schema import VECTOR_SCHEMA
from vector_db_at_home_spark.sources.formats import read_store, write_store
from vector_db_at_home_spark.sources.sqlite_compat import (
    blob_to_vec,
    export_sqlite,
    import_sqlite,
    vec_to_blob,
)

DIM = 6


def make_store_df(spark, n=5):
    rows = [
        (i, [float(i) + j * 0.5 for j in range(DIM)], '{"k%d": "v%d"}' % (i, i))
        for i in range(n)
    ]
    return spark.createDataFrame(rows, VECTOR_SCHEMA)


def test_blob_codec_roundtrip():
    vec = [1.5, -2.25, 0.0, 3.75]
    blob = vec_to_blob(vec)
    assert len(blob) == 4 * 4  # float32 little-endian, dim*4 bytes
    assert blob_to_vec(blob) == vec


def test_blob_codec_matches_reference_layout():
    # the reference stores raw little-endian float32; byte-level check
    blob = vec_to_blob([1.0])
    assert blob == b"\x00\x00\x80\x3f"


def test_sqlite_roundtrip(spark, tmp_path):
    db = str(tmp_path / "store.sqlite3")
    df = make_store_df(spark)
    n = export_sqlite(df, db)
    assert n == 5
    # file is readable by plain sqlite3 in the reference's schema
    con = sqlite3.connect(db)
    rows = con.execute("SELECT id, vec, doc FROM vector ORDER BY id").fetchall()
    con.close()
    assert len(rows) == 5
    assert np.frombuffer(rows[2][1], dtype="<f4").shape == (DIM,)
    back = import_sqlite(spark, db, expected_dim=DIM)
    orig = sorted(df.collect(), key=lambda r: r.id)
    got = sorted(back.collect(), key=lambda r: r.id)
    assert [(r.id, r.vec, r.doc) for r in orig] == [(r.id, r.vec, r.doc) for r in got]


def test_sqlite_null_doc_becomes_empty_json(spark, tmp_path):
    db = str(tmp_path / "nulldoc.sqlite3")
    con = sqlite3.connect(db)
    con.execute("CREATE TABLE vector (id INTEGER PRIMARY KEY, vec BLOB NOT NULL, doc TEXT)")
    con.execute("INSERT INTO vector VALUES (0, ?, NULL)", (vec_to_blob([1.0] * DIM),))
    con.commit()
    con.close()
    df = import_sqlite(spark, db)
    assert df.first().doc == "{}"


def test_sqlite_dim_mismatch_raises(spark, tmp_path):
    db = str(tmp_path / "baddim.sqlite3")
    export_sqlite(make_store_df(spark), db)
    with pytest.raises(ValueError, match="dim"):
        import_sqlite(spark, db, expected_dim=DIM + 1)


@pytest.mark.parametrize("fmt", ["parquet", "orc", "json", "csv"])
def test_format_roundtrip(spark, tmp_path, fmt):
    df = make_store_df(spark)
    path = str(tmp_path / f"store_{fmt}")
    write_store(df, path, fmt)
    back = read_store(spark, path, fmt)
    orig = sorted([(r.id, r.vec, r.doc) for r in df.collect()])
    got = sorted([(r.id, r.vec, r.doc) for r in back.collect()])
    assert orig == got
    assert back.schema["vec"].dataType.simpleString() == "array<float>"


def test_sql_udf_surface(spark):
    register_sql_functions(spark)
    r = spark.sql(
        """SELECT indel_ratio('{"1": "1"}', '{"k1": "v1"}') AS sim,
                  indel_distance('v4', '{"k4": "v4"}') AS dist"""
    ).first()
    assert r.sim == pytest.approx(100 * 20 / 22, abs=1e-9)
    assert r.dist == pytest.approx(100 * 10 / 14, abs=1e-9)


def test_sql_udaf_geomean(spark):
    """The UDAF third of UDF/UDAF/UDTF: Arrow grouped-agg pandas UDF used
    from SQL GROUP BY, verified against exp(avg(ln(x)))."""
    import math

    register_sql_functions(spark)
    df = spark.createDataFrame(
        [("a", 2.0), ("a", 8.0), ("a", -1.0), ("b", 5.0)],
        "grp string, v double",
    )
    df.createOrReplaceTempView("udaf_test")
    rows = {
        r.grp: r.gm
        for r in spark.sql(
            "SELECT grp, geomean(v) AS gm FROM udaf_test GROUP BY grp"
        ).collect()
    }
    assert rows["a"] == pytest.approx(math.sqrt(2.0 * 8.0), abs=1e-9)
    assert rows["b"] == pytest.approx(5.0, abs=1e-9)


def test_sql_macros(spark):
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    emb.createOrReplaceTempView("emb_macro_test")
    expr = sql_macro("l2_distance", a="a.embedding", b="b.embedding")
    r = spark.sql(
        f"""SELECT {expr} AS d
            FROM emb_macro_test a JOIN emb_macro_test b
            ON a.vec_id = 0 AND b.vec_id = 0"""
    ).first()
    assert r.d == 0.0
    fp_expr = sql_macro("rolling_fingerprint", s="'abc'")
    fp = spark.sql(f"SELECT {fp_expr} AS fp").first().fp
    # ((0*31+97)*31+98)*31+99 mod 1e9+7
    assert fp == ((97 * 31 + 98) * 31 + 99) % 1_000_000_007


def test_load_media_dir_classifies_and_decodes(spark, tmp_path):
    """binaryFile media source: real PNG/WAV/y4m files on disk land as
    MEDIA_SCHEMA rows classified by MAGIC BYTES (not extension — one file
    is deliberately mis-extensioned), image dims parsed from the header,
    and every payload decodes through the real decoders."""
    from vector_db_at_home_spark.operators.multimodal import (
        _png_bytes,
        _wav_bytes,
        _y4m_bytes,
        decode_image_gray,
        decode_wav,
        decode_y4m_gray,
    )
    from vector_db_at_home_spark.sources.mediafiles import load_media_dir

    d = tmp_path / "media"
    d.mkdir()
    (d / "a.png").write_bytes(_png_bytes(bytes(range(48)), width=8))
    (d / "b.wav").write_bytes(_wav_bytes(bytes(range(100))))
    (d / "c.y4m").write_bytes(_y4m_bytes(bytes(range(64)) * 2, 4, 8))
    # magic bytes must win over the lying extension
    (d / "lies.txt").write_bytes(_png_bytes(bytes(range(24)), width=6))
    (d / "junk.bin").write_bytes(b"\x00\x01\x02 not a container")

    media = load_media_dir(spark, str(d))
    rows = {r.source_path.rsplit("/", 1)[-1]: r for r in media.collect()}
    assert rows["a.png"].modality == "image"
    assert rows["a.png"].meta.width == 8 and rows["a.png"].meta.height == 6
    assert rows["lies.txt"].modality == "image"       # magic bytes won
    assert rows["b.wav"].modality == "audio"
    assert rows["c.y4m"].modality == "video"
    assert rows["junk.bin"].modality == "unknown"
    assert len({r.media_id for r in rows.values()}) == 5  # stable distinct

    w, h, px = decode_image_gray(bytes(rows["a.png"].payload))
    assert (w, h, len(px)) == (8, 6, 48)
    _sr, n, _s = decode_wav(bytes(rows["b.wav"].payload))
    assert n == 100
    fw, fh, frames = decode_y4m_gray(bytes(rows["c.y4m"].payload))
    assert (fw, fh, len(frames)) == (4, 8, 4)

    # glob pushdown: only the wav
    only_wav = load_media_dir(spark, str(d), glob="*.wav").collect()
    assert [r.modality for r in only_wav] == ["audio"]


def test_load_text_corpus_whole_files_and_lines(spark, tmp_path):
    from vector_db_at_home_spark.sources.textfiles import load_text_corpus

    d = tmp_path / "corpus"
    d.mkdir()
    (d / "x.txt").write_text("alpha beta\ngamma delta")
    (d / "y.txt").write_text("gamma delta")

    whole = load_text_corpus(spark, str(d), whole_files=True).collect()
    assert len(whole) == 2
    assert {r.text for r in whole} == {"alpha beta\ngamma delta",
                                       "gamma delta"}
    assert len({r.doc_id for r in whole}) == 2

    lines = load_text_corpus(spark, str(d), whole_files=False).collect()
    assert len(lines) == 3
    # duplicate line across files stays two distinct documents
    assert sum(1 for r in lines if r.text == "gamma delta") == 2
    assert len({r.doc_id for r in lines}) == 3


def test_load_text_corpus_glob_filter(spark, tmp_path):
    from vector_db_at_home_spark.sources.textfiles import load_text_corpus

    d = tmp_path / "corpus_g"
    d.mkdir()
    (d / "keep.txt").write_text("kept words")
    (d / "skip.log").write_text("skipped words")
    got = load_text_corpus(spark, str(d), whole_files=True,
                           glob="*.txt").collect()
    assert [r.text for r in got] == ["kept words"]


def test_text_connector_feeds_dedup_pipeline(spark, tmp_path):
    """Front door to pipeline: raw text FILES loaded per-file flow through
    exact dedup (digest), MinHash near-dup removal (keep-one via connected
    components) and token stats — validating that the connector's
    xxhash64 doc ids (including negative longs) compose with every keyed
    operator downstream."""
    from pyspark.sql import functions as F

    from vector_db_at_home_spark.operators.dedup import (
        exact_dedup,
        minhash_lsh_pairs,
    )
    from vector_db_at_home_spark.operators.graph import drop_near_duplicates
    from vector_db_at_home_spark.operators.textstats import token_stats
    from vector_db_at_home_spark.sources.textfiles import load_text_corpus

    base = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
            "lambda mu nu xi omicron pi rho sigma tau upsilon")
    d = tmp_path / "raw_corpus"
    d.mkdir()
    (d / "a.txt").write_text(base)
    (d / "a_copy.txt").write_text(base)                     # exact dup
    (d / "a_near.txt").write_text(base.replace("gamma", "zzz"))  # near dup
    b_text = (
        "one two three four five six seven eight nine ten eleven twelve "
        "thirteen fourteen fifteen sixteen seventeen eighteen nineteen"
    )
    (d / "b.txt").write_text(b_text)
    # doc ids are xxhash64 over the (tmp-random) path: with only 4 files
    # all four hashes land non-negative once in 16 runs, flaking the
    # negative-id assertion.  16 exact copies of b (collapsed by exact
    # dedup, so every downstream count is unchanged) push that to 2^-20.
    for j in range(16):
        (d / f"b_copy_{j}.txt").write_text(b_text)

    docs = load_text_corpus(spark, str(d), whole_files=True)
    assert docs.filter(F.col("doc_id") < 0).count() > 0   # negative ids real

    canon = exact_dedup(docs, "text", "doc_id")
    exact_kept = docs.join(
        canon.filter(F.col("id") == F.col("canonical_id"))
        .select(F.col("id").alias("doc_id")),
        "doc_id",
    )
    assert exact_kept.count() == 3                         # copy collapsed

    pairs = minhash_lsh_pairs(exact_kept, "text", "doc_id", threshold=0.5)
    kept = drop_near_duplicates(exact_kept, pairs, "doc_id")
    texts = sorted(r.text for r in kept.collect())
    assert len(texts) == 2                                 # near dup dropped
    assert any(t.startswith("one two") for t in texts)
    assert sum(1 for t in texts if "alpha beta" in t) == 1

    stats = token_stats(kept, "text", "doc_id").collect()
    assert all(r.n_tokens >= 19 for r in stats)


def test_load_media_stream_lands_classified_rows(spark, tmp_path):
    """Streaming media landing zone: files arriving in a directory stream
    through the shared magic-byte projection into a parquet media table
    identical to a batch read of the same files."""
    from vector_db_at_home_spark.operators.multimodal import (
        _png_bytes,
        _wav_bytes,
    )
    from vector_db_at_home_spark.sources.mediafiles import (
        load_media_dir,
        load_media_stream,
    )

    d = tmp_path / "land_media"
    d.mkdir()
    (d / "p.png").write_bytes(_png_bytes(bytes(range(32)), width=8))
    (d / "s.wav").write_bytes(_wav_bytes(bytes(range(50))))

    out = str(tmp_path / "media_out")
    q = (
        load_media_stream(spark, str(d), max_files_per_trigger=1)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "media_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    landed = {
        (r.media_id, r.modality, r.meta.width, bytes(r.payload))
        for r in spark.read.parquet(out).collect()
    }
    batch = {
        (r.media_id, r.modality, r.meta.width, bytes(r.payload))
        for r in load_media_dir(spark, str(d)).collect()
    }
    assert landed == batch
    assert {m for _i, m, _w, _p in landed} == {"image", "audio"}


def test_load_media_dir_header_only_metadata(spark, tmp_path):
    """Round-6: audio/video rows carry header-only metadata (WAV fmt/fact
    chunk walk, y4m header + length arithmetic) that matches what a full
    decode would report — without the source reading any payload bytes."""
    from vector_db_at_home_spark.operators.multimodal import (
        _adpcm_wav_bytes,
        _g711_wav_bytes,
        _wav_bytes,
        _y4m_bytes,
        decode_wav,
        decode_y4m_gray,
    )
    from vector_db_at_home_spark.sources.mediafiles import load_media_dir

    d = tmp_path / "media_hdr"
    d.mkdir()
    pcm = _wav_bytes(bytes(range(200)), sample_rate=8000)
    adp = _adpcm_wav_bytes(b"\x00\x01" * 500, sample_rate=16000)
    g711 = _g711_wav_bytes(b"\x00\x10" * 300, "alaw", sample_rate=8000)
    y4m = _y4m_bytes(bytes(range(240)), 10, 6)
    (d / "a.wav").write_bytes(pcm)
    (d / "b.wav").write_bytes(adp)
    (d / "c.wav").write_bytes(g711)
    (d / "v.y4m").write_bytes(y4m)

    rows = {r.source_path.rsplit("/", 1)[-1]: r
            for r in load_media_dir(spark, str(d)).collect()}
    for name, blob in [("a.wav", pcm), ("b.wav", adp), ("c.wav", g711)]:
        sr, n, _ = decode_wav(blob)
        r = rows[name]
        assert r.sample_rate == sr
        assert r.meta.duration_ms == int(n * 1000 / sr + 0.5)
    w, h, frames = decode_y4m_gray(y4m)
    rv = rows["v.y4m"]
    assert (rv.meta.width, rv.meta.height) == (w, h)
    assert rv.n_frames == len(frames)
    assert rv.meta.duration_ms == int(len(frames) * 1000 / 25 + 0.5)
    # images keep zero audio/video fields
    from vector_db_at_home_spark.operators.multimodal import _png_bytes

    (d / "i.png").write_bytes(_png_bytes(bytes(range(30)), 6))
    rows2 = {r.source_path.rsplit("/", 1)[-1]: r
             for r in load_media_dir(spark, str(d)).collect()}
    ri = rows2["i.png"]
    assert ri.sample_rate == 0 and ri.n_frames == 0
    assert ri.meta.width == 6 and ri.meta.duration_ms == 0


def test_zorder_write_prunes_on_every_clustered_column(spark, tmp_path):
    """Z-order clustered parquet: a selective filter on EITHER clustered
    column skips most files (parquet min-max stats), whereas a single-
    column sort only helps its own column and an unclustered layout
    helps neither."""
    from pyspark.sql import functions as F

    from vector_db_at_home_spark.sources.layout import zorder_write

    df = spark.range(50_000).select(
        (F.col("id") % 500).alias("x"),
        ((F.col("id") * 37) % 500).alias("y"),
        F.col("id").alias("payload"),
    )
    plain = str(tmp_path / "plain")
    zo = str(tmp_path / "zo")
    df.repartition(8).write.parquet(plain)
    zorder_write(df, zo, ["x", "y"], n_files=8)

    def touched(path, cond):
        d = spark.read.parquet(path).filter(cond)
        return (d.select(F.input_file_name()).distinct().count(), d.count())

    for cond in ("x BETWEEN 50 AND 60", "y BETWEEN 50 AND 60"):
        pf, prows = touched(plain, cond)
        zf, zrows = touched(zo, cond)
        assert zrows == prows  # clustering never changes results
        assert pf == 8         # unclustered: every file touched
        assert zf <= 4, f"{cond}: z-order touched {zf}/8 files"


def test_jsonl_corpus_schema_first_and_pipeline(spark, tmp_path):
    """JSONL front door: schema required (no silent double read), stable
    ids from a natural key, duplicate records stay distinct without one,
    and the result feeds exact dedup."""
    import json as _json

    import pytest as _pytest

    from vector_db_at_home_spark.operators.dedup import exact_dedup_stats
    from vector_db_at_home_spark.sources.records import load_jsonl_corpus

    d = tmp_path / "jsonl"
    d.mkdir()
    recs = [
        {"url": "u1", "body": "alpha beta gamma", "lang": "en"},
        {"url": "u2", "body": "alpha beta gamma", "lang": "en"},  # dup text
        {"url": "u3", "body": "something else entirely", "lang": "de"},
    ]
    (d / "part0.jsonl").write_text(
        "\n".join(_json.dumps(r) for r in recs))

    with _pytest.raises(ValueError, match="schema"):
        load_jsonl_corpus(spark, str(d), None)

    docs = load_jsonl_corpus(
        spark, str(d), "url string, body string, lang string",
        text_field="body", id_field="url")
    rows = docs.collect()
    assert {r.text for r in rows} == {"alpha beta gamma",
                                      "something else entirely"}
    assert docs.columns[:3] == ["doc_id", "text", "source"]
    assert "lang" in docs.columns
    # natural-key ids: stable across a re-read
    again = {r.doc_id for r in load_jsonl_corpus(
        spark, str(d), "url string, body string, lang string",
        text_field="body", id_field="url").collect()}
    assert {r.doc_id for r in rows} == again and len(again) == 3

    st = exact_dedup_stats(docs, "text").first()
    assert (st.n_rows, st.n_distinct, st.n_dup_rows) == (3, 2, 1)

    # without a natural key, identical records get DISTINCT ids
    anon = load_jsonl_corpus(
        spark, str(d), "url string, body string, lang string",
        text_field="body")
    assert anon.select("doc_id").distinct().count() == 3


def test_csv_corpus_loads_with_schema(spark, tmp_path):
    from vector_db_at_home_spark.sources.records import load_csv_corpus

    d = tmp_path / "csv"
    d.mkdir()
    (d / "a.csv").write_text(
        "id,text,score\n1,hello world,0.5\n2,other text,0.9\n")
    docs = load_csv_corpus(spark, str(d), "id long, text string, score double",
                           id_field="id")
    rows = {r.text: r for r in docs.collect()}
    assert set(rows) == {"hello world", "other text"}
    assert rows["hello world"].score == 0.5
    assert docs.columns[:3] == ["doc_id", "text", "source"]


def test_jsonl_corpus_stream_equals_batch(spark, tmp_path):
    """Streaming JSONL landing zone (the production LLM-corpus ingest
    front door): files stream through the SHARED projection into a
    parquet table row-identical to a batch read of the same files; the
    no-key form is refused (its occurrence window has no streaming
    equivalent)."""
    import json as _json

    import pytest as _pytest

    from vector_db_at_home_spark.sources.records import (
        load_jsonl_corpus,
        load_jsonl_corpus_stream,
    )

    d = tmp_path / "jsonl_land"
    d.mkdir()
    for part in range(3):
        recs = [
            {"rid": part * 10 + i, "text": f"doc {part} {i} words here",
             "lang": "en" if i % 2 == 0 else "de"}
            for i in range(4)
        ]
        (d / f"p{part}.jsonl").write_text(
            "\n".join(_json.dumps(r) for r in recs))

    schema = "rid long, text string, lang string"
    with _pytest.raises(ValueError, match="id_field"):
        load_jsonl_corpus_stream(spark, str(d), schema)

    out = str(tmp_path / "jsonl_out")
    q = (
        load_jsonl_corpus_stream(spark, str(d), schema, id_field="rid",
                                 max_files_per_trigger=1)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "jsonl_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    landed = {(r.doc_id, r.text, r.rid, r.lang)
              for r in spark.read.parquet(out).collect()}
    batch = {(r.doc_id, r.text, r.rid, r.lang)
             for r in load_jsonl_corpus(spark, str(d), schema,
                                        id_field="rid").collect()}
    assert landed == batch and len(landed) == 12


def test_csv_corpus_stream_equals_batch(spark, tmp_path):
    from vector_db_at_home_spark.sources.records import (
        load_csv_corpus,
        load_csv_corpus_stream,
    )

    d = tmp_path / "csv_land"
    d.mkdir()
    (d / "a.csv").write_text("rid,text\n1,alpha beta\n2,gamma delta\n")
    (d / "b.csv").write_text("rid,text\n3,epsilon zeta\n")

    schema = "rid long, text string"
    out = str(tmp_path / "csv_out")
    q = (
        load_csv_corpus_stream(spark, str(d), schema, id_field="rid",
                               max_files_per_trigger=1)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "csv_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    landed = {(r.doc_id, r.text, r.rid)
              for r in spark.read.parquet(out).collect()}
    batch = {(r.doc_id, r.text, r.rid)
             for r in load_csv_corpus(spark, str(d), schema,
                                      id_field="rid").collect()}
    assert landed == batch and len(landed) == 3
