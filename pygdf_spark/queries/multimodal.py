"""Multimodal-column queries: opaque binary payloads with typed
metadata, decode/feature plumbing via Arrow-batched ``mapInPandas``
(north-star extension).

Two tiers (r5): PNG and WAV decode are REAL — pure-Python spec codecs
(``sources/png_lite.py`` / ``sources/wav_lite.py``) parse actual
bitstreams inside the kernels (``mm_image_decode_png``,
``mm_image_resize_nn``, ``mm_audio_decode_wav``). The ``*_stub``
queries remain the honest deterministic model for codec families
genuinely absent in this container (JPEG/MP3/video) — their Spark-side
schema/batching/partitioning is identical to the real path.

The binary payloads are derived (``encode(text)`` or synthesized
PNG/WAV bytes) since the driver tables carry no media; at production
the same plan reads parquet ``binary`` columns straight from the scan
(no decode until after filter pushdown — bytes stay columnar until the
Pandas UDF boundary).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import functions as F

from pygdf_spark.queries._util import T


def _payloads(spark, sf_dir):
    d = T(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.encode(F.col("text"), "UTF-8").alias("img_bytes"),
        "source",
    )


def mm_binary_meta(spark, sf_dir):
    """binary column + typed metadata, no UDF: byte length, content
    hash, leading byte — all pushdown-friendly expressions."""
    p = _payloads(spark, sf_dir)
    return p.select(
        "doc_id",
        F.octet_length("img_bytes").alias("n_bytes"),
        F.md5("img_bytes").alias("content_md5"),
        F.ascii(F.substring(F.col("img_bytes").cast("string"), 1, 1)).alias("first_byte"),
        "source",
    ).orderBy("doc_id")


MM_BINARY_META_SQL = """
SELECT doc_id,
       octet_length(encode(text)) AS n_bytes,
       md5(text) AS content_md5,
       ascii(SUBSTR(text, 1, 1)) AS first_byte,
       source
FROM documents ORDER BY doc_id
"""


def _fake_decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """STUB image decode. Real codecs (PIL/libjpeg) are unavailable in
    this container; the deterministic fake derives dimensions from the
    byte length so the full Arrow plumbing is exercised and
    oracle-checkable. Swap the body for a real decoder in production —
    signature, schema and batching stay identical."""
    for pdf in batches:
        try:
            raise NotImplementedError("image codec not available in this container")
        except NotImplementedError:
            n = pdf["img_bytes"].map(len)
        out = pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "n_bytes": n.astype("int32"),
                "width": (n % 64 + 16).astype("int32"),
                "height": (n // 64 % 64 + 16).astype("int32"),
            }
        )
        out["n_pixels"] = (out["width"].astype("int64") * out["height"]).astype("int64")
        out["codec"] = "stub/v1"
        yield out


def mm_image_decode_stub(spark, sf_dir):
    """mapInPandas decode pipeline: binary in → typed features out
    (DataFrame.apply_chunks parity, dataframe.py:4779 / mapInPandas)."""
    p = _payloads(spark, sf_dir)
    schema = "doc_id long, n_bytes int, width int, height int, n_pixels long, codec string"
    return p.mapInPandas(_fake_decode, schema).orderBy("doc_id")


MM_DECODE_SQL = """
SELECT doc_id,
       CAST(octet_length(encode(text)) AS INT) AS n_bytes,
       CAST(octet_length(encode(text)) % 64 + 16 AS INT) AS width,
       CAST(octet_length(encode(text)) // 64 % 64 + 16 AS INT) AS height,
       CAST((octet_length(encode(text)) % 64 + 16) * (octet_length(encode(text)) // 64 % 64 + 16) AS BIGINT) AS n_pixels,
       'stub/v1' AS codec
FROM documents ORDER BY doc_id
"""


def mm_frame_sample(spark, sf_dir):
    """frame-sampling plumbing (video analog): derive a deterministic
    frame index range per payload and explode — JVM-side, no UDF."""
    p = _payloads(spark, sf_dir).filter(F.col("doc_id") < 100)
    n_frames = F.octet_length("img_bytes") / F.lit(40)
    return (
        p.select(
            "doc_id",
            F.explode(F.sequence(F.lit(0), n_frames.cast("int"))).alias("frame_id"),
        )
        .withColumn("byte_offset", F.col("frame_id") * 40)
        .orderBy("doc_id", "frame_id")
    )


MM_FRAME_SQL = """
SELECT doc_id, CAST(t.f AS INT) AS frame_id, CAST(t.f * 40 AS INT) AS byte_offset
FROM documents, UNNEST(generate_series(0, octet_length(encode(text)) // 40)) AS t(f)
WHERE doc_id < 100
ORDER BY doc_id, frame_id
"""


def _fake_resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """STUB resize kernel (PIL unavailable): integer-only fit-inside-
    64×64 arithmetic on the stub dimensions, so the Arrow batch contract
    (bytes+dims in → bytes+dims out) is exercised end-to-end and stays
    oracle-checkable. Swap the body for a real resampler in production."""
    import numpy as np

    for pdf in batches:
        n = pdf["img_bytes"].map(len).astype("int64")
        w = (n % 64 + 16).astype("int64")
        h = (n // 64 % 64 + 16).astype("int64")
        longest = np.maximum(w, h)
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "in_w": w.astype("int32"),
                "in_h": h.astype("int32"),
                # floor division: identical in numpy and DuckDB //
                "out_w": (w * 64 // longest).astype("int32"),
                "out_h": (h * 64 // longest).astype("int32"),
                "out_bytes": (w * 64 // longest * (h * 64 // longest) * 3).astype("int64"),
            }
        )


def mm_resize_stub(spark, sf_dir):
    """resize plumbing (image analog of apply_chunks): mapInPandas
    batch kernel, bytes+dims → resized dims + RGB byte count."""
    p = _payloads(spark, sf_dir)
    schema = "doc_id long, in_w int, in_h int, out_w int, out_h int, out_bytes long"
    return p.mapInPandas(_fake_resize, schema).orderBy("doc_id")


MM_RESIZE_SQL = """
WITH dims AS (
  SELECT doc_id,
         octet_length(encode(text)) % 64 + 16 AS w,
         octet_length(encode(text)) // 64 % 64 + 16 AS h
  FROM documents
)
SELECT doc_id, CAST(w AS INT) AS in_w, CAST(h AS INT) AS in_h,
       CAST(w * 64 // GREATEST(w, h) AS INT) AS out_w,
       CAST(h * 64 // GREATEST(w, h) AS INT) AS out_h,
       CAST(w * 64 // GREATEST(w, h) * (h * 64 // GREATEST(w, h)) * 3 AS BIGINT) AS out_bytes
FROM dims ORDER BY doc_id
"""


def mm_feature_stub(spark, sf_dir):
    """feature-extraction plumbing: 8-dim deterministic feature vector
    per payload (md5-derived components — stands in for a CNN/CLIP
    embedding) as an array column, ALL JVM-side expressions: at scale
    the feature table is produced without any Python boundary, and real
    models slot in as a mapInPandas stage with the same output schema."""
    from pygdf_spark.functions.hashing import md5_mod

    d = T(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    feat = F.array(*[
        md5_mod(F.concat(F.col("text"), F.lit(str(j))), 997) for j in range(8)
    ])
    # feature vector stringified: the driver canonicalizer sorts with
    # pandas, which cannot hash list cells (r3 hash-fail class)
    return d.select(
        "doc_id",
        F.array_join(feat, ",").alias("feat"),
        F.aggregate(feat, F.lit(0).cast("long"), lambda a, v: a + v).alias("feat_sum"),
    ).orderBy("doc_id")


MM_FEATURE_SQL = """
SELECT doc_id,
       {feat} AS feat,
       CAST({sum} AS BIGINT) AS feat_sum
FROM documents WHERE doc_id < 200 ORDER BY doc_id
""".format(
    feat="array_to_string(list_value(" + ", ".join(
        f"CAST(md5_number_lower(text || '{j}') % 997 AS BIGINT)" for j in range(8)
    ) + "), ',')",
    sum=" + ".join(f"md5_number_lower(text || '{j}') % 997" for j in range(8)),
)


def _fake_audio_decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """STUB audio decode (no soundfile/ffmpeg in this container): the
    payload is treated as PCM16 mono @16 kHz, so every derived quantity
    is integer arithmetic on the byte length — deterministic and
    oracle-checkable. A real decoder replaces the except-branch with
    codec calls; signature/schema/batching stay identical."""
    for pdf in batches:
        try:
            raise NotImplementedError("audio codec not available in this container")
        except NotImplementedError:
            n_bytes = pdf["audio_bytes"].map(len)
        n_samples = (n_bytes // 2).astype("int64")
        out = pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "n_bytes": n_bytes.astype("int32"),
                "n_samples": n_samples,
                # integer ms at 16 kHz: samples * 1000 / 16000 = samples / 16
                "duration_ms": (n_samples // 16).astype("int64"),
                # 30 ms frames (480 samples), ceil
                "n_frames": ((n_samples + 479) // 480).astype("int64"),
                # 16k -> 8k resample output length
                "n_resampled_8k": (n_samples // 2).astype("int64"),
            }
        )
        out["codec"] = "pcm16-stub/v1"
        yield out


def mm_audio_stub(spark, sf_dir):
    """audio pipeline plumbing (mapInPandas over Arrow batches): binary
    payload in → PCM metadata + frame/resample inventory out — the
    audio analog of mm_image_decode_stub, same production swap-in
    contract."""
    p = _payloads(spark, sf_dir).withColumnRenamed("img_bytes", "audio_bytes")
    schema = ("doc_id long, n_bytes int, n_samples long, duration_ms long, "
              "n_frames long, n_resampled_8k long, codec string")
    return p.select("doc_id", "audio_bytes").mapInPandas(
        _fake_audio_decode, schema=schema
    ).orderBy("doc_id")


MM_AUDIO_SQL = """
SELECT doc_id,
       CAST(octet_length(encode(text)) AS INT) AS n_bytes,
       octet_length(encode(text)) // 2 AS n_samples,
       (octet_length(encode(text)) // 2) // 16 AS duration_ms,
       ((octet_length(encode(text)) // 2) + 479) // 480 AS n_frames,
       (octet_length(encode(text)) // 2) // 2 AS n_resampled_8k,
       'pcm16-stub/v1' AS codec
FROM documents ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# REAL decode queries (r5): pure-Python PNG/WAV codecs (sources/png_lite,
# sources/wav_lite — the avro_lite jar-free pattern). Payload pixels /
# samples are synthesized from a closed-form integer formula of doc_id, so
# the DuckDB oracle can recompute every stat WITHOUT any codec: if either
# codec direction (or the Arrow binary-column transport between the two
# mapInPandas stages) corrupts one byte, px_sum/amp_sum mismatch. The
# *_stub queries above remain the honest model for codecs genuinely absent
# in this container (JPEG/MP3-class).
# ---------------------------------------------------------------------------

#: pixel(doc, y, x, c) = (7*doc + 13x + 31y + 101c) % 256 over an
#: RGB image of W = 8 + doc%9, H = 8 + (doc//3)%7
def _gen_png(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    import numpy as np

    from pygdf_spark.sources.png_lite import encode_png

    for pdf in batches:
        bufs = []
        for doc in pdf["doc_id"]:
            doc = int(doc)
            w, h = 8 + doc % 9, 8 + (doc // 3) % 7
            x = np.arange(w)[None, :, None]
            y = np.arange(h)[:, None, None]
            c = np.arange(3)[None, None, :]
            px = ((7 * doc + 13 * x + 31 * y + 101 * c) % 256).astype("uint8")
            bufs.append(encode_png(px, "mixed"))  # every filter type in play
        yield pd.DataFrame({"doc_id": pdf["doc_id"], "img_png": bufs})


def _png_payloads(spark, sf_dir):
    d = T(spark, sf_dir, "documents").filter(F.col("doc_id") < 300).select("doc_id")
    return d.mapInPandas(_gen_png, "doc_id long, img_png binary")


def mm_image_decode_png(spark, sf_dir):
    """REAL image decode: synthesized PNGs (mixed scanline filters)
    decoded by the spec codec inside a second mapInPandas stage — the
    binary column crosses Arrow between the two kernels, as parquet
    media bytes would. Oracle recomputes all stats from the pixel
    formula, codec-free."""
    from pygdf_spark.operators.multimodal import image_decode

    return image_decode(_png_payloads(spark, sf_dir)).orderBy("doc_id")


MM_IMAGE_PNG_SQL = """
WITH dims AS (
  SELECT doc_id, 8 + doc_id % 9 AS w, 8 + (doc_id // 3) % 7 AS h
  FROM documents WHERE doc_id < 300
),
px AS (
  SELECT d.doc_id, d.w, d.h,
         SUM((7 * d.doc_id + 13 * xx.x + 31 * yy.y + 101 * cc.c) % 256) AS s
  FROM dims d,
       UNNEST(generate_series(0, d.w - 1)) AS xx(x),
       UNNEST(generate_series(0, d.h - 1)) AS yy(y),
       UNNEST(generate_series(0, 2)) AS cc(c)
  GROUP BY d.doc_id, d.w, d.h
)
SELECT doc_id,
       CAST(w AS INT) AS width, CAST(h AS INT) AS height, CAST(3 AS INT) AS channels,
       CAST(s AS BIGINT) AS px_sum,
       CAST(7 * doc_id % 256 AS INT) AS px_first,
       CAST((7 * doc_id + 13 * (w - 1) + 31 * (h - 1) + 202) % 256 AS INT) AS px_last
FROM px ORDER BY doc_id
"""


def mm_image_resize_nn(spark, sf_dir):
    """REAL resize: decode → [::2, ::2] nearest-neighbor decimate →
    re-ENCODE → re-decode → stats; both codec directions on the hot
    path. Oracle evaluates the pixel formula at the sampled (2x, 2y)
    coordinates."""
    from pygdf_spark.operators.multimodal import image_resize_nn

    return image_resize_nn(_png_payloads(spark, sf_dir), factor=2).orderBy("doc_id")


MM_IMAGE_RESIZE_SQL = """
WITH dims AS (
  SELECT doc_id, 8 + doc_id % 9 AS w, 8 + (doc_id // 3) % 7 AS h,
         (8 + doc_id % 9 + 1) // 2 AS ow, (8 + (doc_id // 3) % 7 + 1) // 2 AS oh
  FROM documents WHERE doc_id < 300
),
px AS (
  SELECT d.doc_id, d.ow, d.oh,
         SUM((7 * d.doc_id + 13 * (2 * xx.x) + 31 * (2 * yy.y) + 101 * cc.c) % 256) AS s
  FROM dims d,
       UNNEST(generate_series(0, d.ow - 1)) AS xx(x),
       UNNEST(generate_series(0, d.oh - 1)) AS yy(y),
       UNNEST(generate_series(0, 2)) AS cc(c)
  GROUP BY d.doc_id, d.ow, d.oh
)
SELECT doc_id,
       CAST(ow AS INT) AS width, CAST(oh AS INT) AS height, CAST(3 AS INT) AS channels,
       CAST(s AS BIGINT) AS px_sum,
       CAST(7 * doc_id % 256 AS INT) AS px_first,
       CAST((7 * doc_id + 13 * (2 * (ow - 1)) + 31 * (2 * (oh - 1)) + 202) % 256 AS INT) AS px_last
FROM px ORDER BY doc_id
"""


#: sample(doc, i) = ((31*doc + 7*i) % 4001) - 2000 over
#: n = 800 + doc % 400 mono samples @ 16 kHz
def _gen_wav(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    import numpy as np

    from pygdf_spark.sources.wav_lite import encode_wav

    for pdf in batches:
        bufs = []
        for doc in pdf["doc_id"]:
            doc = int(doc)
            n = 800 + doc % 400
            i = np.arange(n, dtype=np.int64)
            samples = (((31 * doc + 7 * i) % 4001) - 2000).astype(np.int16)
            bufs.append(encode_wav(samples, 16000))
        yield pd.DataFrame({"doc_id": pdf["doc_id"], "audio_wav": bufs})


def mm_audio_decode_wav(spark, sf_dir):
    """REAL audio decode: synthesized PCM16 WAVs parsed by the RIFF
    codec (chunk walk, fmt validation, sample extraction). Oracle
    recomputes amplitude stats from the sample formula."""
    from pygdf_spark.operators.multimodal import audio_decode

    d = T(spark, sf_dir, "documents").filter(F.col("doc_id") < 300).select("doc_id")
    payloads = d.mapInPandas(_gen_wav, "doc_id long, audio_wav binary")
    return audio_decode(payloads).orderBy("doc_id")


MM_AUDIO_WAV_SQL = """
WITH spec AS (
  SELECT doc_id, 800 + doc_id % 400 AS n
  FROM documents WHERE doc_id < 300
),
amp AS (
  SELECT s.doc_id, s.n,
         SUM((31 * s.doc_id + 7 * ii.i) % 4001 - 2000) AS a_sum,
         MAX((31 * s.doc_id + 7 * ii.i) % 4001 - 2000) AS a_max,
         MIN((31 * s.doc_id + 7 * ii.i) % 4001 - 2000) AS a_min
  FROM spec s, UNNEST(generate_series(0, s.n - 1)) AS ii(i)
  GROUP BY s.doc_id, s.n
)
SELECT doc_id,
       CAST(16000 AS INT) AS sample_rate, CAST(1 AS INT) AS channels,
       CAST(n AS BIGINT) AS n_samples,
       CAST(n * 1000 // 16000 AS BIGINT) AS duration_ms,
       CAST(a_sum AS BIGINT) AS amp_sum,
       CAST(a_max AS INT) AS amp_max, CAST(a_min AS INT) AS amp_min
FROM amp ORDER BY doc_id
"""


def mm_webdataset_images(spark, sf_dir):
    """End-to-end multimodal pipeline over the WebDataset layout (r6):
    synthesized PNGs + class labels → tar shards (members
    ``<doc>.png`` + ``<doc>.cls``, one deterministic tar per
    partition) → distributed binaryFile read → pivot-by-extension
    sample reassembly → spec PNG decode → per-label corpus rollup.
    Both members are verified: pixels through the decode stats, labels
    through the grouping key. Oracle recomputes everything from the
    pixel formula, codec- and container-free."""
    import shutil

    from pygdf_spark.operators.multimodal import image_decode
    from pygdf_spark.queries.io_ml import _tmp
    from pygdf_spark.sources.webdataset_lite import (
        read_webdataset,
        write_webdataset,
    )

    payloads = (
        _png_payloads(spark, sf_dir)
        .select(
            F.col("doc_id").cast("string").alias("k"),
            "img_png",
            (F.col("doc_id") % 7).cast("string").alias("cls"),
        )
        .coalesce(4)
    )
    path = _tmp(sf_dir, "wds_img")
    shutil.rmtree(path, ignore_errors=True)
    write_webdataset(payloads, path, "k", {"img_png": "png", "cls": "cls"})
    back = read_webdataset(spark, f"{path}/shard-*.tar")
    per = (
        back.groupBy("key")
        .pivot("ext", ["png", "cls"])
        .agg(F.first("data"))
    )
    imgs = per.select(F.col("key").cast("long").alias("doc_id"),
                      F.col("png").alias("img_png"))
    labels = per.select(F.col("key").cast("long").alias("doc_id"),
                        F.decode("cls", "UTF-8").cast("int").alias("label"))
    stats = image_decode(imgs)
    # 300 label rows — broadcast; the decode side stays shuffle-free
    joined = stats.join(F.broadcast(labels), "doc_id")
    return (
        joined.groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_imgs"),
            F.sum("px_sum").alias("px_sum_total"),
            F.sum(F.col("width").cast("long") * F.col("height")).alias("px_area"),
        )
        .orderBy("label")
    )


MM_WEBDATASET_SQL = """
WITH dims AS (
  SELECT doc_id, 8 + doc_id % 9 AS w, 8 + (doc_id // 3) % 7 AS h
  FROM documents WHERE doc_id < 300
),
px AS (
  SELECT d.doc_id, d.w, d.h,
         SUM((7 * d.doc_id + 13 * xx.x + 31 * yy.y + 101 * cc.c) % 256) AS s
  FROM dims d,
       UNNEST(generate_series(0, d.w - 1)) AS xx(x),
       UNNEST(generate_series(0, d.h - 1)) AS yy(y),
       UNNEST(generate_series(0, 2)) AS cc(c)
  GROUP BY d.doc_id, d.w, d.h
)
SELECT CAST(doc_id % 7 AS INT) AS label,
       CAST(COUNT(*) AS BIGINT) AS n_imgs,
       CAST(SUM(s) AS BIGINT) AS px_sum_total,
       CAST(SUM(w * h) AS BIGINT) AS px_area
FROM px GROUP BY 1 ORDER BY label
"""


#: animated-GIF spec: w=6+doc%7, h=5+(doc//2)%5, n_frames=3+doc%4,
#: 16-color palette R=(17j+doc)%256 G=(29j+2doc)%256 B=(43j+5doc)%256,
#: index(f,x,y)=(doc+3f+5x+7y)%16, delay(f)=(doc+f)%7 centiseconds
def _gen_gif(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    import numpy as np

    from pygdf_spark.sources.gif_lite import encode_gif

    for pdf in batches:
        bufs = []
        for doc in pdf["doc_id"]:
            doc = int(doc)
            w, h = 6 + doc % 7, 5 + (doc // 2) % 5
            nf = 3 + doc % 4
            j = np.arange(16)
            pal = np.stack(
                [(17 * j + doc) % 256, (29 * j + 2 * doc) % 256,
                 (43 * j + 5 * doc) % 256], axis=1
            ).astype("uint8")
            x = np.arange(w)[None, :]
            y = np.arange(h)[:, None]
            frames = [
                ((doc + 3 * f + 5 * x + 7 * y) % 16).astype("uint8")
                for f in range(nf)
            ]
            delays = [(doc + f) % 7 for f in range(nf)]
            bufs.append(encode_gif(frames, pal, delays_cs=delays))
        yield pd.DataFrame({"doc_id": pdf["doc_id"], "img_gif": bufs})


def _gen_jpeg(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    import numpy as np

    from pygdf_spark.sources.jpeg_lite import encode_jpeg

    for pdf in batches:
        bufs = []
        for doc in pdf["doc_id"]:
            doc = int(doc)
            wt, ht = 2 + doc % 3, 1 + (doc // 3) % 3
            tx = np.arange(wt)[None, :]
            ty = np.arange(ht)[:, None]
            tiles = ((doc + 11 * tx + 23 * ty) % 256).astype("uint8")
            img = np.repeat(np.repeat(tiles, 8, 0), 8, 1)
            bufs.append(encode_jpeg(img, quality=100))
        yield pd.DataFrame({"doc_id": pdf["doc_id"], "img_jpeg": bufs})


def mm_jpeg_decode(spark, sf_dir):
    """REAL JPEG decode: synthesized baseline JFIF bitstreams (full
    Huffman + zigzag + IDCT pipeline at quality 100) decoded by
    sources/jpeg_lite.py inside mapInPandas. Fixtures are constant
    within each aligned 8x8 tile, which quality-100 baseline JPEG
    round-trips BIT-EXACTLY (DC-only blocks, all-ones quant tables) —
    so the oracle recomputes every pixel stat from the tile formula,
    codec-free, while the decoder exercises its fully general paths."""
    from pygdf_spark.operators.multimodal import jpeg_decode

    d = T(spark, sf_dir, "documents").filter(F.col("doc_id") < 300) \
        .select("doc_id")
    payloads = d.mapInPandas(_gen_jpeg, "doc_id long, img_jpeg binary")
    return jpeg_decode(payloads).orderBy("doc_id")


MM_JPEG_DECODE_SQL = """
WITH spec AS (
  SELECT doc_id, 2 + doc_id % 3 AS wt, 1 + (doc_id // 3) % 3 AS ht
  FROM documents WHERE doc_id < 300
),
tiles AS (
  SELECT s.doc_id, s.wt, s.ht,
         SUM((s.doc_id + 11 * xx.x + 23 * yy.y) % 256) AS tsum
  FROM spec s,
       UNNEST(generate_series(0, s.wt - 1)) AS xx(x),
       UNNEST(generate_series(0, s.ht - 1)) AS yy(y)
  GROUP BY s.doc_id, s.wt, s.ht
)
SELECT doc_id,
       CAST(wt * 8 AS INT) AS width,
       CAST(ht * 8 AS INT) AS height,
       CAST(1 AS INT) AS channels,
       CAST(tsum * 64 AS BIGINT) AS px_sum,
       CAST(doc_id % 256 AS INT) AS px_first,
       CAST((doc_id + 11 * (wt - 1) + 23 * (ht - 1)) % 256 AS INT)
         AS px_last
FROM tiles ORDER BY doc_id
"""


def mm_webdataset_jpeg(spark, sf_dir):
    """TWO real codecs through the training-data container path:
    synthesized baseline JPEGs (quality 100, tiled — bit-exact
    round-trip class) land as ``<doc>.jpg`` + ``<doc>.cls`` members in
    WebDataset tar shards, are read back distributed, reassembled by
    key, Huffman/IDCT-decoded, and rolled up per label. Any defect in
    either codec or in the tar container shifts the pixel sums; the
    oracle recomputes from the tile formula, codec- and
    container-free."""
    import shutil

    from pygdf_spark.operators.multimodal import jpeg_decode
    from pygdf_spark.queries.io_ml import _tmp
    from pygdf_spark.sources.webdataset_lite import (
        read_webdataset,
        write_webdataset,
    )

    d = T(spark, sf_dir, "documents").filter(F.col("doc_id") < 300) \
        .select("doc_id")
    payloads = (
        d.mapInPandas(_gen_jpeg, "doc_id long, img_jpeg binary")
        .select(
            F.col("doc_id").cast("string").alias("k"),
            "img_jpeg",
            (F.col("doc_id") % 5).cast("string").alias("cls"),
        )
        .coalesce(4)
    )
    path = _tmp(sf_dir, "wds_jpg")
    shutil.rmtree(path, ignore_errors=True)
    write_webdataset(payloads, path, "k",
                     {"img_jpeg": "jpg", "cls": "cls"})
    back = read_webdataset(spark, f"{path}/shard-*.tar")
    per = (
        back.groupBy("key")
        .pivot("ext", ["jpg", "cls"])
        .agg(F.first("data"))
    )
    imgs = per.select(F.col("key").cast("long").alias("doc_id"),
                      F.col("jpg").alias("img_jpeg"))
    labels = per.select(F.col("key").cast("long").alias("doc_id"),
                        F.decode("cls", "UTF-8").cast("int").alias("label"))
    stats = jpeg_decode(imgs)
    joined = stats.join(F.broadcast(labels), "doc_id")
    return (
        joined.groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_imgs"),
            F.sum("px_sum").alias("px_sum_total"),
            F.sum(F.col("width").cast("long") * F.col("height"))
            .alias("px_area"),
        )
        .orderBy("label")
    )


MM_WEBDATASET_JPEG_SQL = """
WITH spec AS (
  SELECT doc_id, 2 + doc_id % 3 AS wt, 1 + (doc_id // 3) % 3 AS ht,
         doc_id % 5 AS label
  FROM documents WHERE doc_id < 300
),
tiles AS (
  SELECT s.doc_id, s.label, s.wt, s.ht,
         SUM((s.doc_id + 11 * xx.x + 23 * yy.y) % 256) AS tsum
  FROM spec s,
       UNNEST(generate_series(0, s.wt - 1)) AS xx(x),
       UNNEST(generate_series(0, s.ht - 1)) AS yy(y)
  GROUP BY s.doc_id, s.label, s.wt, s.ht
)
SELECT CAST(label AS INT) AS label, COUNT(*) AS n_imgs,
       CAST(SUM(tsum * 64) AS BIGINT) AS px_sum_total,
       CAST(SUM(wt * 8 * ht * 8) AS BIGINT) AS px_area
FROM tiles GROUP BY label ORDER BY label
"""


def mm_gif_frames(spark, sf_dir):
    """REAL animated-image frame sampling: synthesized multi-frame GIFs
    (16-color palette, per-frame delays) decoded by the spec LZW codec
    inside mapInPandas, keeping every 2nd composited frame — the
    video→frames stage of a multimodal pipeline on real bitstreams.
    Oracle recomputes every sampled frame's pixel stats from the
    palette/index formulas, codec-free."""
    from pygdf_spark.operators.multimodal import gif_frame_sample

    d = T(spark, sf_dir, "documents").filter(F.col("doc_id") < 300).select("doc_id")
    payloads = d.mapInPandas(_gen_gif, "doc_id long, img_gif binary")
    return gif_frame_sample(payloads, stride=2).orderBy("doc_id", "frame")


MM_GIF_FRAMES_SQL = """
WITH spec AS (
  SELECT doc_id, 6 + doc_id % 7 AS w, 5 + (doc_id // 2) % 5 AS h,
         3 + doc_id % 4 AS nf
  FROM documents WHERE doc_id < 300
),
fr AS (
  SELECT s.doc_id, s.w, s.h, ff.f
  FROM spec s, UNNEST(generate_series(0, s.nf - 1)) AS ff(f)
  WHERE ff.f % 2 = 0
),
px AS (
  SELECT fr.doc_id, fr.f, fr.w, fr.h,
         SUM((17 * ((fr.doc_id + 3 * fr.f + 5 * xx.x + 7 * yy.y) % 16) + fr.doc_id) % 256
           + (29 * ((fr.doc_id + 3 * fr.f + 5 * xx.x + 7 * yy.y) % 16) + 2 * fr.doc_id) % 256
           + (43 * ((fr.doc_id + 3 * fr.f + 5 * xx.x + 7 * yy.y) % 16) + 5 * fr.doc_id) % 256) AS s
  FROM fr,
       UNNEST(generate_series(0, fr.w - 1)) AS xx(x),
       UNNEST(generate_series(0, fr.h - 1)) AS yy(y)
  GROUP BY fr.doc_id, fr.f, fr.w, fr.h
)
SELECT doc_id, CAST(f AS INT) AS frame,
       CAST(w AS INT) AS width, CAST(h AS INT) AS height,
       CAST(s AS BIGINT) AS px_sum,
       CAST((17 * ((doc_id + 3 * f) % 16) + doc_id) % 256 AS INT) AS px_first,
       CAST((43 * ((doc_id + 3 * f + 5 * (w - 1) + 7 * (h - 1)) % 16) + 5 * doc_id) % 256 AS INT) AS px_last,
       CAST((doc_id + f) % 7 AS INT) AS delay_cs
FROM px ORDER BY doc_id, frame
"""



def mm_audio_spectrogram(spark, sf_dir):
    """REAL spectral features: the PCM16 WAVs of ``mm_audio_decode_wav``
    framed into 8-sample windows and pushed through a full real FFT per
    frame (numpy rfft inside mapInPandas), emitting DC / quarter-band /
    Nyquist power plus the Parseval total. The three emitted bins are
    integer-exact (twiddles ∈ {0, ±1}) and the Parseval identity
    (Σ_bins |X_k|² ≡ N·Σx²) pins the REST of the spectrum against the
    oracle's DFT-free integer algebra — so a defect in any FFT bin, the
    framing, or the WAV decode breaks the compare."""
    from pygdf_spark.operators.multimodal import audio_spectrogram

    d = T(spark, sf_dir, "documents").filter(F.col("doc_id") < 120) \
        .select("doc_id")
    payloads = d.mapInPandas(_gen_wav, "doc_id long, audio_wav binary")
    return audio_spectrogram(payloads, frame_len=8).orderBy("doc_id", "frame")


MM_AUDIO_SPECTRO_SQL = """
WITH spec AS (
  SELECT doc_id, 800 + doc_id % 400 AS n
  FROM documents WHERE doc_id < 120
),
fr AS (
  SELECT s.doc_id, ff.f
  FROM spec s, UNNEST(generate_series(0, s.n // 8 - 1)) AS ff(f)
),
sm AS (
  SELECT fr.doc_id, fr.f,
    SUM((31 * fr.doc_id + 7 * (8 * fr.f + mm.m)) % 4001 - 2000) AS s0,
    SUM(((31 * fr.doc_id + 7 * (8 * fr.f + mm.m)) % 4001 - 2000)
        * (CASE mm.m % 4 WHEN 0 THEN 1 WHEN 2 THEN -1 ELSE 0 END)) AS c2,
    SUM(((31 * fr.doc_id + 7 * (8 * fr.f + mm.m)) % 4001 - 2000)
        * (CASE mm.m % 4 WHEN 1 THEN 1 WHEN 3 THEN -1 ELSE 0 END)) AS s2,
    SUM(((31 * fr.doc_id + 7 * (8 * fr.f + mm.m)) % 4001 - 2000)
        * (CASE mm.m % 2 WHEN 0 THEN 1 ELSE -1 END)) AS c4,
    SUM(((31 * fr.doc_id + 7 * (8 * fr.f + mm.m)) % 4001 - 2000)
        * ((31 * fr.doc_id + 7 * (8 * fr.f + mm.m)) % 4001 - 2000)) AS e
  FROM fr, UNNEST(generate_series(0, 7)) AS mm(m)
  GROUP BY fr.doc_id, fr.f
)
SELECT doc_id, CAST(f AS INT) AS frame,
       CAST(s0 * s0 AS BIGINT) AS pow_dc,
       CAST(c2 * c2 + s2 * s2 AS BIGINT) AS pow_quarter,
       CAST(c4 * c4 AS BIGINT) AS pow_nyquist,
       CAST(8 * e AS BIGINT) AS energy
FROM sm ORDER BY doc_id, frame
"""


def _gen_avi(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    import numpy as np

    from pygdf_spark.sources.avi_lite import encode_avi
    from pygdf_spark.sources.jpeg_lite import encode_jpeg

    for pdf in batches:
        bufs = []
        for doc in pdf["doc_id"]:
            doc = int(doc)
            wt, ht = 2 + doc % 3, 1 + (doc // 3) % 3
            nf = 2 + doc % 4
            tx = np.arange(wt)[None, :]
            ty = np.arange(ht)[:, None]
            frames = []
            for f in range(nf):
                tiles = ((doc + 9 * f + 11 * tx + 23 * ty) % 256).astype("uint8")
                img = np.repeat(np.repeat(tiles, 8, 0), 8, 1)
                frames.append(encode_jpeg(img, quality=100))
            bufs.append(
                encode_avi(frames, wt * 8, ht * 8,
                           us_per_frame=10000 * (1 + doc % 4))
            )
        yield pd.DataFrame({"doc_id": pdf["doc_id"], "video_avi": bufs})


def mm_video_mjpeg(spark, sf_dir):
    """REAL video→frames→pixels: synthesized AVI/MJPEG containers
    (sources/avi_lite.py — RIFF walk, hdrl parse, idx1 validation)
    whose frames are quality-100 baseline JPEGs (bit-exact round-trip
    class), frame-sampled at stride 2 and Huffman/IDCT-decoded inside
    one mapInPandas kernel. Any defect in the container parse, the
    frame index, or the image codec shifts the stats; the oracle
    recomputes every kept frame from the tile formula, codec- and
    container-free. The reference ships no video path (multimodal is
    out of scope for a GPU dataframe engine); this tier serves the
    training-data-pipeline contract."""
    from pygdf_spark.operators.multimodal import video_frame_sample

    d = T(spark, sf_dir, "documents").filter(F.col("doc_id") < 200) \
        .select("doc_id")
    payloads = d.mapInPandas(_gen_avi, "doc_id long, video_avi binary")
    return video_frame_sample(payloads, stride=2).orderBy("doc_id", "frame")


MM_VIDEO_MJPEG_SQL = """
WITH spec AS (
  SELECT doc_id, 2 + doc_id % 3 AS wt, 1 + (doc_id // 3) % 3 AS ht,
         2 + doc_id % 4 AS nf, 10000 * (1 + doc_id % 4) AS upf
  FROM documents WHERE doc_id < 200
),
fr AS (
  SELECT s.doc_id, s.wt, s.ht, s.upf, ff.f
  FROM spec s, UNNEST(generate_series(0, s.nf - 1)) AS ff(f)
  WHERE ff.f % 2 = 0
),
px AS (
  SELECT fr.doc_id, fr.f, fr.wt, fr.ht, fr.upf,
         SUM((fr.doc_id + 9 * fr.f + 11 * xx.x + 23 * yy.y) % 256) AS tsum
  FROM fr,
       UNNEST(generate_series(0, fr.wt - 1)) AS xx(x),
       UNNEST(generate_series(0, fr.ht - 1)) AS yy(y)
  GROUP BY fr.doc_id, fr.f, fr.wt, fr.ht, fr.upf
)
SELECT doc_id, CAST(f AS INT) AS frame,
       CAST(wt * 8 AS INT) AS width, CAST(ht * 8 AS INT) AS height,
       CAST(tsum * 64 AS BIGINT) AS px_sum,
       CAST((doc_id + 9 * f) % 256 AS INT) AS px_first,
       CAST((doc_id + 9 * f + 11 * (wt - 1) + 23 * (ht - 1)) % 256 AS INT)
         AS px_last,
       CAST(upf AS INT) AS us_per_frame
FROM px ORDER BY doc_id, frame
"""


QUERIES = {
    "mm_jpeg_decode": mm_jpeg_decode,
    "mm_video_mjpeg": mm_video_mjpeg,
    "mm_audio_spectrogram": mm_audio_spectrogram,
    "mm_webdataset_jpeg": mm_webdataset_jpeg,
    "mm_gif_frames": mm_gif_frames,
    "mm_binary_meta": mm_binary_meta,
    "mm_image_decode_stub": mm_image_decode_stub,
    "mm_frame_sample": mm_frame_sample,
    "mm_resize_stub": mm_resize_stub,
    "mm_feature_stub": mm_feature_stub,
    "mm_audio_stub": mm_audio_stub,
    "mm_image_decode_png": mm_image_decode_png,
    "mm_image_resize_nn": mm_image_resize_nn,
    "mm_audio_decode_wav": mm_audio_decode_wav,
    "mm_webdataset_images": mm_webdataset_images,
}

ORACLE = {
    "mm_jpeg_decode": MM_JPEG_DECODE_SQL,
    "mm_video_mjpeg": MM_VIDEO_MJPEG_SQL,
    "mm_audio_spectrogram": MM_AUDIO_SPECTRO_SQL,
    "mm_webdataset_jpeg": MM_WEBDATASET_JPEG_SQL,
    "mm_gif_frames": MM_GIF_FRAMES_SQL,
    "mm_webdataset_images": MM_WEBDATASET_SQL,
    "mm_binary_meta": MM_BINARY_META_SQL,
    "mm_image_decode_stub": MM_DECODE_SQL,
    "mm_frame_sample": MM_FRAME_SQL,
    "mm_resize_stub": MM_RESIZE_SQL,
    "mm_feature_stub": MM_FEATURE_SQL,
    "mm_audio_stub": MM_AUDIO_SQL,
    "mm_image_decode_png": MM_IMAGE_PNG_SQL,
    "mm_image_resize_nn": MM_IMAGE_RESIZE_SQL,
    "mm_audio_decode_wav": MM_AUDIO_WAV_SQL,
}
