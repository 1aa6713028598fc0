"""End-to-end example: multimodal columns as first-class data.

Run: python examples/multimodal_features.py   (reads testdata, prints a report)

The pipeline a multimodal training-data job runs over binary payload
columns, end to end on REAL bytes (the engine's pure-numpy BMP/WAV
codecs — no image/audio libraries needed for these formats):

1. attach media payloads to documents (binary + typed metadata struct);
2. exact binary dedup on a 32-byte content hash (the blobs themselves
   never shuffle — only the hash does);
3. decode: dimensions / sample counts / a geometry-sensitive content
   fingerprint per payload;
4. feature extraction: channel sums + edge energy for images,
   Σ|s| / peak / zero crossings / rFFT spectral centroid for audio;
5. a feature-based quality gate (drop near-silent audio and
   near-flat images — the multimodal analogue of text quality floors).

Every stage is one Arrow `mapInPandas` pass or a plain Column
expression; nothing collects to the driver.
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from architrave_project_apache_nifi_spark.operators import multimodal as mm
from architrave_project_apache_nifi_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.001"


def main() -> None:
    spark = get_spark("example-multimodal")
    spark.sparkContext.setLogLevel("ERROR")

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select("doc_id")
    media = mm.synthetic_media(docs)  # genuine BMP/WAV bytes

    # seed the kind of junk a real crawl contains: silent audio and a
    # flat single-color image (plus an exact duplicate of the flat one,
    # so the binary dedup has something to find)
    import numpy as np

    flat = mm.bmp_bytes(np.full((8, 8, 3), 37, dtype=np.uint8))
    silent = mm.wav_bytes(np.zeros(1600, dtype=np.int16))
    flat_png = mm.png_bytes(np.full((8, 8, 3), 37, dtype=np.uint8))
    junk = spark.createDataFrame(
        [(900001, flat, "image/bmp"), (900002, silent, "audio/wav"),
         (900003, flat, "image/bmp"), (900004, flat_png, "image/png")],
        "doc_id LONG, payload BINARY, mime STRING",
    ).select(
        "doc_id",
        F.struct(
            F.col("payload"),
            F.struct(
                F.col("mime").alias("mime"),
                F.octet_length("payload").cast("long").alias("byte_len"),
                F.lit(None).cast("int").alias("width"),
                F.lit(None).cast("int").alias("height"),
                F.lit(None).cast("long").alias("duration_ms"),
            ).alias("meta"),
        ).alias("media"),
    )
    media = media.unionByName(junk)
    n_docs = media.count()

    # 2. binary dedup: hash once, shuffle the 32-byte key, never the blob
    uniq = (
        media.withColumn("__h", F.sha2(F.col("media.payload"), 256))
        .groupBy("__h")
        .agg(F.min("doc_id").alias("keep_id"), F.count(F.lit(1)).alias("n"))
    )
    n_unique = uniq.count()

    # 3 + 4. decode + features, one Arrow pass each
    decoded = mm.decode_real(media)
    feats = mm.media_features(media)

    kinds = {r["kind"]: r["n"] for r in decoded.groupBy("kind").agg(
        F.count(F.lit(1)).alias("n")).collect()}

    # 5. feature-based quality gate:
    #    audio keeps rows with real signal (peak above an amplitude
    #    floor); images keep rows with real structure (edge energy
    #    above a per-pixel floor)
    gated = feats.filter(
        (
            (F.col("kind") == "audio") & (F.col("peak") >= 1000)
        )
        | (
            (F.col("kind") == "image")
            & (F.col("edge_energy") / F.col("n_values") >= 0.5)
        )
    )
    kept = gated.count()

    centroid = (
        feats.filter(F.col("kind") == "audio")
        .agg(F.round(F.avg("spectral_centroid"), 1).alias("c"))
        .collect()[0]["c"]
    )

    # 6. PERCEPTUAL image near-dup (r12, operators/imagehash.py):
    #    byte-identity dedup (step 2) misses re-encodes and small
    #    edits — dHash + Hamming banding catches them. The
    #    perturbed-duplicates fixture plants 4-member groups whose
    #    variants differ by one pixel; keep-best leaves one per group.
    from architrave_project_apache_nifi_spark.operators.cluster import (
        canonical_docs_best,
    )
    from architrave_project_apache_nifi_spark.operators.imagehash import (
        image_neardup_pairs,
        synthetic_neardup_media,
    )

    variants = synthetic_neardup_media(
        spark.range(40).select(F.col("id").alias("doc_id"))
    )
    pairs = image_neardup_pairs(variants, max_distance=3)
    keep = canonical_docs_best(
        variants.select(
            "doc_id", F.octet_length("media.payload").alias("n_bytes")
        ),
        pairs,
        "doc_id",
        "n_bytes",
        a_col="id_a",
        b_col="id_b",
    )
    n_keep = keep.filter(F.col("is_kept") == 1).count()

    print(f"payloads: {n_docs} ({kinds})")
    print(f"unique payloads by content hash: {n_unique}")
    print(f"mean audio spectral centroid: {centroid} Hz")
    print(
        f"kept after feature gate: {kept}/{n_docs} "
        "(dropped: silent audio, flat images)"
    )
    print(f"perceptual near-dup: kept {n_keep}/40 variant images")

    spark.stop()


if __name__ == "__main__":
    main()
