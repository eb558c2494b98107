"""Paginated REST ingestion → bronze rows.

Reference parity: the reference walks the Rick&Morty API two ways —
recursive ``info.next`` cursor (`/root/reference/dags/operators/
extract_api_operator.py:29-52`) and an iterative ``?page=N`` loop with a
5s retry (`dags/raw_character.py:15-64`). Both shapes collapse to one
iterative cursor walk here (bounded, no recursion), with the HTTP call
injected so tests run hermetically and the engine works without network.

Scale path: the public API is ~42 pages → a driver-side loop is correct
(SURVEY.md §7.3). For a real 100 TB feed the same ``fetch_pages``
contract is applied per-partition: ``spark.createDataFrame(urls)
.repartition(n).mapInPandas(fetch_batch)`` so executors fetch in
parallel; and at true scale ingestion becomes file-drop + directory
streaming (see data_platform_spark/streaming). The bronze row contract
(source_id, payload, loaded_at) is identical in every mode.
"""

from __future__ import annotations

import json
import time
from collections.abc import Callable, Iterator
from datetime import datetime

from pyspark.sql import DataFrame, SparkSession

from data_platform_spark.schemas import RAW_SCHEMA

# fetch(url) -> decoded JSON page: {"info": {"next": url|None}, "results": [...]}
Fetcher = Callable[[str], dict]


def walk_pages(
    start_url: str,
    fetch: Fetcher,
    max_pages: int = 10_000,
    retries: int = 2,
    retry_delay_s: float = 5.0,
) -> Iterator[dict]:
    """Follow the ``info.next`` cursor, yielding entity dicts.

    Bounded iteration (the reference recurses unboundedly — a quirk not
    worth copying); per-page retry mirrors the reference's sleep-and-retry
    (dags/raw_character.py:30-38) but with a cap instead of forever.
    """
    url: str | None = start_url
    pages = 0
    while url and pages < max_pages:
        attempt = 0
        while True:
            try:
                page = fetch(url)
                break
            except Exception:
                attempt += 1
                if attempt > retries:
                    raise
                time.sleep(retry_delay_s)
        # An empty intermediate page is NOT end-of-walk: keep following the
        # cursor (only a null info.next ends it); max_pages bounds the loop.
        yield from page.get("results") or []
        url = (page.get("info") or {}).get("next")
        pages += 1


def to_bronze_df(
    spark: SparkSession,
    entities: Iterator[dict] | list[dict],
    loaded_at: datetime,
) -> DataFrame:
    """Entity dicts → bronze DataFrame (source_id, payload, loaded_at).

    Payload stored as its full JSON string — the raw layer keeps the
    complete API response like the reference's JSONB column
    (dags/configure.py:54-88); staging extracts typed fields later.
    """
    rows = [
        (int(e["id"]), json.dumps(e, sort_keys=True), loaded_at)
        for e in entities
    ]
    return spark.createDataFrame(rows, RAW_SCHEMA)


def ingest_entity(
    spark: SparkSession,
    start_url: str,
    fetch: Fetcher,
    loaded_at: datetime,
) -> DataFrame:
    """One-call ingestion: page walk → bronze DataFrame."""
    return to_bronze_df(spark, walk_pages(start_url, fetch), loaded_at)


def http_fetch(url: str, timeout_s: float = 10.0) -> dict:
    """Production default ``Fetcher``: stdlib GET → decoded JSON page.

    The injected-fetcher contract stays the hermetic test seam; this is
    the live implementation of the reference's requests.get
    (dags/operators/extract_api_operator.py:29). stdlib urllib only — no
    extra dependency, and ``walk_pages`` owns retry/backoff so this stays
    a single attempt.

    The URL scheme is validated before opening: the ``info.next`` cursor
    is SERVER-SUPPLIED, and urllib would happily open ``file://`` — a
    compromised API response must not become a local-file read.
    """
    import urllib.parse
    import urllib.request

    scheme = urllib.parse.urlparse(url).scheme.lower()
    if scheme not in ("http", "https"):
        raise ValueError(
            f"refusing non-HTTP(S) fetch URL (scheme={scheme!r}): {url!r}"
        )
    req = urllib.request.Request(
        url, headers={"User-Agent": "data-platform-spark/ingest"}
    )
    with urllib.request.urlopen(req, timeout=timeout_s) as resp:  # noqa: S310 — scheme validated above
        return json.loads(resp.read().decode("utf-8"))
