"""Retried download sink (SURVEY.md §2.1 S11, §2.9 U2).

Re-expression of the reference's parallel downloader
(``scrape_newest_baci_data.R:47-80``): 4 R worker processes each running
``GET(write_disk(...), timeout(60))`` with 3 retries and 2 s backoff —
and a known-broken result (author note ``:5-7``: files never land).

Spark-first shape: the URL table is a DataFrame; the side-effecting
fetch runs in ``foreachPartition``-style tasks via ``mapInPandas`` so
that per-URL outcomes come back as a *status DataFrame* instead of
worker-log ``cat`` lines (``:68-75``) — the failure mode that made the
reference undebuggable becomes a queryable table.

Fetching is injectable: tests use a fake fetcher, no network.
"""

from __future__ import annotations

import os
import time
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

STATUS_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("dest", T.StringType()),
        T.StructField("ok", T.BooleanType()),
        T.StructField("attempts", T.IntegerType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("error", T.StringType()),
    ]
)


def default_fetch(url: str) -> bytes:  # pragma: no cover - network
    from urllib.request import Request, urlopen

    req = Request(url, headers={"User-Agent": "artis-data-ingest-spark"})
    with urlopen(req, timeout=60) as resp:  # timeout per R:66
        return resp.read()


def download_all(
    urls: DataFrame,
    dest_dir: str,
    fetch: Callable[[str], bytes] = default_fetch,
    retries: int = 3,
    backoff_s: float = 2.0,
    url_col: str = "url",
    parallelism: int = 4,
) -> DataFrame:
    """Download every URL, one attempt loop per row, returning a status
    DataFrame. Defaults mirror the reference: retries=3, 2 s sleep
    (R:57,72), 4-way parallelism (R:77), overwrite-idempotent (R:64).

    ``repartition(parallelism)`` sets the task fan-out; on a cluster
    this spreads across executors. The write is idempotent (atomic
    rename over any existing file), so Spark task retries are safe.
    """
    os.makedirs(dest_dir, exist_ok=True)  # S12 (R:47-53)

    def _worker(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for url in pdf[url_col]:
                dest = os.path.join(dest_dir, url.rstrip("/").rsplit("/", 1)[-1])
                err, blob, attempts = None, None, 0
                for attempt in range(1, retries + 1):
                    attempts = attempt
                    try:
                        blob = fetch(url)
                        err = None
                        break
                    except Exception as e:  # noqa: BLE001
                        err = repr(e)
                        if attempt < retries:
                            time.sleep(backoff_s)
                if blob is not None:
                    tmp = f"{dest}.part-{os.getpid()}"
                    with open(tmp, "wb") as f:
                        f.write(blob)
                    os.replace(tmp, dest)  # atomic overwrite (R:64)
                    rows.append((url, dest, True, attempts, len(blob), None))
                else:
                    rows.append((url, None, False, attempts, 0, err))
            yield pd.DataFrame(
                rows,
                columns=["url", "dest", "ok", "attempts", "n_bytes", "error"],
            )

    return (
        urls.select(url_col)
        .distinct()
        .repartition(parallelism)
        .mapInPandas(_worker, STATUS_SCHEMA)
    )
