"""Source discovery + landing-dir download — the reference's orchestrator
and downloader Lambdas, engine-side.

- Latest-partition discovery (reference:
  src/lambda_functions/fetch_raw_data.py:35-53): walk back ``2..7`` months
  from now, first month whose file exists wins. The existence probe is
  injectable so tests (and offline environments) fake the CDN.
- Streaming download (reference: src/lambda_functions/data_downloader.py:13-42):
  chunked HTTP GET into the landing (bronze) dir under the reference's key
  pattern ``nyc_taxi/yellow_taxi_{YYYY-MM}_{YYYYMMDD_HHMMSS}.parquet``
  (data_downloader.py:31-32). Spark cannot ingest HTTP — this is driver-side
  by design; Spark takes over at the landing dir.
"""

from __future__ import annotations

import os
from collections.abc import Callable
from datetime import datetime, timezone

URL_TEMPLATE = (
    "https://d37ci6vzurychx.cloudfront.net/trip-data/"
    "yellow_tripdata_{year_month}.parquet"
)  # public TLC CDN; reference: fetch_raw_data.py:48


def months_back(now: datetime, n: int) -> str:
    y, m = now.year, now.month - n
    while m <= 0:
        y, m = y - 1, m + 12
    return f"{y:04d}-{m:02d}"


def find_latest_available(
    url_exists: Callable[[str], bool],
    now: datetime | None = None,
    lookback: range = range(2, 8),
) -> tuple[str, str] | None:
    """Reference: find_latest_available_data (fetch_raw_data.py:35-53) —
    probe months ``now-2 .. now-7``, return (url, year_month) of the first
    hit, else None."""
    now = now or datetime.now(timezone.utc)
    for n in lookback:
        ym = months_back(now, n)
        url = URL_TEMPLATE.format(year_month=ym)
        if url_exists(url):
            return url, ym
    return None


def default_url_exists(url: str) -> bool:
    """HTTP HEAD probe (reference: check_url_exists, fetch_raw_data.py:18-32).
    Gated behind import-try: offline environments inject a fake."""
    try:
        import requests
    except ImportError:
        raise RuntimeError("requests unavailable; inject url_exists")
    try:
        return requests.head(url, timeout=10).status_code == 200
    except requests.RequestException:
        return False


def download_to_landing(
    url: str,
    landing_dir: str,
    year_month: str,
    fetcher: Callable[[str], "bytes | None"] | None = None,
    now: datetime | None = None,
) -> str:
    """Download one monthly file into the landing dir (bronze). The
    timestamped name preserves the reference's lineage convention
    (data_downloader.py:31-32)."""
    ts = (now or datetime.now(timezone.utc)).strftime("%Y%m%d_%H%M%S")
    key = f"nyc_taxi/yellow_taxi_{year_month}_{ts}.parquet"
    dest = os.path.join(landing_dir, key)
    os.makedirs(os.path.dirname(dest), exist_ok=True)
    if fetcher is not None:
        data = fetcher(url)
        if data is None:
            raise IOError(f"fetch failed: {url}")
        with open(dest, "wb") as f:
            f.write(data)
        return dest
    try:
        import requests
    except ImportError:
        raise RuntimeError("requests unavailable; pass fetcher")
    with requests.get(url, stream=True, timeout=60) as resp:
        resp.raise_for_status()
        with open(dest, "wb") as f:
            for chunk in resp.iter_content(chunk_size=1 << 20):
                f.write(chunk)
    return dest
