"""Deterministic synthetic pages generator (FIXTURES.md §1).

Seeded (seed=42) Common-Crawl-shaped table:
    pages(url string, warc_ts timestamp, html binary, text string,
          lang string)

- ~85% of rows embed exactly one coordinate mention inside templated
  prose; coordinates are drawn over the fixture region layout with a
  ~20% skew cluster at one "famous" coordinate (salted-join exercise)
  and a tail outside all regions (coverage-miss path).
- ~10% carry no coordinate (geoparse miss), ~5% a malformed mention.
- html wraps text; text must survive the engine byte-identically.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

FAMOUS = (-76.7512345, 34.7512345)
LANGS = np.array(["en", "es", "de", "fr"])


def pages_pdf(n: int, seed: int = 42) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    i = np.arange(n, dtype=np.int64)
    url = np.array([f"https://example.org/page/{k:08d}" for k in i])
    warc_ts = pd.Timestamp("2024-01-01") + pd.to_timedelta(i, unit="s")
    lang = LANGS[i % 4]

    lon = rng.uniform(-78.0, -74.0, n)
    lat = rng.uniform(33.0, 36.0, n)
    z = np.round(rng.uniform(-20.0, 20.0, n), 2)

    kind = rng.uniform(0.0, 1.0, n)  # <.20 famous, <.85 normal, <.95 miss, else malformed
    famous = kind < 0.20
    lon[famous], lat[famous] = FAMOUS

    texts = []
    for k in range(n):
        if kind[k] < 0.85:
            hemi_ns = "N" if lat[k] >= 0 else "S"
            hemi_ew = "E" if lon[k] >= 0 else "W"
            texts.append(
                f"Survey report {k}: the station is located at "
                f"{abs(lat[k]):.5f}{hemi_ns}, {abs(lon[k]):.5f}{hemi_ew}, "
                f"elevation {z[k]:.2f} m above the ellipsoid."
            )
        elif kind[k] < 0.95:
            texts.append(f"Plain page {k} with no coordinates whatsoever.")
        else:
            texts.append(f"Broken page {k}: located at {lat[k]:.5f}X, nonsense.")
    text = np.array(texts, dtype=object)
    html = np.array(
        [b"<html><body>" + t.encode("utf-8") + b"</body></html>" for t in texts],
        dtype=object,
    )
    return pd.DataFrame(
        {"url": url, "warc_ts": warc_ts, "html": html, "text": text, "lang": lang}
    )


PAGES_SCHEMA = (
    "url string, warc_ts timestamp, html binary, text string, lang string"
)


def pages_df(spark, n: int, seed: int = 42, partitions: int | None = None):
    df = spark.createDataFrame(pages_pdf(n, seed), PAGES_SCHEMA)
    if partitions:
        df = df.repartition(partitions)
    return df
