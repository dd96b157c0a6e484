"""URL canonicalization golden tests (ops/urls.py)."""

import pandas as pd

from vyperdatum_spark.ops import urls

GOLDEN = [
    # (input, canonical)
    ("HTTPS://WWW.News.EXAMPLE.com:443/Docs/7?utm_source=feed&ref=3#sec2",
     "https://www.news.example.com/Docs/7?ref=3"),
    ("https://www.a.example.com/Docs/12/",
     "https://www.a.example.com/Docs/12"),
    ("http://Host.Example.COM:80/Path/X",
     "http://host.example.com/Path/X"),
    ("http://host.example.com:8080/p",     # non-default port survives
     "http://host.example.com:8080/p"),
    ("https://h.example.com/p?utm_campaign=x",
     "https://h.example.com/p"),
    ("https://h.example.com/p?a=1&utm_medium=m&b=2",
     "https://h.example.com/p?a=1&b=2"),
    ("https://h.example.com/CaseSensitive/Path",
     "https://h.example.com/CaseSensitive/Path"),
    ("https://h.example.com/",             # root slash: path '/' kept?
     "https://h.example.com/"),
]


def test_canonicalization_goldens(spark):
    pdf = pd.DataFrame({
        "doc_id": range(len(GOLDEN)),
        "url": [g[0] for g in GOLDEN],
    })
    out = urls.canonical_url_df(spark.createDataFrame(pdf)) \
        .toPandas().set_index("doc_id").sort_index()
    for i, (src, want) in enumerate(GOLDEN):
        assert out.loc[i, "canonical_url"] == want, (src, out.loc[i, "canonical_url"])


def test_url_dedup_groups(spark):
    variants = [
        "https://www.x.example.com/Docs/1",
        "HTTPS://WWW.X.EXAMPLE.com:443/Docs/1#frag",
        "https://www.x.example.com/Docs/1/?utm_source=s",
        "https://www.x.example.com/Docs/2",  # singleton — excluded
    ]
    pdf = pd.DataFrame({"doc_id": [10, 11, 12, 13], "url": variants})
    got = urls.url_dedup(spark.createDataFrame(pdf)) \
        .toPandas().sort_values("canonical_url").reset_index(drop=True)
    assert len(got) == 1
    assert got.loc[0, "canonical_url"] == "https://www.x.example.com/Docs/1"
    assert got.loc[0, "keeper_id"] == 10
    assert got.loc[0, "n_members"] == 3
