"""Deterministic synthetic web-page corpora.

Two generators:

1. :func:`synth_corpus` — small, seeded, pure-numpy corpus with planted
   duplicate clusters and labeled pairs (the validation benchmark analog
   of the reference's manually labeled pair set, reference
   README.md:128-133). Used by pytest for the F1 >= 0.99 gate.

2. :func:`pages_from_documents` — Spark-native deriver that expands the
   driver-provided ``documents`` parquet into a ``pages`` table with
   deterministic re-crawl/re-host variants. Runs entirely in the JVM
   (explode + hash-driven perturbation via a pandas UDF) so it scales
   with the input; used by ``__spark_entry__.entry`` and ``bench.py``.

Page schema (BASELINE.json input_hint):
    url: string, warc_ts: timestamp, html: binary, text: string, lang: string
"""

from __future__ import annotations

import datetime as dt
import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

BASE_TS = dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc)

# Small word pool; deterministic. Realistic-ish tokens keep similarity
# functions honest (shared prefixes, varied lengths).
_SYLLABLES = [
    "an", "ber", "cor", "del", "eth", "fin", "gor", "hal", "ing", "jor",
    "kel", "lim", "mon", "nor", "ost", "per", "qui", "ral", "sta", "tor",
    "ula", "ver", "wex", "yor", "zan", "bri", "cla", "dun", "fra", "gre",
]

BOILERPLATE = "home login search menu contact about privacy terms"


def _vocab(n: int, rng: np.random.Generator) -> list[str]:
    words = []
    for _ in range(n):
        k = int(rng.integers(2, 5))
        words.append("".join(_SYLLABLES[int(i)] for i in rng.integers(0, len(_SYLLABLES), k)))
    return words


def render_html(title: str, text: str) -> bytes:
    """The html template. Inverse of extract.extract_text — byte-exact."""
    return f"<html><head><title>{title}</title></head><body>{text}</body></html>".encode("utf-8")


def _opaque_path(entity: int, variant: int) -> str:
    # URL must not encode entity membership (FIXTURES.md §1).
    return hashlib.md5(f"page-{entity}-{variant}".encode()).hexdigest()[:16]


def synth_corpus(
    n_entities: int = 200,
    n_domains: int = 20,
    seed: int = 42,
    max_variants: int = 8,
    edit_rate: float = 0.10,
) -> tuple[pd.DataFrame, pd.DataFrame, pd.DataFrame]:
    """Return (pages, labels, expected_entities) pandas DataFrames.

    Planted structure per FIXTURES.md: each entity has 1..max_variants
    page variants — re-crawls/re-hosts with title token swaps, <=10%
    body-token edits, boilerplate prefix/suffix. Domains are
    Zipf-distributed to create hot-key skew.
    """
    rng = np.random.default_rng(seed)
    vocab = _vocab(2000, rng)
    domains = [f"d{i:03d}.example.com" for i in range(n_domains)]
    # Zipf-ish domain weights: a few domains get most pages (hot keys).
    dw = 1.0 / np.arange(1, n_domains + 1) ** 1.2
    dw /= dw.sum()
    langs = ["en"] * 9 + ["de", "fr", "es"]

    rows: list[dict] = []
    expected: list[dict] = []
    for e in range(n_entities):
        lang = langs[int(rng.integers(0, len(langs)))]
        title_toks = [vocab[int(i)] for i in rng.integers(0, len(vocab), int(rng.integers(4, 9)))]
        body_toks = [vocab[int(i)] for i in rng.integers(0, len(vocab), int(rng.integers(40, 150)))]
        # variant count: mostly 1-3, tail up to max_variants
        n_var = 1 + int(rng.geometric(0.45))
        n_var = min(n_var, max_variants)
        home_domain = domains[int(rng.choice(n_domains, p=dw))]
        for v in range(n_var):
            t = list(title_toks)
            b = list(body_toks)
            if v > 0:
                # title token swap
                if len(t) >= 2 and rng.random() < 0.5:
                    i, j = rng.choice(len(t), 2, replace=False)
                    t[i], t[j] = t[j], t[i]
                # <= edit_rate body token replacements
                n_edit = int(rng.integers(0, max(1, int(len(b) * edit_rate)) + 1))
                for idx in rng.choice(len(b), min(n_edit, len(b)), replace=False):
                    b[int(idx)] = vocab[int(rng.integers(0, len(vocab)))]
                # boilerplate prefix/suffix
                if rng.random() < 0.4:
                    b = BOILERPLATE.split() + b
                if rng.random() < 0.4:
                    b = b + BOILERPLATE.split()
                # re-host: 40% of re-crawls land on another domain
                domain = (
                    domains[int(rng.choice(n_domains, p=dw))] if rng.random() < 0.4 else home_domain
                )
            else:
                domain = home_domain
            title = " ".join(t)
            text = " ".join(b)
            url = f"https://{domain}/p/{_opaque_path(e, v)}"
            ts = BASE_TS + dt.timedelta(hours=e) + dt.timedelta(days=3 * v)
            rows.append(
                dict(url=url, warc_ts=ts, html=render_html(title, text), text=text, lang=lang)
            )
            expected.append(dict(url=url, entity_gt=e))

    pages = pd.DataFrame(rows)
    exp = pd.DataFrame(expected)

    # Labeled pairs (README.md:128-133 analog): all positive pairs +
    # same-domain negative pairs, restricted to comparable blocks.
    by_entity: dict[int, list[str]] = {}
    url_domain = {r["url"]: r["url"].split("/")[2] for r in rows}
    for rec in expected:
        by_entity.setdefault(rec["entity_gt"], []).append(rec["url"])
    lab: list[dict] = []
    for e, urls in by_entity.items():
        urls = sorted(urls)
        for i in range(len(urls)):
            for j in range(i + 1, len(urls)):
                u1, u2 = urls[i], urls[j]
                d1, d2 = url_domain[u1], url_domain[u2]
                key = f"domain:{d1}" if d1 == d2 else "lsh"
                lab.append(dict(url_1=u1, url_2=u2, block_key=key, is_match=1))
    # negatives: sample same-domain cross-entity pairs
    dom_urls: dict[str, list[str]] = {}
    url_entity = {r["url"]: r["entity_gt"] for r in expected}
    for u, d in url_domain.items():
        dom_urls.setdefault(d, []).append(u)
    n_neg_target = len(lab)
    negs: list[dict] = []
    for d in sorted(dom_urls):
        urls = sorted(dom_urls[d])
        if len(urls) < 2:
            continue
        for _ in range(min(len(urls), 50)):
            i, j = rng.integers(0, len(urls), 2)
            if i == j:
                continue
            u1, u2 = sorted((urls[int(i)], urls[int(j)]))
            if url_entity[u1] != url_entity[u2]:
                negs.append(dict(url_1=u1, url_2=u2, block_key=f"domain:{d}", is_match=0))
        if len(negs) >= n_neg_target:
            break
    labels = pd.DataFrame(lab + negs).drop_duplicates(["url_1", "url_2"]).reset_index(drop=True)
    return pages, labels, exp


PAGES_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("warc_ts", T.TimestampType(), False),
        T.StructField("html", T.BinaryType(), False),
        T.StructField("text", T.StringType(), False),
        T.StructField("lang", T.StringType(), False),
    ]
)


def synth_pages_df(spark: SparkSession, **kw) -> tuple[DataFrame, DataFrame, DataFrame]:
    """synth_corpus as Spark DataFrames (pages, labels, expected)."""
    pages, labels, exp = synth_corpus(**kw)
    pages_df = spark.createDataFrame(pages, schema=PAGES_SCHEMA)
    labels_df = spark.createDataFrame(labels)
    exp_df = spark.createDataFrame(exp)
    return pages_df, labels_df, exp_df


# ---------------------------------------------------------------------------
# Spark-native deriver: documents parquet -> pages table (scales with input)
# ---------------------------------------------------------------------------

_N_DOMAINS = 50


@F.pandas_udf(T.StringType())
def _perturb_text(text: pd.Series, doc_id: pd.Series, variant: pd.Series) -> pd.Series:
    """Deterministic ~8% token substitution keyed on (doc_id, variant).

    Arrow-batched; variant 0 is the identity so each document keeps one
    pristine page (the golden text for byte-identity tests).
    """
    out = []
    for t, d, v in zip(text, doc_id, variant):
        if v == 0 or not t:
            out.append(t)
            continue
        toks = t.split(" ")
        h = int.from_bytes(hashlib.md5(f"{d}:{v}".encode()).digest()[:8], "big")
        rng = np.random.default_rng(h)
        n_edit = max(1, int(len(toks) * 0.08))
        idxs = rng.choice(len(toks), min(n_edit, len(toks)), replace=False)
        for i in idxs:
            toks[int(i)] = f"tok{int(rng.integers(0, 9999)):04d}"
        if rng.random() < 0.4:
            toks = BOILERPLATE.split() + toks
        out.append(" ".join(toks))
    return pd.Series(out)


def pages_from_documents(docs: DataFrame, max_variants: int = 3) -> DataFrame:
    """Expand documents(doc_id, text, lang, source) into pages.

    Entirely declarative except the perturbation UDF: variants via
    ``explode(sequence(...))``, urls/domains/timestamps from xxhash64 —
    no driver-side loops, so this runs at any scale.
    Ground truth for clustering = doc_id (not encoded in the url).
    """
    n_var = (F.pmod(F.col("doc_id"), F.lit(max_variants)) + 1).cast("int")
    df = (
        docs.withColumn("n_var", n_var)
        .withColumn("variant", F.explode(F.sequence(F.lit(0), F.col("n_var") - 1)))
        .drop("n_var")
    )
    opaque = F.lower(F.hex(F.xxhash64(F.concat_ws(":", F.lit("page"), "doc_id", "variant"))))
    domain = F.concat(
        F.lit("d"),
        F.lpad(F.pmod(F.xxhash64(F.concat_ws(":", "doc_id", "variant", "source")), F.lit(_N_DOMAINS)).cast("string"), 3, "0"),
        F.lit(".example.com"),
    )
    title = F.concat_ws(" ", F.slice(F.split(F.col("text"), " "), 1, 6))
    body = _perturb_text(F.col("text"), F.col("doc_id"), F.col("variant"))
    return (
        df.withColumn("body", body)
        .select(
            F.concat(F.lit("https://"), domain, F.lit("/p/"), opaque).alias("url"),
            (
                F.lit(BASE_TS.replace(tzinfo=None))
                + F.make_interval(hours=F.col("doc_id") % 10000, mins=F.col("variant") * 90)
            ).alias("warc_ts"),
            F.encode(
                F.concat(
                    F.lit("<html><head><title>"),
                    title,
                    F.lit("</title></head><body>"),
                    F.col("body"),
                    F.lit("</body></html>"),
                ),
                "UTF-8",
            ).alias("html"),
            F.col("body").alias("text"),
            F.col("lang"),
            F.col("doc_id").alias("entity_gt"),
        )
    )
