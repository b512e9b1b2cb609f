"""Deterministic synthetic corpus: Common-Crawl-style ``pages`` table.

Shape per BASELINE.json input_hint:
    pages(url: string, warc_ts: timestamp, html: binary,
          text: string, lang: string)

Planted duplicate classes (FIXTURES.md §1, mirroring the duplicate
kinds the reference's three passes target, reference
processors/dedup.py:1-9):

    exact            — identical text, different url/ts
    ws_case          — case flips + whitespace-run noise (caught by
                       exact hash *after* normalize_text)
    ocr_noise        — 1-3% char substitutions + repeated-char runs +
                       decorative rules (MinHash/LSH territory)
    reformat         — paragraph reflow / <=20% sentence reorder
                       (SimHash Hamming-ball territory)
    boilerplate      — same body, different site chrome (MinHash + LCS)
    nearmiss         — shared boilerplate, different body: must NOT
                       pair (the no-false-positive case,
                       reference tests/test_dedup.py:53-70)

Ground truth: truth_pairs(url1, url2, dup_class) with url1 < url2 and
truth_clusters(url, cluster_id). Host pool is Zipf-skewed (one host ~
20% of rows) to exercise host-domain skew handling.

Everything is seeded — same (n_pages, seed) => byte-identical corpus.
"""

from __future__ import annotations

import html as html_mod
import itertools
from dataclasses import dataclass, field

import numpy as np
import pandas as pd

_BASE_WORDS = (
    "the of and to in a is that for with on as by at from this be are was "
    "were it an or which not but all can had has have one their there so "
    "data web page crawl corpus document text content model train token "
    "filter quality language score count hash shard batch stream record "
    "table column value index search query result match cluster pair near "
    "duplicate exact similar distance metric sample random uniform skew "
    "partition shuffle join group sort limit window frame state checkpoint "
    "snapshot commit resume lineage metric byte second throughput scale"
).split()

# Zipfian vocabulary ~4k types: real webtext vocabulary is large and
# heavy-tailed; a tiny vocab makes unrelated documents collide in
# token-feature space (SimHash) which no real corpus does.
_WORDS = _BASE_WORDS + [
    f"{w}{suffix}"
    for suffix in ("er", "ing", "ed", "ly", "ism", "ous", "al", "ic", "ure",
                   "ate", "ive", "ion", "est", "ment", "ful", "ity", "ology",
                   "ward", "ship", "less", "ness", "scape", "craft", "work",
                   "field", "stone", "berg", "ford", "ton", "ville", "shire",
                   "dale", "brook", "haven", "wood", "gate", "port", "mark",
                   "land", "fall", "rise", "morph", "tron", "plex", "gram")
    for w in _BASE_WORDS
]

# 1/rank Zipf weights, deterministic
import numpy as _np  # noqa: E402

_ZIPF_CDF = _np.cumsum(1.0 / _np.arange(1, len(_WORDS) + 1) ** 1.05)
_ZIPF_CDF /= _ZIPF_CDF[-1]

_SENT_LEN = (6, 16)
_PARA_SENTS = (4, 9)
_DOC_PARAS = (3, 10)  # ~2.5 KB avg text — realistic web-page body size

_HOSTS_TAIL = [f"site{i:03d}.example.org" for i in range(50)]
_HOT_HOST = "mega-portal.example.com"  # ~20% of rows

_BOILERPLATES = [
    ("Home News Sports About Contact", "Copyright 2024 All rights reserved"),
    ("Menu Login Register Search", "Privacy Policy Terms of Service"),
    ("Breaking Latest Trending Archive", "Follow us on social media"),
    ("Shop Deals Categories Cart", "Free shipping on orders over 50"),
]


@dataclass
class SynthCorpus:
    pages: pd.DataFrame
    truth_pairs: pd.DataFrame
    truth_clusters: pd.DataFrame
    stats: dict = field(default_factory=dict)


def _sentence(rng: np.random.RandomState, topic: np.ndarray) -> str:
    """Mix of global head words (stopword-like, shared by all docs) and
    doc-specific topic words — the structure of real webtext: shared
    function words, distinct content vocabulary per page."""
    n = rng.randint(*_SENT_LEN)
    head = np.searchsorted(_ZIPF_CDF, rng.rand(n) * 0.35)  # head of the zipf
    content = topic[rng.randint(0, len(topic), n)]
    use_head = rng.rand(n) < 0.45
    words = [_WORDS[h] if uh else _WORDS[c] for h, c, uh in zip(head, content, use_head)]
    words[0] = words[0].capitalize()
    return " ".join(words) + "."


def _paragraph(rng: np.random.RandomState, topic: np.ndarray) -> str:
    return " ".join(_sentence(rng, topic) for _ in range(rng.randint(*_PARA_SENTS)))


def _doc_text(rng: np.random.RandomState) -> str:
    # each document draws its content words from its own ~150-type
    # topic slice of the tail vocabulary
    topic = rng.randint(len(_BASE_WORDS), len(_WORDS), 150)
    return "\n\n".join(
        _paragraph(rng, topic) for _ in range(rng.randint(*_DOC_PARAS))
    )


def _ocr_noise(text: str, rng: np.random.RandomState) -> str:
    """1-3% char substitutions + a repeated-char run + a decorative rule
    (noise classes per reference processors/chunker.py:26-29)."""
    chars = list(text)
    # 0.5-1.2% substitutions keeps true shingle-Jaccard >= ~0.88 — the
    # class the reference's own minhash config (J>=0.80) reliably
    # catches; heavier noise is undetectable at the same config for
    # BOTH engines and would make the recall target meaningless.
    n_sub = max(1, int(len(chars) * rng.uniform(0.005, 0.012)))
    subs = "abcdefghijklmnopqrstuvwxyz "
    for i in rng.randint(0, len(chars), n_sub):
        chars[i] = subs[rng.randint(0, len(subs))]
    noisy = "".join(chars)
    pos = rng.randint(0, max(1, len(noisy)))
    noisy = noisy[:pos] + "-" * rng.randint(10, 20) + noisy[pos:]
    if rng.rand() < 0.5:
        noisy += "\n" + "=" * rng.randint(8, 30)
    return noisy


def _ws_case(text: str, rng: np.random.RandomState) -> str:
    chars = []
    for ch in text:
        if ch.isalpha() and rng.rand() < 0.2:
            chars.append(ch.upper() if ch.islower() else ch.lower())
        elif ch == " " and rng.rand() < 0.1:
            chars.append("  " if rng.rand() < 0.7 else " \t")
        else:
            chars.append(ch)
    return ("  " if rng.rand() < 0.5 else "") + "".join(chars) + ("\n" if rng.rand() < 0.5 else "")


def _reformat(text: str, rng: np.random.RandomState) -> str:
    """Paragraph reflow + reorder of <=20% of sentences."""
    sents = [s for p in text.split("\n\n") for s in p.split(". ")]
    n_swap = max(1, int(len(sents) * 0.1))
    for _ in range(n_swap):
        i = rng.randint(0, max(1, len(sents) - 1))
        j = min(i + 1, len(sents) - 1)
        sents[i], sents[j] = sents[j], sents[i]
    # reflow into different paragraph boundaries
    out, k = [], 0
    while k < len(sents):
        step = rng.randint(2, 6)
        out.append(". ".join(sents[k : k + step]))
        k += step
    return "\n\n".join(out)


def _wrap_html(title: str, text: str, boiler: tuple[str, str]) -> bytes:
    paras = "".join(f"<p>{html_mod.escape(p)}</p>" for p in text.split("\n\n"))
    doc = (
        f"<html><head><title>{html_mod.escape(title)}</title>"
        f"<style>body{{margin:0}}</style></head>"
        f"<body><nav>{boiler[0]}</nav><div>{paras}</div>"
        f"<footer>{boiler[1]}</footer></body></html>"
    )
    return doc.encode("utf-8")


def generate_corpus(
    n_pages: int = 2000,
    seed: int = 42,
    dup_fraction: float = 0.30,
    mega_cluster_size: int = 0,
) -> SynthCorpus:
    """Build the pages table + ground truth.

    ~``dup_fraction`` of rows belong to duplicate classes, cluster
    sizes 2-6 plus an optional mega-cluster (host-skew stressor).
    """
    rng = np.random.RandomState(seed)
    rows: list[dict] = []
    truth_pairs: list[tuple[str, str, str]] = []
    truth_clusters: list[tuple[str, int]] = []
    cluster_seq = itertools.count()

    base_ts = pd.Timestamp("2024-01-01")

    def host_for(i: int) -> str:
        if rng.rand() < 0.20:
            return _HOT_HOST
        return _HOSTS_TAIL[rng.randint(0, len(_HOSTS_TAIL))]

    def add_page(text: str, idx: int, lang: str | None = None) -> str:
        url = f"https://{host_for(idx)}/p/{idx:08d}"
        boiler = _BOILERPLATES[rng.randint(0, len(_BOILERPLATES))]
        title = text.split(".")[0][:60] or "untitled"
        if lang is None:
            lang = "en" if rng.rand() < 0.95 else ("de" if rng.rand() < 0.5 else "fr")
        rows.append(
            {
                "url": url,
                "warc_ts": base_ts + pd.Timedelta(seconds=int(idx) * 97),
                "html": _wrap_html(title, text, boiler),
                "text": text,
                "lang": lang,
            }
        )
        return url

    idx = itertools.count()
    n_dup_budget = int(n_pages * dup_fraction)
    made = 0

    # --- mega cluster (exact + ws_case copies of one base text) ---
    if mega_cluster_size >= 2:
        cid = next(cluster_seq)
        base = _doc_text(rng)
        urls = []
        for _ in range(mega_cluster_size):
            kind = rng.rand()
            if kind < 0.5:
                t = base
            else:
                t = _ws_case(base, rng)
            urls.append(add_page(t, next(idx)))
            made += 1
        urls_sorted = sorted(urls)
        for u in urls_sorted:
            truth_clusters.append((u, cid))
        for a, b in zip(urls_sorted, urls_sorted[1:]):
            truth_pairs.append((a, b, "mega"))

    # --- small duplicate clusters ---
    dup_classes = ["exact", "ws_case", "ocr_noise", "reformat", "boilerplate"]
    while made < n_dup_budget:
        cid = next(cluster_seq)
        size = int(rng.randint(2, 7))
        dclass = dup_classes[rng.randint(0, len(dup_classes))]
        base = _doc_text(rng)
        urls = [add_page(base, next(idx))]
        made += 1
        for _ in range(size - 1):
            if dclass == "exact":
                t = base
            elif dclass == "ws_case":
                t = _ws_case(base, rng)
            elif dclass == "ocr_noise":
                t = _ocr_noise(base, rng)
            elif dclass == "reformat":
                t = _reformat(base, rng)
            else:  # boilerplate: same body, new chrome (html differs; text
                # keeps a small wrapper line so text-level detection is
                # still a near-dup, not exact)
                t = "Site menu home about\n\n" + base + "\n\nCopyright notice " + str(rng.randint(0, 99))
            urls.append(add_page(t, next(idx)))
            made += 1
        su = sorted(urls)
        for u in su:
            truth_clusters.append((u, cid))
        for a, b in itertools.combinations(su, 2):
            truth_pairs.append((a, b, dclass))

    # --- near-miss non-duplicates: shared boilerplate, different body ---
    shared_pre = "Welcome to the portal latest news and updates\n\n"
    n_nearmiss = max(4, n_pages // 50)
    for _ in range(n_nearmiss):
        add_page(shared_pre + _doc_text(rng), next(idx))

    # --- unique filler ---
    while len(rows) < n_pages:
        add_page(_doc_text(rng), next(idx))

    pages = pd.DataFrame(rows)
    tp = pd.DataFrame(truth_pairs, columns=["url1", "url2", "dup_class"])
    tc = pd.DataFrame(truth_clusters, columns=["url", "cluster_id"])
    stats = {
        "n_pages": len(pages),
        "n_truth_pairs": len(tp),
        "n_truth_clusters": tc["cluster_id"].nunique() if len(tc) else 0,
        "hot_host_rows": int((pages["url"].str.contains(_HOT_HOST)).sum()),
    }
    return SynthCorpus(pages=pages, truth_pairs=tp, truth_clusters=tc, stats=stats)


PAGES_SCHEMA = "url string, warc_ts timestamp, html binary, text string, lang string"


def pages_to_spark(spark, corpus: SynthCorpus, partitions: int = 32):
    df = spark.createDataFrame(corpus.pages, schema=PAGES_SCHEMA)
    return df.repartition(partitions, "url")
