"""Deterministic synthetic pages table (Common-Crawl-style web pages).

Schema per ``BASELINE.json.input_hint``:
``url: string, warc_ts: timestamp, html: binary, text: string, lang: string``.

Every row is a pure function of its integer row id (seeded md5-based
PRNG), so the Spark generator (``spark.range -> mapInPandas``), the
local pandas generator, and the oracle all see byte-identical content —
the per-row invariant "byte-identical extracted text per url" is
enforced by construction and test-pinned by hashes.

Each page's ``text`` embeds 0..N log-like lines in one of two grammars
drawn from the reference's examples (the page row is the "file", the
url the "filename"):

- **rest.api** — the reference README example line
  (``/root/reference/README.md:198-200``): 16 capture groups, drives
  meters + histograms with ``sub`` cross-group arithmetic.
- **apache** — tab-separated access log per the LogFormat comment at
  ``/root/reference/logmetrics_collector_transform.conf:8-22``:
  6 groups + 1 url-derived group, drives the transform DSL and
  ``divide`` scaling.

A configurable fraction of rest.api lines hit one hot ``call`` bucket
to exercise skew handling.
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass
from datetime import datetime, timedelta, timezone

import numpy as np
import pandas as pd

PAGES_SCHEMA_DDL = "url string, warc_ts timestamp, html binary, text string, lang string"

_EPOCH_2024 = int(datetime(2024, 2, 1, tzinfo=timezone.utc).timestamp())

_REST_CALLS = [
    "session.addItem", "session.removeItem", "user.login", "user.logout",
    "cart.checkout", "search.query", "item.view", "account.update",
]
_REST_TYPES = ["sales", "auth", "search", "inventory"]
_APACHE_PATHS = [
    "/bid/item123?q=1", "/buy/now.php", "/search.php?q=spark", "/list/all",
    "/category/books/fiction", "/sitemap/index.xml", "/info/about.html",
    "/favicon.ico", "/weird/path/bid?x=1", "/unknown/zone/deep/page",
]
_APACHE_VERBS = ["GET", "POST", "HEAD", "COOK"]
_FILLER = [
    "the quick brown fox jumps over the lazy dog",
    "lorem ipsum dolor sit amet consectetur adipiscing elit",
    "web scale analytics engines love columnar storage and arrow",
    "ceci est une ligne de remplissage sans aucune metrique",
    "dies ist eine fuellzeile ohne messwerte im text",
]
_MONTHS = ["Jan", "Feb", "Mar", "Apr", "May", "Jun",
           "Jul", "Aug", "Sep", "Oct", "Nov", "Dec"]


@dataclass(frozen=True)
class SynthSpec:
    n_rows: int = 5000
    seed: int = 42
    n_sites: int = 97  # distinct urls per family
    hot_fraction: float = 0.25  # share of rest lines hitting the hot call key
    match_fraction: float = 0.7  # pages containing >=1 extractable line
    max_lines_per_page: int = 4
    time_span_seconds: int = 3600  # event-time span of the whole table
    out_of_order_fraction: float = 0.05
    base_epoch: int = _EPOCH_2024
    year: int = 2024


def _h(spec_seed: int, row: int, salt: str) -> int:
    """Deterministic 52-bit hash stream per (seed, row, salt)."""
    d = hashlib.md5(f"{spec_seed}:{row}:{salt}".encode()).hexdigest()
    return int(d[:13], 16)


def _go_rfc3164(dt: datetime) -> str:
    """Go layout 'Jan  2 15:04:05' (day space-padded to width 2)."""
    return f"{_MONTHS[dt.month - 1]} {dt.day:2d} {dt.hour:02d}:{dt.minute:02d}:{dt.second:02d}"


def _apache_date(dt: datetime) -> str:
    """Go layout '2/Jan/2006:15:04:05 -0700' (day unpadded)."""
    return f"{dt.day}/{_MONTHS[dt.month - 1]}/{dt.year}:{dt.hour:02d}:{dt.minute:02d}:{dt.second:02d} +0000"


def _rest_line(dt: datetime, seed: int, row: int, j: int, hot_fraction: float) -> str:
    hv = _h(seed, row, f"rest{j}")
    host_n = hv % 7
    rtype = _REST_TYPES[(hv >> 3) % len(_REST_TYPES)]
    if (hv >> 5) % 1000 < int(hot_fraction * 1000):
        call = _REST_CALLS[0]  # hot key
    else:
        call = _REST_CALLS[1 + (hv >> 10) % (len(_REST_CALLS) - 1)]
    bnt_c, bnt_t = (hv >> 14) % 5, (hv >> 17) % 40
    sql_c, sql_t = (hv >> 20) % 8, (hv >> 23) % 30
    mb_c, mb_t = (hv >> 26) % 3, (hv >> 28) % 10
    mc_c, mc_t = (hv >> 30) % 6, (hv >> 32) % 12
    ot_c, ot_t = (hv >> 34) % 2, (hv >> 36) % 8
    local = (hv >> 38) % 50
    total = local + bnt_t + sql_t + mb_t + mc_t + ot_t
    sid = f"s{hv % 0xFFFFFF:06x}"
    return (
        f"{_go_rfc3164(dt)} rest{host_n}.mynetwork rest_{rtype}.api: [INFO] "
        f"[performance] (http-{hv % 4000}-{j}) [c:{call}] [s:{sid}] "
        f"[r:{hv % 99999}]  ({total}) [bnt:{bnt_c}/{bnt_t}] [sql:{sql_c}/{sql_t}] "
        f"[membase:{mb_c}/{mb_t}] [memcache:{mc_c}/{mc_t}] [other:{ot_c}/{ot_t}]"
    )


def _apache_line(dt: datetime, seed: int, row: int, j: int) -> str:
    hv = _h(seed, row, f"apache{j}")
    verb = _APACHE_VERBS[hv % len(_APACHE_VERBS)]
    path = _APACHE_PATHS[(hv >> 2) % len(_APACHE_PATHS)]
    status = [200, 200, 200, 301, 404, 500][(hv >> 6) % 6]
    size = "-" if (hv >> 9) % 10 == 0 else str((hv >> 9) % 50000)
    rtime = "-" if (hv >> 25) % 20 == 0 else str((hv >> 25) % 2_000_000)
    ip = f"10.{(hv >> 4) % 256}.{(hv >> 12) % 256}.{(hv >> 20) % 256}"
    return (
        f"{ip}\t-\t-\t{_apache_date(dt)}\t{verb} {path} HTTP/1.1\t{status}\t{size}"
        f"\thttp://ref.example/\tMozilla/5.0\t{rtime}"
    )


def gen_page(row: int, spec: SynthSpec) -> tuple[str, datetime, bytes, str, str]:
    """Generate one page row deterministically from its row id."""
    family = "rest" if _h(spec.seed, row, "fam") % 2 == 0 else "apache"
    site = _h(spec.seed, row, "site") % spec.n_sites
    if family == "rest":
        url = f"https://rest{site}.mynetwork/perf/{row}"
    else:
        url = f"https://www{site}.apache.example/httpd_access/{row}"

    # event time: forward-moving with jitter, a slice out-of-order
    frac = row / max(spec.n_rows, 1)
    base = spec.base_epoch + int(frac * spec.time_span_seconds)
    jitter = _h(spec.seed, row, "jit") % 7
    if _h(spec.seed, row, "ooo") % 1000 < int(spec.out_of_order_fraction * 1000):
        base -= 20 + _h(spec.seed, row, "oooamt") % 60
    ts = datetime.fromtimestamp(base + jitter, tz=timezone.utc)

    matches = _h(spec.seed, row, "hasmatch") % 1000 < int(spec.match_fraction * 1000)
    n_lines = 1 + _h(spec.seed, row, "nlines") % spec.max_lines_per_page if matches else 0

    lines: list[str] = [_FILLER[_h(spec.seed, row, "fill0") % len(_FILLER)]]
    for j in range(n_lines):
        line_dt = ts + timedelta(seconds=j)
        if family == "rest":
            lines.append(_rest_line(line_dt, spec.seed, row, j, spec.hot_fraction))
        else:
            lines.append(_apache_line(line_dt, spec.seed, row, j))
    lines.append(_FILLER[_h(spec.seed, row, "fill1") % len(_FILLER)])
    # occasionally an over-long junk line (exercises the 2048-byte guard)
    if _h(spec.seed, row, "long") % 100 == 0:
        lines.append("x" * 3000)

    text = "\n".join(lines)
    html = (b"<html><head><title>p</title></head><body><pre>"
            + text.encode("utf-8") + b"</pre></body></html>")
    lang = ["en", "fr", "de"][_h(spec.seed, row, "lang") % 3]
    return url, ts, html, text, lang


def gen_pages_pdf(row_ids, spec: SynthSpec) -> pd.DataFrame:
    rows = [gen_page(int(r), spec) for r in row_ids]
    df = pd.DataFrame(rows, columns=["url", "warc_ts", "html", "text", "lang"])
    df["warc_ts"] = pd.to_datetime(df["warc_ts"], utc=True).dt.tz_localize(None)
    return df


def gen_pages_spark(spark, spec: SynthSpec, num_partitions: int | None = None):
    """Distributed generation: ``spark.range -> mapInPandas`` (Arrow)."""
    parts = num_partitions or spark.sparkContext.defaultParallelism
    rng = spark.range(0, spec.n_rows, 1, parts)

    def gen(batches):
        for pdf in batches:
            yield gen_pages_pdf(pdf["id"].to_numpy(), spec)

    return rng.mapInPandas(gen, schema=PAGES_SCHEMA_DDL)


def write_pages_parquet(spark, spec: SynthSpec, path: str, num_partitions: int | None = None) -> None:
    gen_pages_spark(spark, spec, num_partitions).write.mode("overwrite").parquet(path)


def gen_hosts_lookup_pdf(n_sites: int = 97) -> pd.DataFrame:
    """Broadcast enrichment dimension (FIXTURES.md §2): host -> cluster/dc."""
    return pd.DataFrame(
        {
            "host": [f"www{i}" for i in range(n_sites)],
            "cluster": [f"c{i % 5}" for i in range(n_sites)],
            "dc": [f"dc{i % 3}" for i in range(n_sites)],
        }
    )


def gen_hosts_lookup_dict(n_sites: int = 97) -> dict:
    """Same dimension in the oracle's lookup format."""
    d: dict = {"__columns__": ["cluster", "dc"]}
    for i in range(n_sites):
        d[f"www{i}"] = (f"c{i % 5}", f"dc{i % 3}")
    return d
