"""Crawl-discovery entries (queries/webtext3.py): canonical-URL dedup and
sitemap frontier discovery.

The oracle gate proves cross-engine value identity on the materialized
bytes; these tests pin what it cannot: ground truth vs a pure-python
re-derivation from the SAME collected corpus (a generator bug mirrored
into both engines' inputs would pass the oracle), and that the planted
structure actually bites — multi-member canonical clusters exist, some
pages self-represent, and the frontier is non-empty and host-varying.
"""

import re

from conftest import SF_DIR

from co_new_spark.queries.webtext3 import (_CANON_PAT, _LOC_PAT,
                                           _crawl_pages, _sitemaps,
                                           w_canonical_dedup,
                                           w_sitemap_frontier)


def _pages(spark):
    return [(r.url, bytes(r.html).decode())
            for r in _crawl_pages(spark).collect()]


def test_canonical_clusters_match_python_mirror(spark):
    pages = _pages(spark)
    clusters: dict[str, list[str]] = {}
    for url, html in pages:
        m = re.search(_CANON_PAT, html)
        tgt = m.group(1) if m else url
        clusters.setdefault(tgt, []).append(url)
    want = {t: (len(us), min(us), sum(1 for u in us if u != t))
            for t, us in clusters.items()}
    got = {r.canonical_url: (r.cluster_size, r.rep_url, r.n_aliases)
           for r in w_canonical_dedup(spark, SF_DIR).collect()}
    assert got == want
    sizes = [n for n, _, _ in want.values()]
    assert max(sizes) > 1          # dedup actually collapses something
    assert min(sizes) == 1         # and some pages self-represent
    assert any(a > 0 for _, _, a in want.values())  # param aliases exist


def test_sitemap_frontier_matches_python_mirror(spark):
    pages = _pages(spark)
    crawled = {re.sub(r"\?.*$", "", u) for u, _ in pages}
    want = {}
    for r in _sitemaps(spark).collect():
        locs = set(re.findall(_LOC_PAT, bytes(r.xml).decode()))
        n_crawled = sum(1 for x in locs if x in crawled)
        want[r.host] = (len(locs), n_crawled, len(locs) - n_crawled)
    got = {r.host: (r.n_listed, r.n_crawled, r.n_frontier)
           for r in w_sitemap_frontier(spark, SF_DIR).collect()}
    assert got == want
    frontiers = {f for _, _, f in want.values()}
    assert max(frontiers) > 0      # planted undiscovered urls exist
    assert len(frontiers) > 1      # and the tail size varies per host
    # every crawled slot of every host is listed: n_crawled == base slots
    assert all(c == 100 for _, c, _ in want.values())


def test_domain_pld_matches_python_mirror(spark):
    from urllib.parse import urlparse

    from co_new_spark.queries.webtext3 import (_PLD_K, _PSL, _pld_pages,
                                               w_domain_pld)
    urls = [r.url for r in _pld_pages(spark).collect()]
    rolled: dict[tuple[str, str], list[str]] = {}
    saw_multilabel_win = saw_fallback = False
    for u in urls:
        host = urlparse(u).hostname
        ls = host.split(".")
        best = None
        for k in range(1, _PLD_K + 1):
            if len(ls) > k and ".".join(ls[-k:]) in _PSL:
                best = (k, ".".join(ls[-k:]), ls[-k - 1])
        if best:
            k, suf, reg = best
            if k > 1:
                saw_multilabel_win = True
            pld = f"{reg}.{suf}"
        else:
            saw_fallback = True
            suf = ls[-1]
            pld = ".".join(ls[-2:]) if len(ls) >= 2 else host
        rolled.setdefault((pld, suf), []).append(host)
    want = {key: (len(hs), len(set(hs))) for key, hs in rolled.items()}
    got = {(r.pld, r.public_suffix): (r.n_urls, r.n_hosts)
           for r in w_domain_pld(spark, SF_DIR).collect()}
    assert got == want
    assert saw_multilabel_win   # a com.co-style suffix beat the last label
    assert saw_fallback         # the unknown-TLD "*" rule fired
