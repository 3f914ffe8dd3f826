"""Webgraph family (fgcspark/webgraph.py): outlink extraction, host
graph, PageRank vs a dense numpy reference of the same recurrence."""

import numpy as np
import pytest

from fgcspark.session import get_spark
from fgcspark.webgraph import host_linkgraph, host_nodes, pagerank, with_outlinks


@pytest.fixture(scope="module")
def spark():
    return get_spark("test-webgraph")


def _page(url, links):
    head = "".join(f'<link rel="outlink" href="{l}">' for l in links)
    return (url, f"<html><head>{head}</head><body>x</body></html>".encode())


@pytest.fixture(scope="module")
def pages(spark):
    rows = [
        _page("https://a.example/1", ["https://b.example/x", "https://b.example/y"]),
        _page("https://a.example/2", ["https://c.example/x"]),
        _page("https://b.example/1", ["https://a.example/z"]),
        _page("https://www.c.example/1", []),  # dangling host (www-stripped)
    ]
    return spark.createDataFrame(rows, "url string, html binary")


def test_outlinks(pages):
    got = {(r["url"], r["outlink"]) for r in with_outlinks(pages).collect()}
    assert got == {
        ("https://a.example/1", "https://b.example/x"),
        ("https://a.example/1", "https://b.example/y"),
        ("https://a.example/2", "https://c.example/x"),
        ("https://b.example/1", "https://a.example/z"),
    }


def test_host_linkgraph(pages):
    got = {
        (r["src_host"], r["dst_host"]): r["n_links"]
        for r in host_linkgraph(pages).collect()
    }
    assert got == {
        ("a.example", "b.example"): 2,
        ("a.example", "c.example"): 1,
        ("b.example", "a.example"): 1,
    }


def _pr_ref(hosts, edges, d=0.85, iters=10):
    """Dense numpy mirror of the engine recurrence."""
    n = len(hosts)
    ix = {h: i for i, h in enumerate(hosts)}
    outw = np.zeros(n)
    for (s, _), w in edges.items():
        outw[ix[s]] += w
    r = np.full(n, 1.0 / n)
    for _ in range(iters):
        dang = r[outw == 0].sum()
        nxt = np.full(n, (1 - d) / n)
        for (s, t), w in edges.items():
            nxt[ix[t]] += d * r[ix[s]] * (w / outw[ix[s]])
        nxt += d * dang / n
        r = nxt
    return {h: r[ix[h]] for h in hosts}


def test_pagerank_matches_reference(spark, pages):
    got = {
        r["host"]: r["rank"]
        for r in pagerank(host_nodes(pages), host_linkgraph(pages)).collect()
    }
    want = _pr_ref(
        ["a.example", "b.example", "c.example"],
        {
            ("a.example", "b.example"): 2,
            ("a.example", "c.example"): 1,
            ("b.example", "a.example"): 1,
        },
    )
    assert set(got) == set(want)
    for h in want:
        assert got[h] == pytest.approx(want[h], abs=1e-12)
    # total mass conserved
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-12)
    # a receives b's ENTIRE rank (b's only out-edge), while b gets 2/3
    # of a's — a ends up on top; the dangling c stays lowest
    assert got["a.example"] == max(got.values())
    assert got["c.example"] == min(got.values())
