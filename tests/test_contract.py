"""Registration-contract audit (no Spark jobs — pure metadata).

Round 4 lost a correctness-board row to silent registration drift
(mm_features). These pins make the contract executable: every query has an
oracle twin, every query key cited in COVERAGE.md exists, and every bench
headliner is a registered query."""

import re

import __spark_entry__ as em


def test_queries_and_oracles_are_twins():
    q, o = em.queries(), em.oracle_sql()
    assert set(q) == set(o), set(q) ^ set(o)
    assert len(q) >= 74


def test_coverage_doc_query_keys_exist():
    q = em.queries()
    text = open("COVERAGE.md").read()
    cited = set(re.findall(r"`(cdc_\w+|docs_\w+|emb_\w+|mm_\w+)`", text))
    missing = {k for k in cited if k not in q}
    # non-query identifiers legitimately use the same prefixes nowhere today;
    # if this fails, either register the query or fix the doc
    assert not missing, missing


def test_bench_headliners_are_registered():
    import bench

    q = em.queries()
    assert [n for n in bench.HEADLINE_QUERIES if n not in q] == []
