"""Data-driven registry emission order (queries._rotated): the driver
certifies only the first 50 emitted queries per round, so the order
must put the stalest official records first and stay deterministic."""

from __future__ import annotations

import json

from urban_pointcloud_processing_spark import queries as Q


def test_certified_rounds_reads_committed_artifacts():
    import os

    cert = Q._certified_rounds()
    # r03 is committed and fully green for its 50 rows; derive the repo
    # root the same way _certified_rounds does (portable checkouts)
    root = os.path.dirname(os.path.dirname(os.path.abspath(Q.__file__)))
    r03 = json.load(open(os.path.join(root, "CORRECTNESS_r03.json")))
    for name in r03:
        assert cert.get(name, -1) >= 3, name


def test_rotation_orders_never_certified_first_and_aligns():
    qs, oracles = Q.queries(), Q.oracle_sql()
    names = list(qs)
    assert names == list(oracles)
    cert = Q._certified_rounds()
    latest = Q._latest_artifact_round()

    def rank(n):
        c = cert.get(n, -1)
        if c < 0 and latest < Q._DEFER_UNTIL_ROUND.get(n, -1):
            return 10**6          # deferred newcomer sorts last
        return c

    ranks = [rank(n) for n in names]
    # non-decreasing certification round along the emission order
    assert ranks == sorted(ranks)
    # the acceptance artifact leads while it lacks a driver row
    if cert.get("pipeline_full", -1) == -1:
        assert names[0] == "pipeline_full"


def test_deferred_newcomers_sort_last_until_their_round_lands(tmp_path):
    """A query in _DEFER_UNTIL_ROUND must not evict stale queries from
    the 50-slot driver window of the round it was added in: it sorts
    LAST until a CORRECTNESS artifact of its round exists, then
    expires into the normal never-certified-first order."""
    assert "url_domains" in Q._DEFER_UNTIL_ROUND  # round-5 newcomer
    art = {"old_q": {"rows_match": True, "schema_match": True,
                     "hash_match": True, "err": None}}
    (tmp_path / "CORRECTNESS_r04.json").write_text(json.dumps(art))
    d = {"old_q": 1, "url_domains": 2, "never_cert": 3}

    names = list(Q._rotated(d, root=str(tmp_path)))
    # never_cert (not deferred) first, certified next, deferred last
    assert names == ["never_cert", "old_q", "url_domains"]

    # the round-5 artifact lands → the deferral expires on its own
    (tmp_path / "CORRECTNESS_r05.json").write_text(json.dumps(art))
    names = list(Q._rotated(d, root=str(tmp_path)))
    assert names[-1] != "url_domains"
    assert set(names[:2]) == {"url_domains", "never_cert"}


def test_certified_rounds_ignores_failed_and_partial_rows(tmp_path):
    """A row with a hash mismatch, an error, or rows_match=False must
    NOT count as certified; hash_match absent (rows-only check) with
    clean rows/schema must count."""
    art = {
        "good": {"rows_match": True, "schema_match": True,
                 "hash_match": True, "err": None},
        "rows_only": {"rows_match": True, "schema_match": True,
                      "hash_match": None, "err": None},
        "hash_bad": {"rows_match": True, "schema_match": True,
                     "hash_match": False, "err": None},
        "errored": {"rows_match": True, "schema_match": True,
                    "hash_match": True, "err": "boom"},
        "rows_bad": {"rows_match": False, "schema_match": True,
                     "hash_match": True, "err": None},
    }
    (tmp_path / "CORRECTNESS_r07.json").write_text(json.dumps(art))
    cert = Q._certified_rounds(root=str(tmp_path))
    assert cert.get("good") == 7
    assert cert.get("rows_only") == 7
    assert "hash_bad" not in cert
    assert "errored" not in cert
    assert "rows_bad" not in cert
