"""The queries/ package split (VERDICT r5 #7) must preserve the
registry EXACTLY: same names, same registration order, same oracle
SQL. The committed snapshot pins it; regenerate with
``python tools/registry_snapshot.py --write`` when adding queries."""

import json
from pathlib import Path

from tools.registry_snapshot import snapshot

FIXTURE = Path(__file__).parent / "fixtures" / "registry_snapshot.json"


def test_registry_matches_committed_snapshot():
    want = json.loads(FIXTURE.read_text())
    got = snapshot()
    assert got["registration_order"] == want["registration_order"]
    assert got["oracles_md5"] == want["oracles_md5"]
    assert got["n_queries"] == want["n_queries"]


def test_every_query_has_an_oracle_or_documented_exemption():
    from zzzarchived_arxiv_fulltext_spark.queries import ORACLES, QUERIES

    assert set(ORACLES) <= set(QUERIES)
    # currently every registered query carries a SQL twin
    assert set(QUERIES) == set(ORACLES)


def test_staleness_rotation_reads_repo_root_evidence():
    """The driver-evidence rotation must glob CORRECTNESS_r*.json at
    the REPO root — after the r6 package split it silently globbed the
    package dir, rotated nothing, and the r6 driver sample came out as
    exactly REGISTRATION_ORDER[:50]."""
    from zzzarchived_arxiv_fulltext_spark import queries as qpkg

    root = Path(qpkg.__file__).resolve().parent.parent.parent
    files = sorted(root.glob("CORRECTNESS_r*.json"))
    assert files, "repo root evidence files must be visible"
    # a query with r6 driver evidence must not outrank one that has
    # never been driver-checked
    order = list(qpkg.QUERIES)
    assert order.index("ps_text_extraction") < order.index(
        "avg_word_length")
    assert order != list(qpkg.REGISTRATION_ORDER)
