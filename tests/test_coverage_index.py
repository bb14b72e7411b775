"""CI-freshness gate for the generated coverage index (VERDICT r8
item 6): COVERAGE.tsv must be regenerable byte-for-byte from the
current queries()/oracle_sql()/SURVEY/CORRECTNESS state, every entry
must carry a SURVEY §2 id, and the gate window must lead with the
least-driver-evidence entries."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools import coverage_index as ci  # noqa: E402


def test_coverage_tsv_fresh():
    text = ci.render(ci.build_rows())
    with open(ci.OUT_PATH) as fh:
        committed = fh.read()
    assert committed == text, (
        "COVERAGE.tsv is stale — rerun tools/coverage_index.py"
    )


def test_every_entry_has_survey_id():
    rows = ci.build_rows()
    missing = [r[1] for r in rows if r[0] == "-"]
    assert not missing, f"queries() keys without a SURVEY §2 row: {missing}"


def test_index_matches_queries():
    import __spark_entry__ as e

    rows = ci.build_rows()
    assert sorted(r[1] for r in rows) == sorted(e.queries())
    oracles = e.oracle_sql()
    for r in rows:
        assert (r[3] == "oracle") == (r[1] in oracles), r


def test_gate_window_freshness_rank():
    """No entry OUTSIDE the 50-entry driver window may have strictly
    less driver evidence than one inside it, except entries inside
    because their code changed this round (grade is stale by
    definition until the next driver run)."""
    import __spark_entry__ as e

    grades = ci.latest_grades()
    order = list(e.queries())
    window = set(order[:50])
    worst_outside = min(
        (grades.get(k, 0) for k in order[50:]), default=99
    )
    # every never-graded entry must be inside the window
    never = [k for k in order if k not in grades]
    assert all(k in window for k in never), (
        f"never-driver-graded entries outside the gate window: "
        f"{[k for k in never if k not in window][:5]}"
    )
    assert worst_outside >= 2  # the window drained everything pre-r2
