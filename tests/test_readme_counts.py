"""README drift guard (VERDICT r1 item 6): the counts the README states
must match the registry and the test tree, or this test fails and forces
the doc update alongside the code change.
"""

import re
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def test_readme_query_counts_match_registry():
    from otus_cpp_11_spark.registry import all_queries

    qs = all_queries()
    total = len(qs)
    with_oracle = sum(1 for q in qs.values() if q.oracle is not None)
    readme = (REPO / "README.md").read_text()

    m = re.search(r"(\d+) registered queries", readme)
    assert m, "README must state the registered-query count"
    assert int(m.group(1)) == total, f"README says {m.group(1)}, registry has {total}"

    m = re.search(r"(\d+) of (\d+); sketches", readme)
    assert m, "README must state the oracle coverage ratio"
    assert (int(m.group(1)), int(m.group(2))) == (with_oracle, total)


def test_readme_test_count_matches_tree():
    readme = (REPO / "README.md").read_text()
    m = re.search(r"(\d+) test functions", readme)
    assert m, "README must state the test-function count"
    n_funcs = sum(
        len(re.findall(r"^def test_", p.read_text(), re.M))
        for p in (REPO / "tests").glob("*.py")
    )
    assert int(m.group(1)) == n_funcs, f"README says {m.group(1)}, tree has {n_funcs}"
