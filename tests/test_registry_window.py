"""Driver correctness-window invariants: the first 50 registry entries
(the slice the driver verifies each round) must be exactly the queries
that still need a green CORRECTNESS row, minus the explicit defer list.
"""

WINDOW = 50


def test_unverified_queries_fill_the_driver_window():
    from otus_cpp_11_spark.registry import (
        DRIVER_VERIFIED,
        WINDOW_DEFER,
        all_queries,
    )

    names = list(all_queries())
    first = set(names[:WINDOW])
    want_first = {
        n for n in names if n not in DRIVER_VERIFIED and n not in WINDOW_DEFER
    }
    assert want_first <= first, sorted(want_first - first)
    # the window never wastes slots on already-verified queries while
    # unverified ones wait (defers excluded by intent)
    overflow = len(want_first) > WINDOW
    if not overflow:
        spill = first - want_first
        assert all(n in WINDOW_DEFER or n in DRIVER_VERIFIED for n in spill)

    # defer list only names real, currently-unverified queries
    assert WINDOW_DEFER <= set(names)
    assert not (WINDOW_DEFER & DRIVER_VERIFIED)
