"""Regenerate the DRIVER_VERIFIED dict body: for every name passed on the
command line (or currently in DRIVER_VERIFIED with no args), print
`"name": "hash",` lines from the CURRENT source. Run this when promoting
newly-green queries after a round's CORRECTNESS report lands; paste the
output into registry.DRIVER_VERIFIED.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from otus_cpp_11_spark.registry import (  # noqa: E402
    DRIVER_VERIFIED,
    all_queries,
    query_source_hash,
)


def main() -> None:
    qs = all_queries()
    names = sys.argv[1:] or sorted(DRIVER_VERIFIED)
    for name in names:
        print(f'    "{name}": "{query_source_hash(qs[name])}",')


if __name__ == "__main__":
    main()
