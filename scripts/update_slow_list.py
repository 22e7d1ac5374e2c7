"""Regenerate tests/slow_tests.txt from a pytest --durations report.

Usage:
    python -m pytest tests/ -q --durations=0 2>&1 | tee /tmp/durations.txt
    python scripts/update_slow_list.py /tmp/durations.txt [threshold_s]

Parses the "slowest durations" block (lines like
``12.34s call     tests/test_x.py::test_y``), keeps `call` phases at or
above the threshold (default 10 s), and writes the node ids to
tests/slow_tests.txt — the list conftest.pytest_collection_modifyitems
reads to add the ``slow`` marker, so `pytest -m "not slow"` stays the
<5-minute in-session selection on the 1-core dev box.
"""

import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    src = sys.argv[1] if len(sys.argv) > 1 else "/tmp/durations.txt"
    threshold = float(sys.argv[2]) if len(sys.argv) > 2 else 10.0
    rows = []
    for line in open(src):
        m = re.match(r"\s*([\d.]+)s\s+call\s+(\S+)", line)
        if m and float(m.group(1)) >= threshold:
            rows.append((float(m.group(1)), m.group(2)))
    rows.sort(reverse=True)
    out = os.path.join(REPO, "tests", "slow_tests.txt")
    with open(out, "w") as fh:
        fh.write(
            "# node ids marked `slow` (call time >= "
            f"{threshold:.0f}s on the 1-core dev box).\n"
            "# Regenerate: pytest -q --durations=0 | tee /tmp/durations.txt;\n"
            "#             python scripts/update_slow_list.py\n"
        )
        for dur, nid in rows:
            fh.write(f"{nid}\n")
    print(f"wrote {out}: {len(rows)} slow tests (>= {threshold}s)")


if __name__ == "__main__":
    main()
