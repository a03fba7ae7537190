"""COVERAGE.md counts must track the tree (generated, not hand-edited).

The cheap half of tools/update_coverage_counts.py --check: the FILE count
is asserted here on every run (a glob can't lie); the collected-test count
is asserted by the script itself (running pytest inside pytest is not).
"""

import re
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def test_coverage_md_file_count_matches_tree():
    doc = (REPO / "COVERAGE.md").read_text()
    m = re.search(r"`tests/` (\d+) tests in (\d+) files", doc)
    assert m, "COVERAGE.md counts phrase missing"
    n_files = len(sorted((REPO / "tests").glob("test_*.py")))
    assert int(m.group(2)) == n_files, (
        f"COVERAGE.md says {m.group(2)} test files, tree has {n_files} — "
        "run python tools/update_coverage_counts.py"
    )
