"""COVERAGE.md staleness gate (r7 verdict item #3): the doc is the
SURVEY §2 audit trail, and it has drifted in BOTH directions across
rounds (r6: claimed rows the artifact didn't have; r7: claimed
'pending' for entries with green driver rows). Regenerating is one
command — this test makes forgetting it a failure instead of a
verdict footnote."""

import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def test_coverage_md_matches_generator():
    out = subprocess.run(
        [sys.executable, str(REPO / "tools" / "gen_coverage.py")],
        capture_output=True,
        text=True,
        timeout=120,
        check=True,
    ).stdout
    assert out.strip() == (REPO / "COVERAGE.md").read_text().strip(), (
        "COVERAGE.md is stale — regenerate with "
        "`python tools/gen_coverage.py > COVERAGE.md`"
    )
