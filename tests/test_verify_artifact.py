"""Artifact lockstep (r7 VERDICT #1, second half): the committed
VERIFY_r{N}.json snapshots must cover the CURRENT registry — a query
registered after the artifact was stamped turns the suite red until the
dual-SF gate is re-run and re-stamped, making a stale artifact
impossible to ship silently. This is the pytest enforcement of
``tools/verify_oracle.py --check-complete``; the logic lives in the
tool, the test just points it at the newest committed snapshots."""

import glob
import os
import re
import sys

import pytest

_ROOT = os.path.join(os.path.dirname(__file__), "..")


def _latest_round_artifacts():
    """All committed VERIFY_r{N}*.json for the HIGHEST round number N
    (earlier rounds legitimately predate newer queries)."""
    paths = glob.glob(os.path.join(_ROOT, "VERIFY_r*.json"))
    by_round: dict[int, list] = {}
    for p in paths:
        m = re.match(r"VERIFY_r(\d+)", os.path.basename(p))
        if m:
            by_round.setdefault(int(m.group(1)), []).append(p)
    if not by_round:
        return []
    return sorted(by_round[max(by_round)])


@pytest.mark.parametrize(
    "artifact",
    _latest_round_artifacts() or [None],
    ids=lambda p: os.path.basename(p) if p else "none",
)
def test_current_round_verify_artifacts_cover_registry(artifact):
    if artifact is None:
        pytest.skip("no VERIFY artifacts committed yet")
    sys.path.insert(0, _ROOT)
    from tools.verify_oracle import check_complete

    assert check_complete(artifact) == 0, (
        f"{os.path.basename(artifact)} is stale relative to the registry "
        "— re-run the dual-SF gate (tools/verify_oracle.py <sf_dir> "
        "--json <artifact>) after the last query lands"
    )
