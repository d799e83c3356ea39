"""The ×N derived-oracle laws (tools/scale_spotcheck.py) pinned in the
regular suite: the spot-check is the ONLY verification the four
oracle-bounded dedup queries get above ×8, so the law derivation
itself must be regression-guarded where the strict oracle still runs.
The suite pins the laws on a ×2 duplication of the small test fixture
(seconds); SPOTCHECK_x64.json is the sf0.1 ×64 campaign artifact.
"""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(__file__)), "tools")
)

from scale_probe import build_xn  # noqa: E402
from scale_spotcheck import CHECKS  # noqa: E402

from tests.conftest import SF_DIR  # noqa: E402


@pytest.fixture(scope="module")
def x2dir(spark):
    return build_xn(spark, 2, base=SF_DIR)


@pytest.mark.parametrize("name", sorted(CHECKS))
def test_x2_law_holds(name, spark, x2dir):
    assert CHECKS[name](spark, x2dir, 2, base=SF_DIR) == []
