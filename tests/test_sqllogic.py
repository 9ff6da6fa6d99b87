"""Run reference sqllogictest files directly against the engine
(reference test strategy, SURVEY.md section 4; runner in
ddb_tpu/testing/sqllogic.py).  The allowlist file holds files that pass
fully today; scripts/triage_sqllogic.py regenerates/extends it by
sweeping whole reference test directories."""

import os

import pytest

import ddb_tpu
from ddb_tpu.testing.sqllogic import run_file

REF = "/root/reference"
HERE = os.path.dirname(__file__)


def _allowlist():
    path = os.path.join(HERE, "sqllogic_allowlist.txt")
    if not os.path.exists(path):
        return []
    return [ln.strip() for ln in open(path)
            if ln.strip() and not ln.startswith("#")]


ALLOWLIST = _allowlist()

pytestmark = pytest.mark.skipif(not os.path.exists(REF),
                                reason="reference tree unavailable")


@pytest.mark.parametrize("rel", ALLOWLIST)
def test_sqllogic_file(rel):
    con = ddb_tpu.connect()
    r = run_file(con, os.path.join(REF, rel))
    assert r.skipped_reason is None, r.skipped_reason
    assert not r.failures, r.failures[:3]
    assert r.ran > 0
