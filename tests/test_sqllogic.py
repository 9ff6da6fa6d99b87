"""Run reference sqllogictest files directly against the engine
(reference test strategy, SURVEY.md section 4; runner in
ddb_tpu/testing/sqllogic.py).  The allowlist holds files that pass fully
today and grows round over round."""

import os

import pytest

import ddb_tpu
from ddb_tpu.testing.sqllogic import run_file

REF = "/root/reference"

ALLOWLIST = [
    "test/sql/join/inner/test_join.test",
    "test/sql/aggregate/group/test_group_null.test",
    "test/sql/types/null/test_null_aggr.test",
    "test/sql/join/inner/join_cross_product.test",
    "test/sql/join/inner/not_between_is_null.test",
    "test/sql/join/inner/test_eq_ineq_join.test",
    "test/sql/join/inner/test_range_join.test",
    "test/sql/aggregate/group/test_group_by_error.test",
    "test/sql/aggregate/group/test_group_by_large_string.test",
    "test/sql/aggregate/group/test_group_by_multi_column.test",
    "test/sql/order/negative_offset.test",
    "test/sql/select/test_select_into.test",
    "test/sql/select/test_select_locking.test",
    "test/sql/update/null_update_merge.test",
    "test/sql/update/null_update_merge_transaction.test",
    "test/sql/delete/test_delete.test",
    "test/sql/insert/insert_rollback.test",
    "test/sql/cte/insert_cte_bug_3417.test",
    "test/sql/cte/recursive_cte_error.test",
]

pytestmark = pytest.mark.skipif(not os.path.exists(REF),
                                reason="reference tree unavailable")


@pytest.mark.parametrize("rel", ALLOWLIST)
def test_sqllogic_file(rel):
    con = ddb_tpu.connect()
    r = run_file(con, os.path.join(REF, rel))
    assert r.skipped_reason is None, r.skipped_reason
    assert not r.failures, r.failures[:3]
    assert r.ran > 0
