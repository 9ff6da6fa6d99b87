COPY tbl1 FROM '__TEST_DIR__/test_issue_7660/tbl1.csv' (DELIMITER ',', HEADER true);
