COPY tbl FROM '__TEST_DIR__/broken_empty_string/tbl.csv' (DELIMITER ',', HEADER true);
