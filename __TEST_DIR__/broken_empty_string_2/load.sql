COPY tbl FROM '__TEST_DIR__/broken_empty_string_2/tbl.csv' (DELIMITER ',', HEADER true);
