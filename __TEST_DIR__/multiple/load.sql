COPY tbl_2 FROM '__TEST_DIR__/multiple/tbl_2.csv' (DELIMITER ',', HEADER true);
