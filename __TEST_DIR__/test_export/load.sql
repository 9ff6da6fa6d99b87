COPY integers FROM '__TEST_DIR__/test_export/integers.csv' (DELIMITER ',', HEADER true);
