COPY a FROM '__TEST_DIR__/export_test/a.csv' (DELIMITER ',', HEADER true);
