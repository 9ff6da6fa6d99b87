COPY table1 FROM '__TEST_DIR__/export_enum/table1.csv' (DELIMITER ',', HEADER true);
