COPY pk_integers FROM '__TEST_DIR__/fk_constraint/pk_integers.csv' (DELIMITER ',', HEADER true);
COPY fk_integers FROM '__TEST_DIR__/fk_constraint/fk_integers.csv' (DELIMITER ',', HEADER true);
