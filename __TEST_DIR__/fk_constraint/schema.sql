CREATE TABLE pk_integers (i INTEGER NOT NULL, PRIMARY KEY (i));
CREATE TABLE fk_integers (j INTEGER, FOREIGN KEY (j) REFERENCES pk_integers (i));
