CREATE TABLE a (u UNION(member name 1 VARCHAR, member name 2 BOOLEAN));
