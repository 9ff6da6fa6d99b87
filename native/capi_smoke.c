/* C API smoke test: create a table, insert (SQL + appender + prepared),
 * query, and read typed results — the capability bar of the reference's
 * C API examples (reference: examples in src/include/duckdb.h docs). */
#include <assert.h>
#include <stdio.h>
#include <string.h>

#include "include/ddb_tpu_c.h"

#define CHECK(x) do { if ((x) != DDB_SUCCESS) {                       \
        fprintf(stderr, "FAILED at %s:%d\n", __FILE__, __LINE__);     \
        return 1; } } while (0)


static void times_plus(const ddb_value *args, size_t nargs,
                       ddb_value *out, void *extra) {
    (void)extra;
    if (args[0].is_null || args[1].is_null) {
        out->is_null = 1;
        return;
    }
    out->i = args[0].i * 10 + args[1].i;
}

static void half_of(const ddb_value *args, size_t nargs,
                    ddb_value *out, void *extra) {
    (void)nargs; (void)extra;
    if (args[0].is_null) { out->is_null = 1; return; }
    out->d = args[0].d / 2.0;
}

static int squares_fn(const ddb_value *args, size_t nargs,
                      uint64_t row_idx, ddb_value *out_row,
                      size_t ncols, void *extra) {
    (void)extra;
    (void)ncols;
    static char buf[32];
    int64_t n = nargs ? args[0].i : 0;
    if ((int64_t)row_idx >= n) return 0;
    out_row[0].i = (int64_t)row_idx;
    out_row[1].d = (double)(row_idx * row_idx);
    snprintf(buf, sizeof(buf), "sq%llu",
             (unsigned long long)row_idx);
    out_row[2].s = buf;
    return 1;
}

int main(void) {
    ddb_database db;
    ddb_connection con;
    ddb_result res;

    CHECK(ddb_open(NULL, &db));
    CHECK(ddb_connect(db, &con));

    CHECK(ddb_query(con, "CREATE TABLE t (id INTEGER, name VARCHAR,"
                         " score DOUBLE)", NULL));
    CHECK(ddb_query(con, "INSERT INTO t VALUES (1, 'alice', 3.5),"
                         " (2, 'bob', NULL)", NULL));

    /* appender bulk ingest */
    ddb_appender app;
    CHECK(ddb_appender_create(con, "main", "t", &app));
    for (int i = 3; i <= 6; i++) {
        CHECK(ddb_append_int64(app, i));
        CHECK(ddb_append_varchar(app, i % 2 ? "odd" : "even"));
        CHECK(ddb_append_double(app, i * 1.5));
        CHECK(ddb_appender_end_row(app));
    }
    CHECK(ddb_appender_destroy(&app));

    /* prepared statement */
    ddb_prepared ps;
    CHECK(ddb_prepare(con, "SELECT name, score FROM t WHERE id = ?",
                      &ps));
    CHECK(ddb_bind_int64(ps, 1, 4));
    CHECK(ddb_execute_prepared(ps, &res));
    assert(ddb_row_count(res) == 1);
    assert(strcmp(ddb_value_varchar(res, 0, 0), "even") == 0);
    assert(ddb_value_double(res, 1, 0) == 6.0);
    ddb_destroy_result(&res);
    ddb_destroy_prepare(&ps);

    /* aggregate query with typed reads + NULL */
    CHECK(ddb_query(con, "SELECT count(*) c, sum(score) s,"
                         " max(name) m FROM t", &res));
    assert(ddb_column_count(res) == 3);
    assert(ddb_row_count(res) == 1);
    assert(strcmp(ddb_column_name(res, 0), "c") == 0);
    assert(ddb_value_int64(res, 0, 0) == 6);
    assert(ddb_value_double(res, 1, 0) == 3.5 + 4.5 + 6.0 + 7.5 + 9.0);
    assert(strcmp(ddb_value_varchar(res, 2, 0), "odd") == 0);
    ddb_destroy_result(&res);

    CHECK(ddb_query(con, "SELECT score FROM t WHERE id = 2", &res));
    assert(ddb_value_is_null(res, 0, 0));
    ddb_destroy_result(&res);

    /* error surfaces as message, not crash */
    if (ddb_query(con, "SELECT * FROM nope", &res) == DDB_SUCCESS) {
        fprintf(stderr, "expected error for missing table\n");
        return 1;
    }
    if (strlen(ddb_error_message(con)) == 0) {
        fprintf(stderr, "expected non-empty error message\n");
        return 1;
    }

    /* C scalar UDF registration (reference: duckdb_create_scalar_function) */
    CHECK(ddb_register_scalar_function(con, "times_plus", times_plus,
                                       DDB_TYPE_BIGINT, 2, NULL));
    CHECK(ddb_register_scalar_function(con, "half_of", half_of,
                                       DDB_TYPE_DOUBLE, 1, NULL));
    CHECK(ddb_query(con, "SELECT times_plus(id, 3), half_of(score) "
                         "FROM t WHERE id = 1", &res));
    assert(ddb_value_int64(res, 0, 0) == 13);
    assert(ddb_value_double(res, 1, 0) == 3.5 / 2.0);
    ddb_destroy_result(&res);
    CHECK(ddb_query(con, "SELECT times_plus(id, NULL) FROM t WHERE id = 1",
                    &res));
    assert(ddb_value_is_null(res, 0, 0));
    ddb_destroy_result(&res);

    /* C table-function registration (reference:
     * duckdb_create_table_function) */
    {
        const char *tf_names[3] = {"n", "sq", "tag"};
        ddb_type tf_types[3] = {DDB_TYPE_BIGINT, DDB_TYPE_DOUBLE,
                                DDB_TYPE_VARCHAR};
        CHECK(ddb_register_table_function(con, "squares", squares_fn,
                                          tf_names, tf_types, 3, NULL));
        CHECK(ddb_query(con,
                        "SELECT n, sq, tag FROM squares(4) "
                        "WHERE n >= 1 ORDER BY n", &res));
        assert(ddb_row_count(res) == 3);
        assert(ddb_value_int64(res, 0, 0) == 1);
        assert(ddb_value_double(res, 1, 2) == 9.0);
        assert(strcmp(ddb_value_varchar(res, 2, 1), "sq2") == 0);
        ddb_destroy_result(&res);
        CHECK(ddb_query(con,
                        "SELECT sum(sq) FROM squares(10)", &res));
        assert(ddb_value_double(res, 0, 0) == 285.0);
        ddb_destroy_result(&res);
    }

    /* Arrow-layout columnar export */
    {
        CHECK(ddb_query(con,
                        "SELECT id, score, name FROM t ORDER BY id",
                        &res));
        ddb_arrow_column cid, cscore, cname;
        CHECK(ddb_result_arrow_column(res, 0, &cid));
        CHECK(ddb_result_arrow_column(res, 1, &cscore));
        CHECK(ddb_result_arrow_column(res, 2, &cname));
        size_t nr = ddb_row_count(res);
        assert(cid.length == nr && nr >= 2);
        const int64_t *ids = (const int64_t *)cid.data;
        assert(ids[0] == 1 && ids[1] == 2);
        assert(cid.validity == NULL);          /* no NULL ids */
        const double *scores = (const double *)cscore.data;
        assert(scores[0] == 3.5);
        assert(cscore.validity != NULL);       /* row id=2 is NULL */
        assert((cscore.validity[0] >> 1 & 1) == 0);   /* row 1 invalid */
        assert((cscore.validity[0] >> 0 & 1) == 1);
        assert(cname.offsets != NULL);
        const char *bytes = (const char *)cname.data;
        int32_t l0 = cname.offsets[1] - cname.offsets[0];
        assert(l0 == 5);
        assert(strncmp(bytes + cname.offsets[0], "alice",
                       (size_t)l0) == 0);
        ddb_destroy_result(&res);
    }

    ddb_disconnect(&con);
    ddb_close(&db);
    printf("capi smoke: OK\n");
    return 0;
}
