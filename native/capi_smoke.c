/* C API smoke test: create a table, insert (SQL + appender + prepared),
 * query, and read typed results — the capability bar of the reference's
 * C API examples (reference: examples in src/include/duckdb.h docs). */
#include <assert.h>
#include <stdio.h>
#include <stdlib.h>
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

static void *sumsq_init(void *extra) {
    (void)extra;
    double *st = malloc(sizeof(double));
    *st = 0.0;
    return st;
}

static void sumsq_update(void *state, const ddb_value *arg,
                         void *extra) {
    (void)extra;
    if (!arg->is_null) *(double *)state += arg->d * arg->d;
}

static void sumsq_finalize(void *state, ddb_value *out, void *extra) {
    (void)extra;
    out->d = *(double *)state;
    free(state);
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

    /* config surface: settings registry + open_ext */
    {
        size_t nset = ddb_config_count();
        assert(nset > 10);
        const char *nm = NULL, *de = NULL;
        CHECK(ddb_get_config_flag(0, &nm, &de));
        assert(nm && de && nm[0]);
        ddb_config cfg;
        CHECK(ddb_create_config(&cfg));
        CHECK(ddb_set_config(cfg, "default_null_order", "nulls_first"));
        ddb_database db2;
        char *err = NULL;
        CHECK(ddb_open_ext(NULL, &db2, cfg, &err));
        assert(err == NULL);
        ddb_connection con2;
        CHECK(ddb_connect(db2, &con2));
        ddb_result r2;
        CHECK(ddb_query(con2,
                        "SELECT current_setting('default_null_order')",
                        &r2));
        assert(strcmp(ddb_value_varchar(r2, 0, 0), "nulls_first")
               == 0);
        ddb_destroy_result(&r2);
        ddb_disconnect(&con2);
        ddb_close(&db2);
        ddb_destroy_config(&cfg);
    }

    /* logical types: constructors + result decimal metadata */
    {
        ddb_logical_type lt = ddb_create_decimal_type(12, 3);
        assert(ddb_get_type_id(lt) == DDB_TYPE_DECIMAL);
        assert(ddb_decimal_width(lt) == 12 && ddb_decimal_scale(lt)
               == 3);
        ddb_logical_type ll = ddb_create_list_type(lt);
        assert(ddb_get_type_id(ll) == DDB_TYPE_LIST);
        assert(ddb_get_type_id(ddb_list_type_child_type(ll))
               == DDB_TYPE_DECIMAL);
        ddb_destroy_logical_type(&ll);    /* frees the child too */
        CHECK(ddb_query(con, "SELECT 1.25::DECIMAL(9,2)", &res));
        ddb_logical_type ct = ddb_column_logical_type(res, 0);
        assert(ddb_get_type_id(ct) == DDB_TYPE_DECIMAL);
        assert(ddb_decimal_width(ct) == 9 && ddb_decimal_scale(ct)
               == 2);
        ddb_destroy_logical_type(&ct);
        ddb_destroy_result(&res);
    }

    /* aggregate-function registration */
    {
        CHECK(ddb_register_aggregate_function(
            con, "c_sumsq", sumsq_init, sumsq_update, sumsq_finalize,
            DDB_TYPE_DOUBLE, NULL));
        CHECK(ddb_query(con,
                        "SELECT id % 2 AS g, c_sumsq(score) FROM t "
                        "GROUP BY g ORDER BY g",
                        &res));
        assert(ddb_row_count(res) == 2);
        /* g=0: ids 2 (NULL), 4, 6 -> 6^2 + 9^2; g=1: ids 1, 3, 5 ->
         * 3.5^2 + 4.5^2 + 7.5^2 */
        assert(ddb_value_double(res, 1, 0) == 117.0);
        assert(ddb_value_double(res, 1, 1) == 88.75);
        ddb_destroy_result(&res);
    }

    ddb_disconnect(&con);
    ddb_close(&db);
    printf("capi smoke: OK\n");
    return 0;
}
