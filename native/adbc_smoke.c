/* ADBC driver smoke test: open, query, walk the ArrowArrayStream
 * (reference: the capability bar of src/common/adbc/ driver tests). */
#include <assert.h>
#include <stdio.h>
#include <stdlib.h>
#include <string.h>

#include "include/ddb_tpu_adbc.h"

#define OK(x) do { if ((x) != ADBC_STATUS_OK) {                        \
        fprintf(stderr, "FAILED at %s:%d: %s\n", __FILE__, __LINE__,   \
                err.message ? err.message : "");                       \
        return 1; } } while (0)

int main(void) {
    struct AdbcError err;
    memset(&err, 0, sizeof(err));

    struct AdbcDatabase db;
    memset(&db, 0, sizeof(db));
    OK(AdbcDatabaseNew(&db, &err));
    OK(AdbcDatabaseSetOption(&db, "default_null_order", "nulls_last",
                             &err));
    OK(AdbcDatabaseInit(&db, &err));

    struct AdbcConnection con;
    memset(&con, 0, sizeof(con));
    OK(AdbcConnectionNew(&con, &err));
    OK(AdbcConnectionInit(&con, &db, &err));

    struct AdbcStatement stmt;
    memset(&stmt, 0, sizeof(stmt));
    OK(AdbcStatementNew(&con, &stmt, &err));
    OK(AdbcStatementSetSqlQuery(&stmt,
        "CREATE TABLE t AS SELECT * FROM (VALUES "
        "(1, 'alice', 3.5), (2, 'bob', NULL), (3, 'carol', 9.25)) "
        "v(id, name, score)", &err));
    OK(AdbcStatementExecuteQuery(&stmt, NULL, NULL, &err));

    OK(AdbcStatementSetSqlQuery(&stmt,
        "SELECT id, name, score FROM t ORDER BY id", &err));
    struct ArrowArrayStream stream;
    int64_t nrows = 0;
    OK(AdbcStatementExecuteQuery(&stmt, &stream, &nrows, &err));
    assert(nrows == 3);

    struct ArrowSchema schema;
    assert(stream.get_schema(&stream, &schema) == 0);
    assert(strcmp(schema.format, "+s") == 0);
    assert(schema.n_children == 3);
    assert(strcmp(schema.children[0]->format, "l") == 0);
    assert(strcmp(schema.children[1]->format, "u") == 0);
    assert(strcmp(schema.children[2]->format, "g") == 0);
    assert(strcmp(schema.children[1]->name, "name") == 0);

    struct ArrowArray batch;
    assert(stream.get_next(&stream, &batch) == 0);
    assert(batch.release != NULL);
    assert(batch.length == 3 && batch.n_children == 3);
    const int64_t *ids = batch.children[0]->buffers[1];
    assert(ids[0] == 1 && ids[2] == 3);
    const double *scores = batch.children[2]->buffers[1];
    assert(scores[0] == 3.5 && scores[2] == 9.25);
    const uint8_t *svalid = batch.children[2]->buffers[0];
    assert(svalid != NULL);
    assert((svalid[0] >> 1 & 1) == 0);     /* row 1 score is NULL */
    assert((svalid[0] >> 0 & 1) == 1);
    const int32_t *offs = batch.children[1]->buffers[1];
    const char *bytes = batch.children[1]->buffers[2];
    assert(offs[1] - offs[0] == 5);
    assert(strncmp(bytes + offs[0], "alice", 5) == 0);

    /* end of stream */
    struct ArrowArray batch2;
    assert(stream.get_next(&stream, &batch2) == 0);
    assert(batch2.release == NULL);

    batch.release(&batch);
    schema.release(&schema);
    stream.release(&stream);

    OK(AdbcStatementRelease(&stmt, &err));
    OK(AdbcConnectionRelease(&con, &err));
    OK(AdbcDatabaseRelease(&db, &err));
    printf("adbc smoke: OK\n");
    return 0;
}
