"""TenantSpecificTablesDMLIT + (DDL surface of) TenantSpecificTablesDDLIT
replay (end2end/TenantSpecificTablesDMLIT.java,
BaseTenantSpecificTablesIT.java).

Fixture per BaseTenantSpecificTablesIT.createTables: a MULTI_TENANT parent
(tenant_id, tenant_type_id, id) PK with a quoted lower-case "user" column,
plus a tenant-owned VIEW adding tenant_col with the view predicate
tenant_type_id='abc' (its WHERE column becomes a viewConstant auto-filled
on write), and a second parent/view pair without the type-id column.

JDBC adaptations: tenant connections are Engine.with_tenant(tenant_id)
(the TenantId connection attribute); binds inlined; Phoenix's implicit
scan order replaced with ORDER BY where the IT reads multiple rows.
"""

from __future__ import annotations

import pytest

from tests.conftest import SF_TEST_DIR

TENANT = "tenant1"
TENANT2 = "tenant2"
TYPE_ID = "abc"

PARENT_DDL = (
    'CREATE TABLE parent_mt ("user" VARCHAR, tenant_id VARCHAR NOT NULL, '
    "tenant_type_id VARCHAR(3) NOT NULL, id INTEGER NOT NULL, "
    "CONSTRAINT pk PRIMARY KEY (tenant_id, tenant_type_id, id)) "
    "MULTI_TENANT=true, IMMUTABLE_ROWS=true"
)
TENANT_VIEW_DDL = (
    "CREATE VIEW tenant_v (tenant_col VARCHAR) AS SELECT * FROM parent_mt "
    f"WHERE tenant_type_id= '{TYPE_ID}'"
)
PARENT_NOTYPE_DDL = (
    'CREATE TABLE parent_nt ("user" VARCHAR, tenant_id VARCHAR NOT NULL, '
    "id INTEGER NOT NULL, CONSTRAINT pk PRIMARY KEY (tenant_id, id)) "
    "MULTI_TENANT=true, IMMUTABLE_ROWS=true"
)
TENANT_VIEW_NOTYPE_DDL = (
    "CREATE VIEW tenant_v_nt (tenant_col VARCHAR) AS SELECT * FROM parent_nt"
)


@pytest.fixture(scope="module")
def spark():
    from phoenix_spark.session import get_spark

    return get_spark(
        app_name="phoenix_spark_tests", master="local[8]", shuffle_partitions=8
    )


@pytest.fixture()
def conns(spark, tmp_path):
    """(global, tenant1, tenant2) connections over a fresh warehouse with
    the BaseTenantSpecificTablesIT fixture created."""
    from phoenix_spark.engine import Engine

    g = Engine(spark, sf_dir=SF_TEST_DIR, warehouse=str(tmp_path / "wh"))
    g.sql(PARENT_DDL)
    g.sql(PARENT_NOTYPE_DDL)
    t1 = g.with_tenant(TENANT)
    t1.sql(TENANT_VIEW_DDL)
    t1.sql(TENANT_VIEW_NOTYPE_DDL)
    return g, t1, g.with_tenant(TENANT2)


def seed_parent(g):
    """The three-tenant seed most DML tests start from."""
    g.sql("delete from parent_mt")
    g.sql(
        'upsert into parent_mt (tenant_id, tenant_type_id, id, "user") '
        "values ('AC/DC', 'abc', 1, 'Bon Scott')"
    )
    g.sql(
        'upsert into parent_mt (tenant_id, tenant_type_id, id, "user") '
        f"values ('{TENANT}', '{TYPE_ID}', 1, 'Billy Gibbons')"
    )
    g.sql(
        'upsert into parent_mt (tenant_id, tenant_type_id, id, "user") '
        f"values ('{TENANT}', 'def', 1, 'Billy Gibbons')"
    )


def test_basic_upsert_select(conns):
    # TenantSpecificTablesDMLIT.testBasicUpsertSelect:113 — column-subset
    # upsert through the view auto-fills tenant_id AND the viewConstant
    g, t1, _ = conns
    t1.sql("upsert into tenant_v (id, tenant_col) values (1, 'Cheap Sunglasses')")
    t1.sql("upsert into tenant_v (id, tenant_col) values (2, 'Viva Las Vegas')")
    got = [r.tenant_col for r in t1.sql(
        "select tenant_col from tenant_v where id = 1"
    ).collect()]
    assert got == ["Cheap Sunglasses"]
    # the viewConstant landed on the base row
    got = [tuple(r) for r in g.sql(
        "select tenant_id, tenant_type_id, id from parent_mt ORDER BY id"
    ).collect()]
    assert got == [(TENANT, TYPE_ID, 1), (TENANT, TYPE_ID, 2)]


def test_basic_upsert_select2_tenant_isolation(conns):
    # TenantSpecificTablesDMLIT.testBasicUpsertSelect2:135 — two tenant
    # connections upsert same ids; each sees only its rows; UPSERT SELECT
    # through the view and a projected transform stay tenant-scoped
    g, t1, t2 = conns
    t2.sql(TENANT_VIEW_DDL.replace("tenant_v", "tenant_v2"))
    t1.sql(f"upsert into tenant_v values ('me','{TYPE_ID}',1,'Cheap Sunglasses')")
    t1.sql(f"upsert into tenant_v values ('you','{TYPE_ID}',2,'Viva Las Vegas')")
    t2.sql(f"upsert into tenant_v2 values ('them','{TYPE_ID}',1,'Long Hair')")
    t2.sql(f"upsert into tenant_v2 values ('us','{TYPE_ID}',2,'Black Hat')")

    got = [tuple(r) for r in t1.sql("select * from tenant_v where id = 1").collect()]
    assert [(r[2], r[3]) for r in got] == [(1, "Cheap Sunglasses")]
    got = [tuple(r) for r in t2.sql("select * from tenant_v2 where id = 2").collect()]
    assert [(r[2], r[3]) for r in got] == [(2, "Black Hat")]

    t2.sql("upsert into tenant_v2 select * from tenant_v2")
    got = [tuple(r) for r in t2.sql(
        "select * from tenant_v2 ORDER BY id"
    ).collect()]
    assert [(r[2], r[3]) for r in got] == [(1, "Long Hair"), (2, "Black Hat")]

    t2.sql(
        "upsert into tenant_v2 select 'all', tenant_type_id, id, "
        "'Big ' || tenant_col from tenant_v2"
    )
    got = [tuple(r) for r in t2.sql(
        "select * from tenant_v2 ORDER BY id"
    ).collect()]
    assert [(r[0], r[1], r[2], r[3]) for r in got] == [
        ("all", TYPE_ID, 1, "Big Long Hair"),
        ("all", TYPE_ID, 2, "Big Black Hat"),
    ]
    # tenant1 untouched
    got = [tuple(r) for r in t1.sql("select * from tenant_v ORDER BY id").collect()]
    assert [(r[2], r[3]) for r in got] == [
        (1, "Cheap Sunglasses"), (2, "Viva Las Vegas"),
    ]


def test_join_with_global_table(conns):
    # TenantSpecificTablesDMLIT.testJoinWithGlobalTable:218
    g, t1, _ = conns
    g.sql("create table foo (k INTEGER NOT NULL PRIMARY KEY)")
    g.sql("upsert into foo(k) values(1)")
    t1.sql("upsert into tenant_v (id, tenant_col) values (1, 'Cheap Sunglasses')")
    t1.sql("upsert into tenant_v (id, tenant_col) values (2, 'Viva Las Vegas')")
    got = [r.tenant_col for r in t1.sql(
        "select tenant_col from tenant_v join foo on k=id"
    ).collect()]
    assert got == ["Cheap Sunglasses"]


def test_select_only_sees_tenant_data(conns):
    # TenantSpecificTablesDMLIT.testSelectOnlySeesTenantData:247 — the view
    # filters BOTH the tenant id and the tenant_type_id viewConstant
    g, t1, _ = conns
    seed_parent(g)
    got = [r[0] for r in t1.sql('select "user" from tenant_v').collect()]
    assert got == ["Billy Gibbons"]
    got = [r[0] for r in t1.sql("select count(*) from tenant_v").collect()]
    assert got == [1]


def test_delete_only_deletes_tenant_data(conns):
    # TenantSpecificTablesDMLIT.testDeleteOnlyDeletesTenantData:282
    g, t1, _ = conns
    seed_parent(g)
    count = t1.sql("delete from tenant_v")
    assert count == 1
    assert t1.sql("select * from tenant_v").collect() == []
    got = [r[0] for r in g.sql("select count(*) from parent_mt").collect()]
    assert got == [2]


def test_delete_only_deletes_tenant_data_no_type_id(conns):
    # TenantSpecificTablesDMLIT.testDeleteOnlyDeletesTenantDataWithNoTenantTypeId:355
    g, t1, _ = conns
    g.sql("delete from parent_nt")
    g.sql("upsert into parent_nt (tenant_id, id, \"user\") values ('AC/DC', 1, 'Bon Scott')")
    g.sql(f"upsert into parent_nt (tenant_id, id, \"user\") values ('{TENANT}', 1, 'Billy Gibbons')")
    g.sql(f"upsert into parent_nt (tenant_id, id, \"user\") values ('{TENANT}', 2, 'Billy Gibbons')")
    count = t1.sql("delete from tenant_v_nt")
    assert count == 2
    assert t1.sql("select * from tenant_v_nt").collect() == []
    got = [r[0] for r in g.sql("select count(*) from parent_nt").collect()]
    assert got == [1]


def test_drop_tenant_table_deletes_no_data(conns):
    # TenantSpecificTablesDMLIT.testDropTenantTableDeletesNoData:420
    g, t1, _ = conns
    g.sql("delete from parent_nt")
    g.sql("upsert into parent_nt (tenant_id, id, \"user\") values ('AC/DC', 1, 'Bon Scott')")
    g.sql(f"upsert into parent_nt (tenant_id, id, \"user\") values ('{TENANT}', 1, 'Billy Gibbons')")
    g.sql(f"upsert into parent_nt (tenant_id, id, \"user\") values ('{TENANT}', 2, 'Billy Gibbons')")
    t1.sql("drop view tenant_v_nt")
    got = [r[0] for r in g.sql("select count(*) from parent_nt").collect()]
    assert got == [3]


def test_upsert_select_only_upserts_tenant_data(conns):
    # TenantSpecificTablesDMLIT.testUpsertSelectOnlyUpsertsTenantData:448
    g, t1, _ = conns
    g.sql("delete from parent_mt")
    g.sql('upsert into parent_mt (tenant_id, tenant_type_id, id, "user") '
          "values ('AC/DC', 'aaa', 1, 'Bon Scott')")
    g.sql('upsert into parent_mt (tenant_id, tenant_type_id, id, "user") '
          f"values ('{TENANT}', '{TYPE_ID}', 1, 'Billy Gibbons')")
    g.sql('upsert into parent_mt (tenant_id, tenant_type_id, id, "user") '
          f"values ('{TENANT}', 'def', 2, 'Billy Gibbons')")
    count = t1.sql(
        'upsert into tenant_v(id, "user") select id+100, "user" from tenant_v'
    )
    assert count == 1
    got = [r[0] for r in t1.sql("select count(*) from tenant_v").collect()]
    assert got == [2]


def test_upsert_select_from_different_tenant_view(conns):
    # TenantSpecificTablesDMLIT
    # .testUpsertSelectOnlyUpsertsTenantDataWithDifferentTenantTable:483
    g, t1, _ = conns
    t1.sql(
        "CREATE VIEW tenant_v_def (tenant_col VARCHAR) AS SELECT * FROM "
        "parent_mt WHERE tenant_type_id = 'def'"
    )
    g.sql("delete from parent_mt")
    g.sql('upsert into parent_mt (tenant_id, tenant_type_id, id, "user") '
          "values ('AC/DC', 'aaa', 1, 'Bon Scott')")
    g.sql('upsert into parent_mt (tenant_id, tenant_type_id, id, "user") '
          f"values ('{TENANT}', '{TYPE_ID}', 1, 'Billy Gibbons')")
    g.sql('upsert into parent_mt (tenant_id, tenant_type_id, id, "user") '
          f"values ('{TENANT}', 'def', 2, 'Billy Gibbons')")
    count = t1.sql(
        'upsert into tenant_v(id, "user") '
        'select id+100, "user" from tenant_v_def where id=2'
    )
    assert count == 1
    got = [r[0] for r in t1.sql("select count(*) from tenant_v").collect()]
    assert got == [2]


def test_upsert_values_only_upserts_tenant_data(conns):
    # TenantSpecificTablesDMLIT.testUpsertValuesOnlyUpsertsTenantData:522
    _, t1, _ = conns
    count = t1.sql(
        'upsert into tenant_v (id, "user") values (1, \'Bon Scott\')'
    )
    assert count == 1
    got = [r[0] for r in t1.sql("select count(*) from tenant_v").collect()]
    assert got == [1]


def test_base_table_usable_in_tenant_connection(conns):
    # TenantSpecificTablesDMLIT
    # .testBaseTableCanBeUsedInStatementsInMultitenantConnections:540 —
    # the MULTI_TENANT base resolves in a tenant connection with the
    # implicit tenant filter and implicit tenant fill on write
    _, t1, _ = conns
    assert t1.sql("select * from parent_mt").collect() == []
    t1.sql('upsert into parent_mt (tenant_type_id, id, "user") '
           f"values ('{TYPE_ID}', 1, 'Billy Gibbons')")
    got = [r[0] for r in t1.sql('select "user" from parent_mt').collect()]
    assert got == ["Billy Gibbons"]


def test_tenant_view_invisible_to_other_connections(conns):
    # TenantSpecificTablesDMLIT
    # .testTenantTableCannotBeUsedInStatementsInNonMultitenantConnections:560
    g, t1, t2 = conns
    t1.sql("upsert into tenant_v (id, tenant_col) values (1, 'x')")
    with pytest.raises(ValueError, match="Table undefined"):
        g.sql("select * from tenant_v")
    with pytest.raises(ValueError, match="Table undefined"):
        t2.sql("select * from tenant_v")
    with pytest.raises(ValueError, match="Table undefined"):
        g.sql("upsert into tenant_v (id, tenant_col) values (2, 'y')")


def test_upsert_values_using_view_with_no_where_clause(conns):
    # TenantSpecificTablesDMLIT.testUpsertValuesUsingViewWithNoWhereClause:577
    _, t1, _ = conns
    t1.sql("upsert into tenant_v_nt (id) values (0)")
    got = [r.id for r in t1.sql("select id from tenant_v_nt").collect()]
    assert got == [0]


# --- TenantSpecificTablesDDLIT (the DDL-surface rules) ------------------------


def test_create_tenant_view_twice_fails(conns):
    # TenantSpecificTablesDDLIT.testCreateTenantTableTwice:84
    _, t1, _ = conns
    with pytest.raises(ValueError, match="exists"):
        t1.sql(TENANT_VIEW_DDL)


def test_create_tenant_view_from_non_multitenant_fails(conns):
    # testCreateTenantViewFromNonMultiTenant:95 — TableNotFoundException:
    # a tenant connection resolves only MULTI_TENANT bases
    g, t1, _ = conns
    g.sql("CREATE TABLE plain_g (k VARCHAR NOT NULL, "
          "CONSTRAINT pk PRIMARY KEY (k))")
    with pytest.raises(ValueError, match="Table undefined"):
        t1.sql("CREATE VIEW v_over_plain (col VARCHAR) AS "
               "SELECT * FROM plain_g")


def test_create_table_on_tenant_connection_fails(conns):
    # testCreationOfParentTableFailsOnTenantSpecificConnection:167 —
    # CANNOT_CREATE_TENANT_SPECIFIC_TABLE
    _, t1, _ = conns
    with pytest.raises(ValueError, match="tenant-specific connection"):
        t1.sql('CREATE TABLE t_no ("user" VARCHAR, id INTEGER NOT NULL '
               "PRIMARY KEY DESC)")


def test_drop_parent_on_tenant_connection_fails(conns):
    # testDeletionOfParentTableFailsOnTenantSpecificConnection:159
    _, t1, _ = conns
    with pytest.raises(ValueError, match="Table undefined"):
        t1.sql("DROP TABLE parent_mt")


def test_multitenant_needs_two_pk_columns(conns):
    # testBaseTableWrongFormatWithTenantTypeId:223 —
    # INSUFFICIENT_MULTI_TENANT_COLUMNS
    g, _, _ = conns
    with pytest.raises(ValueError, match="2 PRIMARY KEY"):
        g.sql("CREATE TABLE bad_mt (TENANT_ID VARCHAR NOT NULL PRIMARY KEY, "
              "ID VARCHAR, A INTEGER) MULTI_TENANT=true")


def test_tenant_view_cannot_override_parent_col(conns):
    # testTenantSpecificTableCannotOverrideParentCol:215 —
    # ColumnAlreadyExistsException
    _, t1, _ = conns
    with pytest.raises(ValueError, match="already exist"):
        t1.sql('CREATE VIEW v_clash ("user" INTEGER) AS '
               "SELECT * FROM parent_mt")


def test_drop_parent_with_tenant_views_needs_cascade(conns):
    # testDisallowDropParentTableWithExistingTenantTable:315 +
    # testAllowDropParentTableWithCascadeAndSingleTenantTable:330
    g, t1, _ = conns
    with pytest.raises(ValueError, match="CASCADE"):
        g.sql("DROP TABLE parent_nt")
    g.sql("DROP TABLE parent_nt CASCADE")
    with pytest.raises(Exception, match="Table undefined|no view|NOT_FOUND"):
        t1.sql("SELECT * FROM tenant_v_nt")


def test_tenant_view_add_drop_column(conns):
    # TenantSpecificTablesDDLIT.testAddDropColumn:236 — ALTER VIEW on the
    # tenant view through the tenant connection: add a view column, write
    # through it, then drop another and lose its visibility
    _, t1, _ = conns
    t1.sql("upsert into tenant_v (id, tenant_col) values (1, 'Viva Las Vegas')")
    t1.sql("alter view tenant_v add tenant_col2 char(1) null")
    t1.sql("upsert into tenant_v (id, tenant_col2) values (2, 'a')")
    got = [r[0] for r in t1.sql("select count(*) from tenant_v").collect()]
    assert got == [2]
    got = [r[0] for r in t1.sql(
        "select count(*) from tenant_v where tenant_col2 = 'a'"
    ).collect()]
    assert got == [1]
    t1.sql("alter view tenant_v drop column tenant_col")
    got = [r[0] for r in t1.sql("select count(*) from tenant_v").collect()]
    assert got == [2]
    with pytest.raises(Exception, match="tenant_col|resolve|not found"):
        t1.sql("select tenant_col from tenant_v").collect()


def test_drop_pk_column_not_allowed(conns):
    # testDropOfPKInTenantTablesNotAllowed:274 +
    # testColumnMutationInParentTableWithExistingTenantTable:291 —
    # CANNOT_DROP_PK on PK columns; non-PK drops are allowed
    g, _, _ = conns
    with pytest.raises(ValueError, match="PK|primary key|key column"):
        g.sql("alter table parent_mt drop column id")
    g.sql('alter table parent_mt drop column "user"')  # non-PK: allowed
