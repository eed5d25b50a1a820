#!/usr/bin/env python
"""Executable twin of JdbcSinkSpec's golden-SQL tests.

No database in the build container ever parses the sink's ON-CONFLICT
statements (JdbcSinkSpec records through a java.sql proxy), so this
script runs the SAME frozen literals against DuckDB — a real engine
with Postgres-style `ON CONFLICT ... DO UPDATE ... WHERE excluded...`
support — and asserts the merge semantics the reference implements in
database/src/adapters/accounts.rs:93-193 / access_keys.rs:79-144:

  * COALESCE column merge: a delete-only delta must not null out an
    existing created_by_receipt_id;
  * strict `<` height guard: stale deltas change nothing;
  * issue #68 screen: an implicit-account (64-char id) re-create may
    only update a row that is already deleted.

The literals here MUST equal JdbcSink.{insertDoNothingSql,
accountsUpsertSql, accessKeysUpsertSql} — the ScalaTest golden
assertions pin the Scala side, this script pins that the pinned text
is valid, executable SQL with the right behavior.

Usage: python dev/check_sink_sql.py   (prints OK / raises)
"""
import duckdb

ACCOUNTS_UPSERT = (
    "INSERT INTO accounts (account_id, created_by_receipt_id, "
    "deleted_by_receipt_id, last_update_block_height) VALUES (?, ?, ?, ?) "
    "ON CONFLICT (account_id) DO UPDATE SET "
    "created_by_receipt_id = COALESCE(excluded.created_by_receipt_id, "
    "accounts.created_by_receipt_id), "
    "deleted_by_receipt_id = excluded.deleted_by_receipt_id, "
    "last_update_block_height = excluded.last_update_block_height "
    "WHERE accounts.last_update_block_height < excluded.last_update_block_height "
    "AND NOT (length(excluded.account_id) = 64 "
    "AND excluded.created_by_receipt_id IS NOT NULL "
    "AND excluded.deleted_by_receipt_id IS NULL "
    "AND accounts.deleted_by_receipt_id IS NULL)")

ACCESS_KEYS_UPSERT = (
    "INSERT INTO access_keys (public_key, account_id, created_by_receipt_id, "
    "deleted_by_receipt_id, permission_kind, last_update_block_height) "
    "VALUES (?, ?, ?, ?, ?, ?) "
    "ON CONFLICT (public_key, account_id) DO UPDATE SET "
    "created_by_receipt_id = COALESCE(excluded.created_by_receipt_id, "
    "access_keys.created_by_receipt_id), "
    "deleted_by_receipt_id = excluded.deleted_by_receipt_id, "
    "permission_kind = CASE WHEN excluded.created_by_receipt_id IS NOT NULL "
    "THEN excluded.permission_kind ELSE access_keys.permission_kind END, "
    "last_update_block_height = excluded.last_update_block_height "
    "WHERE access_keys.last_update_block_height < excluded.last_update_block_height")

INSERT_DO_NOTHING = (
    "INSERT INTO blocks (block_height, block_hash) VALUES (?, ?) "
    "ON CONFLICT DO NOTHING")

con = duckdb.connect()

# --- S5: targetless do-nothing -----------------------------------------
con.execute("CREATE TABLE blocks (block_height BIGINT, "
            "block_hash VARCHAR PRIMARY KEY)")
con.execute(INSERT_DO_NOTHING, [1, "B1"])
con.execute(INSERT_DO_NOTHING, [999, "B1"])  # duplicate PK: ignored
assert con.execute("SELECT * FROM blocks").fetchall() == [(1, "B1")]

# --- S7: accounts merge --------------------------------------------------
con.execute("CREATE TABLE accounts (account_id VARCHAR PRIMARY KEY, "
            "created_by_receipt_id VARCHAR, deleted_by_receipt_id VARCHAR, "
            "last_update_block_height BIGINT)")
con.execute(ACCOUNTS_UPSERT, ["alice.near", "R1", None, 100])
con.execute(ACCOUNTS_UPSERT, ["alice.near", None, "R2", 150])  # delete-only
con.execute(ACCOUNTS_UPSERT, ["alice.near", "R0", None, 120])  # stale
assert con.execute("SELECT * FROM accounts").fetchall() == \
    [("alice.near", "R1", "R2", 150)], "COALESCE merge / height guard broken"

imp = "ab" * 32
con.execute(ACCOUNTS_UPSERT, [imp, "R5", None, 200])
con.execute(ACCOUNTS_UPSERT, [imp, "R6", None, 300])   # live: screened (issue #68)
assert con.execute(
    "SELECT created_by_receipt_id, last_update_block_height FROM accounts "
    "WHERE account_id = ?", [imp]).fetchall() == [("R5", 200)], \
    "implicit re-create over a LIVE row must be skipped entirely"
con.execute(ACCOUNTS_UPSERT, [imp, None, "R7", 400])   # delete it
con.execute(ACCOUNTS_UPSERT, [imp, "R8", None, 500])   # re-create over DELETED: applies
assert con.execute(
    "SELECT created_by_receipt_id, deleted_by_receipt_id, "
    "last_update_block_height FROM accounts WHERE account_id = ?",
    [imp]).fetchall() == [("R8", None, 500)], \
    "implicit re-create over a DELETED row must apply and clear the deletion"

# --- S7: access_keys merge ------------------------------------------------
con.execute("CREATE TABLE access_keys (public_key VARCHAR, "
            "account_id VARCHAR, created_by_receipt_id VARCHAR, "
            "deleted_by_receipt_id VARCHAR, permission_kind VARCHAR, "
            "last_update_block_height BIGINT, "
            "PRIMARY KEY (public_key, account_id))")
con.execute(ACCESS_KEYS_UPSERT, ["K1", "alice.near", "R1", None, "FULL_ACCESS", 100])
con.execute(ACCESS_KEYS_UPSERT, ["K1", "alice.near", None, "R2", "FULL_ACCESS", 150])
con.execute(ACCESS_KEYS_UPSERT, ["K1", "alice.near", "R0", None, "FUNCTION_CALL", 120])
assert con.execute("SELECT * FROM access_keys").fetchall() == \
    [("K1", "alice.near", "R1", "R2", "FULL_ACCESS", 150)], \
    "access_keys COALESCE merge / height guard broken"

# Perm no-shadow (mirror twin of the r9 Warehouse.accessKeysCurrent
# fix): a real FUNCTION_CALL perm set by an UPDATE-bearing delta must
# survive a later DELETE-only delta, whose permission_kind slot is the
# FULL_ACCESS placeholder (access_keys.rs:55-64 applies the
# placeholder only when no update ever preceded the delete).
con.execute(ACCESS_KEYS_UPSERT, ["K2", "bob.near", "R3", None, "FUNCTION_CALL", 100])
con.execute(ACCESS_KEYS_UPSERT, ["K2", "bob.near", None, "R4", "FULL_ACCESS", 150])
assert con.execute("SELECT * FROM access_keys WHERE public_key = 'K2'").fetchall() == \
    [("K2", "bob.near", "R3", "R4", "FUNCTION_CALL", 150)], \
    "DELETE-only delta's FULL_ACCESS placeholder shadowed the real permission"

print("OK: all three sink statements parse and merge correctly in DuckDB")
