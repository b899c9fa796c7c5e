"""Catalog-scan SQL inventory (SURVEY.md §2.1 S3-S5).

The reference delegates scraping to pinned public exporters and selects
which scrapers run (collector/exporters/mysql/mysql-exporter.go:12-48 for
MySQL; postgres_exporter v0.16.0 defaults; oracle-db-appdev-monitoring
defaults plus the one first-party TOML query). This module records that
selection as *data*: engine -> scraper name -> SQL shipped verbatim to the
remote database via JDBC ``query=`` pushdown, exactly the reference's
ship-SQL-verbatim model (SURVEY §4.1).

JDBC can't execute ``SHOW ...`` statements, so the SHOW-based scrapers use
their documented information_schema / performance_schema equivalents.
"""

from __future__ import annotations

# MySQL: the 6 scrapers enabled at mysql-exporter.go:13-15,40-42.
MYSQL_SCRAPERS: dict[str, str] = {
    "global_status": (
        "SELECT VARIABLE_NAME AS variable_name, VARIABLE_VALUE AS variable_value "
        "FROM performance_schema.global_status"
    ),
    "global_variables": (
        "SELECT VARIABLE_NAME AS variable_name, VARIABLE_VALUE AS variable_value "
        "FROM performance_schema.global_variables"
    ),
    "slave_status": (
        "SELECT * FROM performance_schema.replication_connection_status"
    ),
    "info_schema.innodb_cmp": (
        "SELECT page_size, compress_ops, compress_ops_ok, compress_time, "
        "uncompress_ops, uncompress_time FROM information_schema.innodb_cmp"
    ),
    "info_schema.innodb_cmp_mem": (
        "SELECT page_size, buffer_pool_instance, pages_used, pages_free, "
        "relocation_ops, relocation_time FROM information_schema.innodb_cmp_mem"
    ),
    "info_schema.query_response_time": (
        "SELECT TIME AS time, COUNT AS count, TOTAL AS total "
        "FROM information_schema.query_response_time"
    ),
}

# Postgres: representative default-collector surface of postgres_exporter
# v0.16.0 (enabled with no customization at postgres-exporter.go:24-26).
POSTGRES_SCRAPERS: dict[str, str] = {
    "pg_stat_database": (
        "SELECT datid, datname, numbackends, xact_commit, xact_rollback, "
        "blks_read, blks_hit, tup_returned, tup_fetched, tup_inserted, "
        "tup_updated, tup_deleted, deadlocks, temp_files, temp_bytes, "
        "stats_reset FROM pg_stat_database"
    ),
    "pg_stat_activity": (
        "SELECT datname, state, COUNT(*) AS count FROM pg_stat_activity "
        "GROUP BY datname, state"
    ),
    "pg_locks": (
        "SELECT pg_database.datname, tmp.mode, COALESCE(count, 0) AS count "
        "FROM pg_database, "
        "(SELECT database, mode, COUNT(*) AS count FROM pg_locks GROUP BY database, mode) tmp "
        "WHERE pg_database.datid = tmp.database"
    ),
    "pg_replication_slots": (
        "SELECT slot_name, slot_type, active FROM pg_replication_slots"
    ),
    "pg_stat_bgwriter": ("SELECT * FROM pg_stat_bgwriter"),
}

# Oracle: representative defaults of oracle-db-appdev-monitoring
# (DefaultMetricsFile '' -> built-ins, oracle-exporter.go:22) plus the one
# first-party query (custom-metrics.toml:4-16 — see plans/metric_config.py
# for its declarative compilation).
ORACLE_SCRAPERS: dict[str, str] = {
    "sessions": (
        "SELECT status, type, COUNT(*) AS value FROM v$session GROUP BY status, type"
    ),
    "resource": (
        "SELECT resource_name, current_utilization, limit_value FROM v$resource_limit"
    ),
    "activity": (
        "SELECT name, value FROM v$sysstat WHERE name IN "
        "('parse count (total)', 'execute count', 'user commits', 'user rollbacks')"
    ),
    "process": ("SELECT COUNT(*) AS count FROM v$process"),
    "wait_time": (
        "SELECT wait_class, ROUND(time_waited/100, 3) AS time_waited "
        "FROM v$system_wait_class WHERE wait_class <> 'Idle'"
    ),
}

SCRAPERS_BY_ENGINE: dict[str, dict[str, str]] = {
    "mysql": MYSQL_SCRAPERS,
    "postgres": POSTGRES_SCRAPERS,
    "oracle": ORACLE_SCRAPERS,
}


def select_scrapers(engine: str, requested: list[str] | None = None) -> dict[str, str]:
    """Scraper name-filter semantics (mysql-exporter.go:50-70, P4):
    intersection with the requested list; empty/None -> all enabled."""
    scrapers = SCRAPERS_BY_ENGINE[engine]
    if not requested:
        return dict(scrapers)
    return {k: v for k, v in scrapers.items() if k in requested}
