"""Remote Glue Data Catalog adapter for the parameter sink.

Mirrors the reference's AWS integration (Glue.java) against the public
Glue API, with its two defects fixed:

- **pagination** (Glue.java:154-171 reads only the first ``GetTables``
  page, silently skipping tables of any database with > 100 tables):
  :meth:`GlueMetadataCatalog.list_tables` follows ``NextToken`` to the end;
- **12-hour timestamps** are a parquet-sink concern, fixed there.

The update contract is identical to the local store
(:mod:`catalog_sink`): read-modify-write via ``GetTable`` →
``TableInput`` → ``UpdateTable``; table-level parameters upsert
(Glue.java:67-80), column-level parameters delete-then-upsert on the
stats prefix (Glue.java:109-131), columns matched by trimmed name
(Glue.java:103), unknown columns logged and skipped (Glue.java:134-135),
partition keys excluded (Glue.java:89-99).

The client is injected (any object with ``get_table`` / ``get_tables`` /
``update_table`` in boto3's shape): production passes
``boto3.client("glue")`` — import-gated, boto3 is NOT required for the
rest of the engine — tests pass a fake. No network is touched at import
or construction time.
"""

from __future__ import annotations

import logging

logger = logging.getLogger(__name__)

# Table fields UpdateTable accepts; the rest of GetTable's response
# (DatabaseName, CreateTime, CreatedBy, IsRegisteredWithLakeFormation,
# CatalogId, VersionId, ...) is read-only and must be dropped when copying
# — the reference's copyTableToTableInput (Glue.java:174-190) hand-copies
# the same subset.
_TABLE_INPUT_FIELDS = (
    "Name",
    "Description",
    "Owner",
    "LastAccessTime",
    "LastAnalyzedTime",
    "Retention",
    "StorageDescriptor",
    "PartitionKeys",
    "ViewOriginalText",
    "ViewExpandedText",
    "TableType",
    "Parameters",
    "TargetTable",
)


def _table_to_input(table: dict) -> dict:
    return {k: table[k] for k in _TABLE_INPUT_FIELDS if k in table}


class GlueMetadataCatalog:
    """Glue-backed implementation of the catalog parameter sink contract."""

    def __init__(self, client=None, region: str | None = None) -> None:
        if client is None:
            try:
                import boto3
            except ImportError as e:  # pragma: no cover - boto3 not installed
                raise NotImplementedError(
                    "GlueMetadataCatalog needs boto3 (or an injected client "
                    "with get_table/get_tables/update_table)"
                ) from e
            client = boto3.client("glue", region_name=region)
        self._client = client

    def list_tables(self, db: str) -> list[str]:
        """Every table of a database — follows NextToken pagination (the
        reference stops after the first page, Glue.java:154-171)."""
        names: list[str] = []
        kwargs = {"DatabaseName": db}
        while True:
            resp = self._client.get_tables(**kwargs)
            names.extend(t["Name"] for t in resp.get("TableList", []))
            token = resp.get("NextToken")
            if not token:
                return names
            kwargs["NextToken"] = token

    def update_table_metadata(
        self,
        db: str,
        table: str,
        stats_prefix: str,
        table_params: dict[str, str],
        columns_params: dict[str, dict[str, str]],
    ) -> None:
        resp = self._client.get_table(DatabaseName=db, Name=table)
        table_input = _table_to_input(resp["Table"])

        # table-level: plain upsert (Glue.java:67-80)
        params = table_input.setdefault("Parameters", {})
        params.update(table_params)

        # column-level: delete <prefix>* then add; partition keys carry no
        # parameters (Glue.java:89-99); match on trimmed name (Glue.java:103)
        columns = table_input.get("StorageDescriptor", {}).get("Columns", [])
        by_name = {c["Name"].strip(): c for c in columns}
        for col, new_params in columns_params.items():
            entry = by_name.get(col.strip())
            if entry is None:
                logger.error("Column Not Found: %s", col)
                continue
            kept = {
                k: v
                for k, v in entry.get("Parameters", {}).items()
                if not k.startswith(stats_prefix)
            }
            kept.update(new_params)
            entry["Parameters"] = kept

        self._client.update_table(DatabaseName=db, TableInput=table_input)
