"""Dataset schema definitions + schema-validating dataset writer.

TPU-native analogue of the reference's warehouse layer (reference:
src/data/schemas.py:4-414 — BigQuery schemas for 5 tables with
clustering/partitioning specs — and src/data/bigquery/data_loader.py:6-322
— batched row loaders, TRUNCATE, query execution).  There is no warehouse
in this stack: datasets are local JSONL/Parquet files; the schemas keep
the same table/column contracts so reference-side data can round-trip,
and the writer validates rows against them.

Column spec: (name, type, mode) with type in {STRING, INT64, FLOAT64,
BOOL, TIMESTAMP} and mode in {REQUIRED, NULLABLE, REPEATED}.
"""

from __future__ import annotations

import json
import os
from typing import Dict, Iterable, List, Optional, Tuple

Column = Tuple[str, str, str]

# Condensed contracts of the reference's 5 warehouse tables
# (schemas.py:4-414; the reference's store_dim has ~165 columns of which
# the recommendation path consumes none — the identity/location/profile
# core is kept, the amenity flag farm is represented by `amenities`).
SCHEMA_DEFINITIONS: Dict[str, List[Column]] = {
    "loyalty_customer_dim": [
        ("cardnumber", "STRING", "REQUIRED"),
        ("cust_code", "STRING", "REQUIRED"),
        ("first_name", "STRING", "NULLABLE"),
        ("last_name", "STRING", "NULLABLE"),
        ("email", "STRING", "NULLABLE"),
        ("state", "STRING", "NULLABLE"),
        ("zip", "STRING", "NULLABLE"),
        ("enrollment_status", "INT64", "REQUIRED"),
        ("activation_date", "TIMESTAMP", "NULLABLE"),
        ("first_transaction_date", "TIMESTAMP", "NULLABLE"),
        ("last_transaction_date", "TIMESTAMP", "NULLABLE"),
        ("lifetime_points", "FLOAT64", "NULLABLE"),
        ("first_transaction_location_id", "STRING", "NULLABLE"),
    ],
    "store_dim": [
        ("location_id", "STRING", "REQUIRED"),
        ("store_type", "STRING", "REQUIRED"),
        ("state", "STRING", "REQUIRED"),
        ("latitude", "FLOAT64", "NULLABLE"),
        ("longitude", "FLOAT64", "NULLABLE"),
        ("location_profile", "STRING", "NULLABLE"),
        ("open_date", "TIMESTAMP", "NULLABLE"),
        ("amenities", "STRING", "REPEATED"),
    ],
    "product_features": [
        ("product_id", "STRING", "REQUIRED"),
        ("product_name", "STRING", "REQUIRED"),
        ("department_code", "STRING", "REQUIRED"),
        ("category_code", "STRING", "REQUIRED"),
        ("size", "STRING", "NULLABLE"),
        ("unit_price", "FLOAT64", "NULLABLE"),
        ("is_hot", "BOOL", "NULLABLE"),
        ("is_cold", "BOOL", "NULLABLE"),
        ("dietary_flags", "STRING", "REPEATED"),
    ],
    "transaction_header_fact": [
        ("store_number", "STRING", "REQUIRED"),
        ("transaction_number", "STRING", "REQUIRED"),
        ("cardnumber", "STRING", "NULLABLE"),
        ("cust_code", "STRING", "NULLABLE"),
        ("transaction_date", "TIMESTAMP", "REQUIRED"),
        ("subtotal", "FLOAT64", "REQUIRED"),
        ("tax", "FLOAT64", "REQUIRED"),
        ("total", "FLOAT64", "REQUIRED"),
        ("item_count", "INT64", "REQUIRED"),
    ],
    "transaction_body_fact": [
        ("store_number", "STRING", "REQUIRED"),
        ("transaction_number", "STRING", "REQUIRED"),
        ("line_number", "INT64", "REQUIRED"),
        ("product_id", "STRING", "REQUIRED"),
        ("quantity", "INT64", "REQUIRED"),
        ("unit_price", "FLOAT64", "REQUIRED"),
        ("extended_price", "FLOAT64", "REQUIRED"),
    ],
}

# Physical-layout hints kept for contract parity (schemas.py:369-414);
# for local parquet they inform file partitioning.
CLUSTERING: Dict[str, List[str]] = {
    "transaction_header_fact": ["cust_code", "store_number"],
    "transaction_body_fact": ["product_id", "store_number"],
}
TIME_PARTITIONING: Dict[str, str] = {
    "transaction_header_fact": "transaction_date",
    "transaction_body_fact": "transaction_date",
}

_PY_TYPES = {
    "STRING": str,
    "INT64": int,
    "FLOAT64": (int, float),
    "BOOL": bool,
    "TIMESTAMP": (int, float, str),
}


def validate_row(table: str, row: Dict) -> List[str]:
    """Schema-validate one row; returns a list of violations (empty=ok)."""
    if table not in SCHEMA_DEFINITIONS:
        return [f"unknown table {table!r}"]
    errors = []
    cols = {c[0]: c for c in SCHEMA_DEFINITIONS[table]}
    for name, ctype, mode in SCHEMA_DEFINITIONS[table]:
        val = row.get(name)
        if val is None:
            if mode == "REQUIRED":
                errors.append(f"{name}: required")
            continue
        if mode == "REPEATED":
            if not isinstance(val, list):
                errors.append(f"{name}: expected list")
            continue
        if not isinstance(val, _PY_TYPES[ctype]):
            errors.append(f"{name}: expected {ctype}, got {type(val).__name__}")
    for name in row:
        if name not in cols:
            errors.append(f"{name}: not in schema")
    return errors


class DatasetWriter:
    """Schema-validating JSONL table writer — the BigQueryLoader analogue
    (data_loader.py:6-322: batched inserts, clear_table, row counting)."""

    def __init__(self, root: str, batch_size: int = 1000,
                 strict: bool = True):
        self.root = root
        self.batch_size = batch_size  # data_loader.py batches of 1000
        self.strict = strict
        os.makedirs(root, exist_ok=True)

    def _path(self, table: str) -> str:
        return os.path.join(self.root, f"{table}.jsonl")

    def insert_rows(self, table: str, rows: Iterable[Dict]) -> int:
        """Append rows; raises on schema violation when strict."""
        n = 0
        with open(self._path(table), "a") as f:
            buf = []
            for row in rows:
                errs = validate_row(table, row)
                if errs:
                    if self.strict:
                        raise ValueError(f"{table} row invalid: {errs}")
                    continue
                buf.append(json.dumps(row))
                n += 1
                if len(buf) >= self.batch_size:
                    f.write("\n".join(buf) + "\n")
                    buf = []
            if buf:
                f.write("\n".join(buf) + "\n")
        return n

    def clear_table(self, table: str) -> None:
        """TRUNCATE analogue (data_loader.py clear_table)."""
        path = self._path(table)
        if os.path.exists(path):
            os.remove(path)

    def count_rows(self, table: str) -> int:
        path = self._path(table)
        if not os.path.exists(path):
            return 0
        with open(path) as f:
            return sum(1 for _ in f)

    def read_rows(self, table: str,
                  where: Optional[callable] = None) -> List[Dict]:
        """Tiny query surface: full scan with an optional row predicate
        (execute_query analogue for local files)."""
        path = self._path(table)
        if not os.path.exists(path):
            return []
        out = []
        with open(path) as f:
            for line in f:
                row = json.loads(line)
                if where is None or where(row):
                    out.append(row)
        return out
