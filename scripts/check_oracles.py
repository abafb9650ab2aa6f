"""Self-check: replay the driver's correctness gate locally.

For every key in `__spark_entry__.queries()` that has an entry in
`oracle_sql()`, run the Spark query and the DuckDB oracle on the same
sf-dir parquet tables and compare: row count, column-name set, and an
order-insensitive value hash (columns sorted by name, rows sorted,
values canonicalised). Prints one line per query and a final summary.

Usage: python scripts/check_oracles.py [sf_dir] [only_query ...]
"""

from __future__ import annotations

import math
import os
import sys
from datetime import date, datetime
from decimal import Decimal

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

import __spark_entry__ as entrymod
from udacity_capstone_data_engineering_spark import get_spark

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def canon(v):
    """Canonicalise a cell so Spark and DuckDB values compare equal."""
    if v is None:
        return None
    if isinstance(v, Decimal):
        v = float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # round to tame float-path differences between engines
        return round(v, 6)
    if isinstance(v, datetime):
        return v.replace(tzinfo=None).isoformat(sep=" ")
    if isinstance(v, date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(canon(x) for x in v)
    if isinstance(v, bytearray):
        return bytes(v)
    return v


def table_sig(cols, rows):
    cols = list(cols)
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    sorted_cols = [cols[i] for i in order]
    body = sorted(
        tuple(repr(canon(r[i])) for i in order) for r in rows
    )
    return sorted_cols, len(rows), hash(tuple(map(tuple, body)))


def stable_sig(cols, rows) -> str:
    """Cross-process-stable digest of the canonicalized result (the
    in-process ``hash()`` above is PYTHONHASHSEED-salted — fine for the
    same-process compare, useless for a committed manifest). Same
    canonicalization: columns sorted by name, rows sorted, cells
    canon()'d."""
    import hashlib

    cols = list(cols)
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    h = hashlib.sha256()
    h.update(repr([cols[i] for i in order]).encode())
    for row in sorted(tuple(repr(canon(r[i])) for i in order) for r in rows):
        h.update(repr(row).encode())
    return h.hexdigest()


def main():
    argv = list(sys.argv[1:])
    manifest_path = None
    if "--manifest" in argv:
        i = argv.index("--manifest")
        manifest_path = argv[i + 1]
        del argv[i : i + 2]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    only = set(argv[1:])
    spark = get_spark()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    skipped = []
    manifest: dict[str, dict] = {}
    names = [k for k in queries if not only or k in only]
    for name in names:
        if name not in oracles:
            if manifest_path is not None:
                # rows-only entries still get a drift-diffable digest
                try:
                    sdf = queries[name](spark, sf_dir)
                    rows = [tuple(r) for r in sdf.collect()]
                    manifest[name] = {
                        "rows": len(rows),
                        "sha256": stable_sig(sdf.columns, rows),
                        "oracle": False,
                    }
                except Exception as exc:  # noqa: BLE001
                    failures.append((name, f"ERROR {type(exc).__name__}: {exc}"))
                    print(f"FAIL  {name}: {type(exc).__name__}: {exc}")
                    continue
            skipped.append(name)
            continue
        try:
            sdf = queries[name](spark, sf_dir)
            s_cols = sdf.columns
            s_rows = [tuple(r) for r in sdf.collect()]
            d = con.execute(oracles[name])
            d_cols = [c[0] for c in d.description]
            d_rows = [tuple(r) for r in d.fetchall()]
        except Exception as exc:  # noqa: BLE001
            failures.append((name, f"ERROR {type(exc).__name__}: {exc}"))
            print(f"FAIL  {name}: {type(exc).__name__}: {exc}")
            continue
        sc, sn, sh = table_sig(s_cols, s_rows)
        dc, dn, dh = table_sig(d_cols, d_rows)
        if manifest_path is not None:
            manifest[name] = {
                "rows": sn,
                "sha256": stable_sig(s_cols, s_rows),
                "oracle": True,
            }
        if sc != dc:
            failures.append((name, f"schema {sc} != {dc}"))
            print(f"FAIL  {name}: schema spark={sc} duckdb={dc}")
        elif sn != dn:
            failures.append((name, f"rows {sn} != {dn}"))
            print(f"FAIL  {name}: rowcount spark={sn} duckdb={dn}")
        elif sh != dh:
            failures.append((name, "value-hash mismatch"))
            print(f"FAIL  {name}: value-hash mismatch ({sn} rows)")
        else:
            print(f"ok    {name} ({sn} rows)")

    print(
        f"\n{len(names) - len(skipped) - len(failures)} matched, "
        f"{len(failures)} failed, {len(skipped)} rows-only (no oracle)"
    )
    if skipped:
        print("rows-only:", " ".join(sorted(skipped)))
    if manifest_path is not None:
        import json

        # A subset run (explicit query names) MERGES into an existing
        # manifest instead of clobbering the full record — new queries
        # can be appended without a full-gate rerun, and the file stays
        # one-digest-per-catalog-query.
        if only and os.path.exists(manifest_path):
            with open(manifest_path) as f:
                prior = json.load(f)
            if prior.get("sf_dir") == sf_dir:
                merged = prior.get("queries", {})
                merged.update(manifest)
                manifest = merged
            else:
                # ADVICE r7: a subset run against a DIFFERENT sf_dir must
                # not silently replace the full one-digest-per-query
                # record with just the subset — divert to a sibling file.
                manifest_path += f".subset-{os.path.basename(sf_dir)}"
                print(
                    f"WARNING: prior manifest is for {prior.get('sf_dir')}; "
                    f"writing subset digests to {manifest_path} instead"
                )
        with open(manifest_path, "w") as f:
            json.dump(
                {"sf_dir": sf_dir, "queries": dict(sorted(manifest.items()))},
                f,
                indent=1,
            )
        print(f"manifest: {manifest_path} ({len(manifest)} digests)")
    if failures:
        sys.exit(1)


if __name__ == "__main__":
    main()
