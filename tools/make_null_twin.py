#!/usr/bin/env python3
"""Forge a null-bearing twin of a testdata SF dir (VERDICT r9 #3).

The driver has regenerated fixtures with changed schemas/vintages twice;
a regeneration that introduces NULLs (null text, null keys, null scores)
would hit the least()/null-ordering/coalesce dialect class that the
corpus_truncate_docs bug proved survives on fixture luck. This forges
that vintage NOW, deterministically, so the oracle replica can sweep it.

Usage: python3 tools/make_null_twin.py [src_sf_dir] [out_dir]
Defaults: /root/testdata/sf0.001 -> /tmp/nulltwin

Injection is keyed on stable ids (modulo a prime), never RNG, so the
twin is bit-reproducible. Schemas are preserved EXACTLY (pyarrow
passthrough) — events.ts keeps whatever timestamp vintage the source
has, which Registry.t branches on.

  documents:  text NULL @ doc_id%53==0, lang NULL @ %59==0,
              n_chars NULL @ %61==0
  events:     event_type NULL @ event_id%47==0, value NULL @ %43==0,
              user_id NULL @ %101==0, props NULL @ %37==0
  embeddings: embedding NULL @ vec_id%97==0, label NULL @ %89==0
  all other tables: byte-identical copies
"""
import shutil
import sys
from pathlib import Path

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SRC = Path(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001")
OUT = Path(sys.argv[2] if len(sys.argv) > 2 else "/tmp/nulltwin")

RULES = {
    "documents": ("doc_id", {"text": 53, "lang": 59, "n_chars": 61}),
    "events": ("event_id", {"event_type": 47, "value": 43,
                            "user_id": 101, "props": 37}),
    "embeddings": ("vec_id", {"embedding": 97, "label": 89}),
}


def null_out(table: pa.Table, id_col: str, col: str, prime: int) -> pa.Table:
    idx = table.schema.get_field_index(col)
    ids = pc.cast(table[id_col], pa.int64())
    mask = pc.equal(pc.subtract(ids, pc.multiply(
        pc.divide(ids, prime), prime)), 0)
    nulled = pc.if_else(mask, pa.nulls(len(table), table.schema.field(col).type),
                        table[col])
    return table.set_column(idx, table.schema.field(col), nulled)


def main() -> None:
    OUT.mkdir(parents=True, exist_ok=True)
    for f in sorted(SRC.glob("*.parquet")):
        name = f.stem
        dst = OUT / f.name
        if name not in RULES:
            if f.is_dir():
                shutil.copytree(f, dst, dirs_exist_ok=True)
            else:
                shutil.copy2(f, dst)
            print(f"copy  {name}")
            continue
        id_col, cols = RULES[name]
        table = pq.read_table(f)
        for col, prime in cols.items():
            table = null_out(table, id_col, col, prime)
        pq.write_table(table, dst)
        counts = {c: table.column(c).null_count for c in cols}
        print(f"twin  {name}: nulls {counts}")


if __name__ == "__main__":
    main()
