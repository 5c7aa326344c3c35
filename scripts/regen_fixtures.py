#!/usr/bin/env python
"""Regenerate tests/fixtures/*.json from the corpus fact math.

The fixtures are committed golden outputs; regenerate ONLY when schema.py
fact math intentionally changes (new event types, new templates …), then
eyeball the diff. Selection mirrors the tests: docs with doc_id < 40 at
sf0.001.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from autoextraction_spark import corpus, schema as S  # noqa: E402
from autoextraction_spark.operators.text_extract import extract_text  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
FIXTURES = os.path.join(os.path.dirname(__file__), "..", "tests", "fixtures")
N_DOCS = 40


def doc_ids_and_langs() -> list[tuple[int, str]]:
    import duckdb

    rows = duckdb.sql(
        f"SELECT doc_id, lang FROM '{SF_DIR}/documents.parquet' "
        f"WHERE doc_id < {N_DOCS} ORDER BY doc_id"
    ).fetchall()
    return [(int(d), S.doc_lang(lg)) for d, lg in rows]


def main() -> None:
    docs = doc_ids_and_langs()
    text_rows, triple_rows, event_rows = [], [], []
    for d, lang in docs:
        url = S.page_url(d)
        text_rows.append(
            {"url": url, "text": extract_text(corpus.build_html(d, lang))}
        )
        for rel, subj, obj, obj_canon in S.gold_facts(d, lang):
            row = {
                "url": url, "pred": rel, "subj": subj, "obj": obj,
                "obj_canonical": obj_canon,
            }
            if row not in triple_rows:
                triple_rows.append(row)
        if S.has_event(d, lang):
            etype, vals = S.event_surfaces(d, lang)
            for role, v in zip(S.EVENTS[etype]["roles"], vals):
                event_rows.append(
                    {"url": url, "etype": etype, "role": role, "value": v}
                )
    for name, rows in [
        ("golden_text.json", text_rows),
        ("golden_triples.json", triple_rows),
        ("golden_events.json", event_rows),
    ]:
        with open(os.path.join(FIXTURES, name), "w") as f:
            json.dump(rows, f, ensure_ascii=False, indent=1)
        print(f"{name}: {len(rows)} rows")


if __name__ == "__main__":
    main()
