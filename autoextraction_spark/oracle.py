"""DuckDB oracle-SQL generators for the driver correctness gate.

The synthetic corpus is pure integer arithmetic on ``doc_id`` (schema.py), so
the EXPECTED output of the whole KG pipeline is expressible in ANSI SQL over
the ``documents`` view — the oracle recomputes what the pipeline should emit
without running it. Every literal below is generated from the same Python
constants the Spark side uses; there is a single source of truth.
"""

from __future__ import annotations

from . import schema as S


def sql_str_list(xs: list[str]) -> str:
    items = ", ".join("'" + x.replace("'", "''") + "'" for x in xs)
    return f"[{items}]"


# DuckDB lists are 1-indexed.
_FIRSTS = sql_str_list(S.FIRSTS)
_LASTS = sql_str_list(S.LASTS)
_BASES = sql_str_list(S.ORG_BASES)
_SUFFIXES = sql_str_list(S.ORG_SUFFIXES)
_CITIES = sql_str_list(S.CITIES)
_ZH_P = sql_str_list(S.ZH_PEOPLE)
_ZH_O = sql_str_list(S.ZH_ORGS)
_ZH_C = sql_str_list(S.ZH_CITIES)
_RELS = sql_str_list(S.REL_NAMES)

_PERSON_SUBJ = [i for i, r in enumerate(S.RELATIONS) if r[1] == "person"]
_ORG_OBJ = [i for i, r in enumerate(S.RELATIONS) if r[2] == "org"]
_CITY_OBJ = [i for i, r in enumerate(S.RELATIONS) if r[2] == "city"]
_ALT_RELS = [i for i, r in enumerate(S.RELATIONS) if len(S.EN_TEMPLATES[r[0]]) > 1]


def _in(col: str, idxs: list[int]) -> str:
    return f"{col} IN ({', '.join(str(i) for i in idxs)})"


URL_EXPR = (
    "'https://site' || CAST(CASE WHEN doc_id % 5 = 0 THEN 0 ELSE doc_id % "
    f"{S.N_HOSTS} END AS VARCHAR) || '.example.com/page/' || CAST(doc_id AS VARCHAR)"
)

_DOCS_CTE = (
    "docs AS (SELECT doc_id, CASE WHEN lang = 'zh' THEN 'zh' ELSE 'en' END AS lang "
    "FROM documents)"
)

_FACTS_CTE = (
    "facts AS (SELECT d.doc_id, d.lang, i.i, "
    f"CAST((d.doc_id*7 + i.i*3) % {len(S.RELATIONS)} AS INT) AS rel_idx, "
    "d.doc_id*13 + i.i*5 AS s_raw, d.doc_id*11 + i.i*9 AS o_raw "
    f"FROM docs d CROSS JOIN (SELECT unnest(range({S.MAX_FACTS})) AS i) i "
    f"WHERE i.i < 1 + d.doc_id % {S.MAX_FACTS})"
)


def _person(raw: str) -> str:
    return (
        f"{_FIRSTS}[(({raw}) % 48) % 16 + 1] || ' ' || {_LASTS}[(({raw}) % 48) // 16 + 1]"
    )


def _org(raw: str) -> str:
    return (
        f"{_BASES}[(({raw}) % 48) % 16 + 1] || ' ' || {_SUFFIXES}[(({raw}) % 48) // 16 + 1]"
    )


def _city(raw: str) -> str:
    return f"{_CITIES}[({raw}) % 24 + 1]"


def _subj_expr() -> str:
    return f"""CASE WHEN lang = 'zh' THEN
        CASE WHEN {_in('rel_idx', _PERSON_SUBJ)} THEN {_ZH_P}[s_raw % 12 + 1]
             ELSE {_ZH_O}[s_raw % 12 + 1] END
      ELSE
        CASE WHEN {_in('rel_idx', _PERSON_SUBJ)} THEN {_person('s_raw')}
             ELSE {_org('s_raw')} END
      END"""


def _obj_expr(canonical: bool) -> str:
    variant = (
        f"lang = 'en' AND (doc_id + i) % 6 = 4 AND ((o_raw % 48) // 16) = 0"
        if not canonical
        else "FALSE"
    )
    return f"""CASE WHEN lang = 'zh' THEN
        CASE WHEN {_in('rel_idx', _CITY_OBJ)} THEN {_ZH_C}[o_raw % 12 + 1]
             ELSE {_ZH_O}[o_raw % 12 + 1] END
      ELSE
        CASE WHEN {_in('rel_idx', _CITY_OBJ)} THEN {_city('o_raw')}
             WHEN {variant} THEN {_BASES}[(o_raw % 48) % 16 + 1] || ' Corporation'
             ELSE {_org('o_raw')} END
      END"""


def gold_triples_sql(canonical: bool = False) -> str:
    """Expected distinct (url, pred, subj, obj) of the full pipeline."""
    return f"""WITH {_DOCS_CTE}, {_FACTS_CTE}
SELECT DISTINCT {URL_EXPR} AS url,
       {_RELS}[rel_idx + 1] AS pred,
       {_subj_expr()} AS subj,
       {_obj_expr(canonical)} AS obj
FROM facts"""


def detect_sql() -> str:
    """Expected output of the relation-detection gate (url, rel, rc_score)."""
    alt_cond = (
        f"lang = 'en' AND (doc_id*3 + i) % 4 = 0 AND {_in('rel_idx', _ALT_RELS)}"
    )
    return f"""WITH {_DOCS_CTE}, {_FACTS_CTE},
gated AS (
  SELECT doc_id, lang, rel_idx,
         max(CASE WHEN {alt_cond} THEN 0 ELSE 1 END) AS has_primary
  FROM facts GROUP BY doc_id, lang, rel_idx
)
SELECT {URL_EXPR} AS url,
       {_RELS}[rel_idx + 1] AS rel,
       round(1.0/(1.0 + exp(-(CASE WHEN has_primary = 1 THEN 2.5 ELSE 1.5 END))), 6) AS rc_score
FROM gated"""


def linking_map_sql() -> str:
    """Expected entity-linking output (ent_type, mention, canonical):
    the only planted variants are 'X Corporation' -> 'X Corp' orgs."""
    subj_type = f"CASE WHEN {_in('rel_idx', _PERSON_SUBJ)} THEN 'person' ELSE 'org' END"
    obj_type = f"CASE WHEN {_in('rel_idx', _CITY_OBJ)} THEN 'city' ELSE 'org' END"
    return f"""WITH {_DOCS_CTE}, {_FACTS_CTE},
m AS (
  SELECT DISTINCT {subj_type} AS ent_type, {_subj_expr()} AS mention FROM facts
  UNION
  SELECT DISTINCT {obj_type} AS ent_type, {_obj_expr(False)} AS mention FROM facts
)
SELECT ent_type, mention,
       CASE WHEN ent_type = 'org' AND mention LIKE '% Corporation'
            THEN replace(mention, ' Corporation', ' Corp') ELSE mention END AS canonical
FROM m"""


def _portable_hash(expr: str) -> str:
    return f"CAST(('0x' || substr(md5({expr}), 1, 15)) AS BIGINT)"


def minhash_pairs_sql(threshold: float = 0.8, num_perm: int = 16, bands: int = 8) -> str:
    """Replicates dedup.minhash_dup_pairs on the documents table."""
    r = num_perm // bands
    mh_cols = ", ".join(
        "min({h}) AS mh{k}".format(h=_portable_hash("sh || '#perm%d'" % k), k=k)
        for k in range(num_perm)
    )
    band_rows = " UNION ALL ".join(
        "SELECT id, {b} AS band_idx, md5({parts}) AS band_hash FROM mh".format(
            b=b,
            parts=" || '_' || ".join(
                f"CAST(mh{b * r + j} AS VARCHAR)" for j in range(r)
            ),
        )
        for b in range(bands)
    )
    return f"""WITH toks AS (SELECT doc_id AS id, str_split(text, ' ') AS t FROM documents),
sh AS (SELECT DISTINCT id, t[i.i+1] || ' ' || t[i.i+2] || ' ' || t[i.i+3] AS sh
       FROM toks CROSS JOIN (SELECT unnest(range(4096)) AS i) i
       WHERE i.i <= len(t) - 3),
mh AS (SELECT id, {mh_cols} FROM sh GROUP BY id),
bands AS ({band_rows}),
cand AS (SELECT DISTINCT a.id AS id_a, b.id AS id_b FROM bands a JOIN bands b
         ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash AND a.id < b.id),
sizes AS (SELECT id, count(*) AS n FROM sh GROUP BY id),
inter AS (SELECT c.id_a, c.id_b, count(*) AS n_inter
          FROM cand c JOIN sh a ON a.id = c.id_a
          JOIN sh b ON b.id = c.id_b AND b.sh = a.sh
          GROUP BY c.id_a, c.id_b)
SELECT i.id_a, i.id_b,
       round(i.n_inter * 1.0 / (sa.n + sb.n - i.n_inter), 6) AS jaccard
FROM inter i JOIN sizes sa ON sa.id = i.id_a JOIN sizes sb ON sb.id = i.id_b
WHERE i.n_inter * 1.0 / (sa.n + sb.n - i.n_inter) >= {threshold}"""


def simhash_sql() -> str:
    """Replicates dedup.simhash64 on the documents table."""
    bit_sums = ", ".join(
        f"sum(CASE WHEN (h >> {b}) & 1 = 1 THEN 1 ELSE -1 END) AS b{b}"
        for b in range(60)
    )
    packed = " + ".join(
        f"CASE WHEN b{b} > 0 THEN CAST({2 ** b} AS BIGINT) ELSE CAST(0 AS BIGINT) END"
        for b in range(60)
    )
    return f"""WITH tok AS (SELECT doc_id AS id, unnest(str_split(text, ' ')) AS t FROM documents),
h AS (SELECT id, {_portable_hash("t || '#simhash'")} AS h FROM tok),
agg AS (SELECT id, {bit_sums} FROM h GROUP BY id)
SELECT id, {packed} AS simhash FROM agg"""


def cc_lang_star_sql() -> str:
    """Connected components of the doc—lang bipartite star graph."""
    return """WITH nodes AS (
  SELECT 'd' || CAST(doc_id AS VARCHAR) AS node, lang FROM documents
  UNION ALL
  SELECT DISTINCT 'l' || lang AS node, lang FROM documents
),
mins AS (SELECT lang, min(node) AS component FROM nodes GROUP BY lang)
SELECT n.node, m.component FROM nodes n JOIN mins m USING (lang)"""


def metric_f1_perfect_sql() -> str:
    """MetricF1 row assuming the pipeline is exact: P = R = F1 = 1.0."""
    return f"""WITH {_DOCS_CTE}, {_FACTS_CTE},
g AS (SELECT DISTINCT {URL_EXPR} AS url, {_RELS}[rel_idx + 1] AS pred,
             {_subj_expr()} AS subj, {_obj_expr(False)} AS obj FROM facts)
SELECT CAST(count(*) AS BIGINT) AS correct, CAST(count(*) AS BIGINT) AS output,
       CAST(count(*) AS BIGINT) AS golden,
       1.0 AS precision, 1.0 AS recall, 1.0 AS f1
FROM g"""
