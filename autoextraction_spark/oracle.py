"""DuckDB oracle-SQL generators for the driver correctness gate.

The synthetic corpus is pure integer arithmetic on ``doc_id`` (schema.py), so
the EXPECTED output of the whole KG pipeline is expressible in ANSI SQL over
the ``documents`` view — the oracle recomputes what the pipeline should emit
without running it. Every literal below is generated from the same Python
constants the Spark side uses; there is a single source of truth.
"""

from __future__ import annotations

from . import schema as S


def sql_str(x: str) -> str:
    return "'" + x.replace("'", "''") + "'"


def sql_str_list(xs: list[str]) -> str:
    items = ", ".join(sql_str(x) for x in xs)
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


_ZH_SURF = {
    "person": lambda raw: f"{_ZH_P}[({raw}) % 12 + 1]",
    "org": lambda raw: f"{_ZH_O}[({raw}) % 12 + 1]",
    "city": lambda raw: f"{_ZH_C}[({raw}) % 12 + 1]",
}
def _event_rows() -> list[tuple[str, str, dict, str]]:
    """(etype, gate_sql, {role: value_sql}, lang) per event type — the
    single place that knows the per-language event parity math."""
    surf_en = {"person": _person, "org": _org, "city": _city}
    raw_exprs = ["doc_id*17 + 1", "doc_id*19 + 2", "doc_id*23 + 3"]
    out = []
    for lang, names in S.EVENT_NAMES_BY_LANG.items():
        for ei, etype in enumerate(names):
            ev = S.EVENTS[etype]
            surf = surf_en if lang == "en" else _ZH_SURF
            vals = {
                r: surf[t](x)
                for r, t, x in zip(ev["roles"], ev["types"], raw_exprs)
            }
            gate = (
                f"lang = '{lang}' AND doc_id % 4 = 1 "
                f"AND ((doc_id - 1) // 4) % {len(names)} = {ei}"
            )
            out.append((etype, gate, vals, lang))
    return out


def detect_sql() -> str:
    """Expected output of the relation-detection gate (url, rel, rc_score)."""
    alt_cond = (
        f"lang = 'en' AND (doc_id*3 + i) % 4 = 0 AND {_in('rel_idx', _ALT_RELS)}"
    )
    ev_selects = " UNION ALL ".join(
        f"SELECT {URL_EXPR} AS url, '{etype}' AS rel, "
        f"round(1.0/(1.0 + exp(-2.5)), 6) AS rc_score FROM docs WHERE {gate}"
        for etype, gate, _, _ in _event_rows()
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
FROM gated
UNION ALL
{ev_selects}"""


def events_sql() -> str:
    """Expected (url, etype, role, value) of the multi-slot event pipeline
    (en AND zh event sets)."""
    selects = []
    for etype, gate, vals, _ in _event_rows():
        for role, val in vals.items():
            selects.append(
                f"SELECT {URL_EXPR} AS url, '{etype}' AS etype, '{role}' AS role, "
                f"{val} AS value FROM docs WHERE {gate}"
            )
    body = "\nUNION ALL\n".join(selects)
    return f"WITH {_DOCS_CTE}\n{body}"


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


WORD_SHINGLES_CTE = (
    "toks AS (SELECT doc_id AS id, str_split(text, ' ') AS t FROM documents),\n"
    "idx AS (SELECT id, t, unnest(range(greatest(len(t) - 2, 1))) AS i FROM toks),\n"
    "sh AS (SELECT DISTINCT id, array_to_string(t[i+1:i+3], ' ') AS sh FROM idx)"
)


def _minhash_pairs_ctes(
    num_perm: int = 16, bands: int = 8, cand_cond: str = "a.id < b.id"
) -> str:
    """CTE chain ending in ``jac(id_a, id_b, jaccard)`` — shared by the
    pair query, the dedup-cluster query, and (with an asymmetric
    ``cand_cond``) the incremental batch-vs-index query."""
    from .operators.dedup import MINHASH_P, minhash_coeffs

    r = num_perm // bands
    mh_cols = ", ".join(
        f"min(({a} * h + {b}) % {MINHASH_P}) AS mh{k}"
        for k, (a, b) in enumerate(minhash_coeffs(num_perm))
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
    return f"""{WORD_SHINGLES_CTE},
hs AS (SELECT id, {_portable_hash('sh')} % {MINHASH_P} AS h FROM sh),
mh AS (SELECT id, {mh_cols} FROM hs GROUP BY id),
bands AS ({band_rows}),
cand AS (SELECT DISTINCT a.id AS id_a, b.id AS id_b FROM bands a JOIN bands b
         ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash AND ({cand_cond})),
sizes AS (SELECT id, count(*) AS n FROM sh GROUP BY id),
inter AS (SELECT c.id_a, c.id_b, count(*) AS n_inter
          FROM cand c JOIN sh a ON a.id = c.id_a
          JOIN sh b ON b.id = c.id_b AND b.sh = a.sh
          GROUP BY c.id_a, c.id_b),
jac AS (SELECT i.id_a, i.id_b,
               i.n_inter * 1.0 / (sa.n + sb.n - i.n_inter) AS jaccard
        FROM inter i JOIN sizes sa ON sa.id = i.id_a
        JOIN sizes sb ON sb.id = i.id_b)"""


def minhash_pairs_sql(threshold: float = 0.8, num_perm: int = 16, bands: int = 8) -> str:
    """Replicates dedup.minhash_dup_pairs on the documents table."""
    return f"""WITH {_minhash_pairs_ctes(num_perm, bands)}
SELECT id_a, id_b, round(jaccard, 6) AS jaccard
FROM jac WHERE jaccard >= {threshold}"""


def _doc_dedup_ctes(threshold: float = 0.8, num_perm: int = 16, bands: int = 8) -> str:
    """CTE chain ending in ``labeled`` (doc_id, keep_id) — the
    dedup_documents cluster labeling (transitive closure of the minhash
    pair graph), shared by doc_dedup_sql / dup_profile_sql /
    host_profile_sql. Callers must open with WITH RECURSIVE."""
    return f"""{_minhash_pairs_ctes(num_perm, bands)},
pairs AS (SELECT id_a, id_b FROM jac WHERE jaccard >= {threshold}),
sym AS (SELECT id_a AS a, id_b AS b FROM pairs
        UNION SELECT id_b, id_a FROM pairs),
reach(a, b) AS (SELECT a, b FROM sym
                UNION SELECT r.a, s.b FROM reach r JOIN sym s ON r.b = s.a),
comp AS (SELECT a AS id, least(a, min(b)) AS keep FROM reach GROUP BY a),
labeled AS (SELECT d.doc_id, coalesce(c.keep, d.doc_id) AS keep_id
            FROM documents d LEFT JOIN comp c ON c.id = d.doc_id)"""


def doc_dedup_sql(threshold: float = 0.8, num_perm: int = 16, bands: int = 8) -> str:
    """Expected dedup.dedup_documents output: every document labeled with
    the min doc_id of its near-dup cluster (transitive closure of the
    minhash pair graph via a recursive CTE)."""
    return f"""WITH RECURSIVE {_doc_dedup_ctes(threshold, num_perm, bands)}
SELECT doc_id, keep_id,
       CAST(CASE WHEN keep_id = doc_id THEN 1 ELSE 0 END AS BIGINT)
           AS is_canonical
FROM labeled"""


def dup_profile_sql(threshold: float = 0.8) -> str:
    """Expected dedup.dup_profile output over the minhash doc-dedup labels:
    the cluster-size histogram with per-size doc and excess-doc mass."""
    return f"""WITH RECURSIVE {_doc_dedup_ctes(threshold)},
csizes AS (SELECT keep_id, count(*) AS cluster_size FROM labeled GROUP BY keep_id)
SELECT CAST(cluster_size AS BIGINT) AS cluster_size,
       CAST(count(*) AS BIGINT) AS n_clusters,
       CAST(cluster_size * count(*) AS BIGINT) AS n_docs,
       CAST((cluster_size - 1) * count(*) AS BIGINT) AS n_excess
FROM csizes GROUP BY cluster_size"""


def _quality_cte() -> str:
    """CTE chain ending in ``qual`` (doc_id, quality) — the composite
    quality score of textstats.quality_score, composable form of
    quality_sql (exact 0.25 multiples, so averages are float-exact)."""
    from .operators.textstats import PUNCT_RE, STOPWORDS

    stop_alt = "|".join(STOPWORDS)
    punct_re = PUNCT_RE.replace("'", "''")
    return f"""qraw AS (
  SELECT doc_id,
         length(text) AS n_chars,
         len(regexp_split_to_array(text, '\\s+')) AS n_tokens,
         len(regexp_extract_all(text, '{punct_re}')) AS n_punct,
         len(regexp_extract_all(text, '\\b({stop_alt})\\b')) AS n_stop
  FROM documents
),
qual AS (
  SELECT doc_id,
         (CASE WHEN n_tokens >= 10 THEN 0.25 ELSE 0.0 END)
       + (CASE WHEN n_chars * 1.0 / greatest(n_tokens, 1) BETWEEN 3 AND 12
               THEN 0.25 ELSE 0.0 END)
       + (CASE WHEN n_punct * 1.0 / greatest(n_chars, 1) <= 0.2
               THEN 0.25 ELSE 0.0 END)
       + (CASE WHEN n_stop * 1.0 / greatest(n_tokens, 1) >= 0.01
               THEN 0.25 ELSE 0.0 END) AS quality
  FROM qraw)"""


def host_profile_sql(threshold: float = 0.8) -> str:
    """Expected q_host_profile output: the per-host curation report —
    doc count, language spread, mean composite quality, near-dup share —
    composing the doc-dedup labeling and quality CTEs with the host
    arithmetic of host_counts_sql."""
    return f"""WITH RECURSIVE {_doc_dedup_ctes(threshold)},
{_quality_cte()},
h AS (
  SELECT d.doc_id, d.lang,
         'site' || CAST(CASE WHEN d.doc_id % 5 = 0 THEN 0
             ELSE d.doc_id % {S.N_HOSTS} END AS VARCHAR) || '.example.com' AS host,
         q.quality,
         CASE WHEN l.keep_id <> d.doc_id THEN 1 ELSE 0 END AS is_dup
  FROM documents d
  JOIN qual q USING (doc_id)
  JOIN labeled l USING (doc_id))
SELECT host,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
       round(avg(quality), 6) AS mean_quality,
       round(avg(is_dup * 1.0), 6) AS dup_share
FROM h GROUP BY host"""


def winnow_sql(k: int = 8, w: int = 15) -> str:
    """Expected textstats.winnow_fingerprints output: per-window rightmost
    minimum k-gram hash selections over the normalized text (Schleimer et
    al. 2003), distinct (doc_id, pos, fp) rows."""
    return f"""WITH nrm AS (
  SELECT doc_id, lower(regexp_replace(text, '\\s+', ' ', 'g')) AS t
  FROM documents),
g AS (
  SELECT doc_id,
         list_transform(range(1, greatest(length(t) - {k - 1}, 1) + 1),
                        i -> substr(t, i, {k})) AS grams
  FROM nrm),
h AS (
  SELECT doc_id,
         list_transform(grams,
             x -> CAST(('0x' || substr(md5(x || '#winnow'), 1, 15)) AS BIGINT))
             AS hs
  FROM g),
win AS (
  SELECT doc_id, i AS wi, hs[i:i+{w - 1}] AS s
  FROM h, unnest(range(1, greatest(len(hs) - {w - 1}, 1) + 1)) AS u(i)),
m AS (SELECT doc_id, wi, s, list_min(s) AS mn FROM win)
SELECT DISTINCT doc_id,
       CAST(wi - 1 + list_max(list_transform(range(1, len(s) + 1),
            j -> CASE WHEN s[j] = mn THEN j ELSE 0 END)) AS BIGINT) AS pos,
       mn AS fp
FROM m"""


def quote_pairs_sql(
    k: int = 8, w: int = 15, min_shared: int = 3, max_docs: int = 20
) -> str:
    """Expected textstats.shared_fingerprint_pairs output over the winnow
    fingerprints: doc pairs sharing ≥ min_shared non-viral fingerprints
    (fps on > max_docs docs excluded before the pair join)."""
    return f"""WITH fps AS (
{winnow_sql(k, w)}
),
f AS (SELECT DISTINCT doc_id AS id, fp FROM fps),
hot AS (SELECT fp FROM f GROUP BY fp HAVING count(*) > {max_docs}),
f2 AS (SELECT * FROM f WHERE fp NOT IN (SELECT fp FROM hot)),
p AS (SELECT a.id AS id_a, b.id AS id_b, count(*) AS shared
      FROM f2 a JOIN f2 b ON a.fp = b.fp AND a.id < b.id
      GROUP BY a.id, b.id)
SELECT id_a, id_b, CAST(shared AS BIGINT) AS shared
FROM p WHERE shared >= {min_shared}"""


def boilerplate_grams_sql(n: int = 5, min_hosts: int = 3) -> str:
    """Expected dedup.boilerplate_grams output on the documents table with
    the host_counts_sql host arithmetic: word n-grams on ≥ min_hosts
    distinct hosts, with host/doc/occurrence counts. Mirrors
    word_shingles' whole-string truncation for texts shorter than n."""
    return f"""WITH w AS (
  SELECT doc_id,
         'site' || CAST(CASE WHEN doc_id % 5 = 0 THEN 0
             ELSE doc_id % {S.N_HOSTS} END AS VARCHAR) || '.example.com' AS host,
         str_split(text, ' ') AS t
  FROM documents),
g AS (
  SELECT doc_id, host,
         unnest(list_transform(range(greatest(len(t) - {n - 1}, 1)),
                i -> array_to_string(t[i+1:i+{n}], ' '))) AS gram
  FROM w),
hosts AS (SELECT gram, count(DISTINCT host) AS n_hosts FROM g GROUP BY gram),
docs AS (SELECT gram, count(DISTINCT doc_id) AS n_docs FROM g GROUP BY gram),
occ AS (SELECT gram, count(*) AS n_occurrences FROM g GROUP BY gram)
SELECT h.gram, CAST(h.n_hosts AS BIGINT) AS n_hosts,
       CAST(d.n_docs AS BIGINT) AS n_docs,
       CAST(o.n_occurrences AS BIGINT) AS n_occurrences
FROM hosts h JOIN docs d USING (gram) JOIN occ o USING (gram)
WHERE h.n_hosts >= {min_hosts}"""


def jaccard_sweep_sql(min_threshold: float = 0.3, buckets: int = 10) -> str:
    """Expected dedup.jaccard_threshold_sweep output over the exact
    word-3-gram Jaccard pairs ≥ min_threshold: per similarity band, the
    pair count and the cumulative at-or-above count."""
    return f"""WITH {WORD_SHINGLES_CTE},
sizes AS (SELECT id, count(*) AS n FROM sh GROUP BY id),
inter AS (SELECT a.id AS id_a, b.id AS id_b, count(*) AS n_inter
          FROM sh a JOIN sh b ON a.sh = b.sh AND a.id < b.id
          GROUP BY a.id, b.id),
jacc AS (SELECT i.n_inter * 1.0 / (sa.n + sb.n - i.n_inter) AS jaccard
         FROM inter i JOIN sizes sa ON sa.id = i.id_a
         JOIN sizes sb ON sb.id = i.id_b
         WHERE i.n_inter * 1.0 / (sa.n + sb.n - i.n_inter) >= {min_threshold}),
hist AS (SELECT least(CAST(floor(jaccard * {buckets}) AS BIGINT),
                      {buckets - 1}) AS bucket,
                CAST(count(*) AS BIGINT) AS n_pairs
         FROM jacc GROUP BY 1)
SELECT bucket, round(bucket / {float(buckets)}, 6) AS threshold, n_pairs,
       CAST(sum(n_pairs) OVER (ORDER BY bucket DESC
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS n_pairs_ge
FROM hist"""


def ngram_jaccard_sql(threshold: float = 0.5) -> str:
    """Exact word-3-gram Jaccard pairs ≥ threshold. The oracle may be naive
    (intersection from the full shingle self-join — DuckDB only runs at
    sf0.01); the Spark side uses the exact prefix-filter join, same output."""
    return f"""WITH {WORD_SHINGLES_CTE},
sizes AS (SELECT id, count(*) AS n FROM sh GROUP BY id),
inter AS (SELECT a.id AS id_a, b.id AS id_b, count(*) AS n_inter
          FROM sh a JOIN sh b ON a.sh = b.sh AND a.id < b.id
          GROUP BY a.id, b.id)
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


def token_stats_sql() -> str:
    from .operators.textstats import BPE_TOKEN_RE

    return f"""SELECT doc_id,
       CAST(length(text) AS BIGINT) AS n_chars,
       CAST(len(regexp_split_to_array(text, '\\s+')) AS BIGINT) AS n_ws_tokens,
       CAST(len(regexp_extract_all(text, '{BPE_TOKEN_RE}')) AS BIGINT) AS n_bpe_tokens
FROM documents"""


def quality_sql() -> str:
    from .operators.textstats import PUNCT_RE, STOPWORDS

    stop_alt = "|".join(STOPWORDS)
    punct_re = PUNCT_RE.replace("'", "''")
    return f"""WITH q AS (
  SELECT doc_id,
         length(text) AS n_chars,
         len(regexp_split_to_array(text, '\\s+')) AS n_tokens,
         len(regexp_extract_all(text, '{punct_re}')) AS n_punct,
         len(regexp_extract_all(text, '\\b({stop_alt})\\b')) AS n_stop
  FROM documents
)
SELECT doc_id,
       round(n_punct * 1.0 / greatest(n_chars, 1), 6) AS punct_ratio,
       round(n_stop * 1.0 / greatest(n_tokens, 1), 6) AS stopword_ratio,
       round(n_chars * 1.0 / greatest(n_tokens, 1), 6) AS avg_token_len,
       round((CASE WHEN n_tokens >= 10 THEN 0.25 ELSE 0.0 END)
           + (CASE WHEN n_chars * 1.0 / greatest(n_tokens, 1) BETWEEN 3 AND 12 THEN 0.25 ELSE 0.0 END)
           + (CASE WHEN n_punct * 1.0 / greatest(n_chars, 1) <= 0.2 THEN 0.25 ELSE 0.0 END)
           + (CASE WHEN n_stop * 1.0 / greatest(n_tokens, 1) >= 0.01 THEN 0.25 ELSE 0.0 END), 6) AS quality
FROM q"""


def repetition_sql() -> str:
    """Oracle for textstats.repetition_stats (Gopher-style word-level
    repetition fractions; thresholds 0.5 / 0.18 / 0.30)."""
    return r"""WITH w AS (
  SELECT doc_id, regexp_split_to_array(text, '\s+') AS ws FROM documents
),
g AS (
  SELECT doc_id, ws,
         list_transform(range(1, len(ws)), i -> ws[i] || ' ' || ws[i+1]) AS bgs,
         list_transform(range(1, len(ws)-1),
                        i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]) AS tgs
  FROM w
),
m AS (
  SELECT doc_id,
         round(CASE WHEN len(ws) > 0
               THEN 1.0 - len(list_distinct(ws)) * 1.0 / len(ws)
               ELSE 0.0 END, 6) AS dup_word_frac,
         round(CASE WHEN len(ws) > 1
               THEN list_max(list_transform(list_distinct(bgs),
                     b -> len(list_filter(bgs, x -> x = b)))) * 1.0 / len(bgs)
               ELSE 0.0 END, 6) AS top_bigram_frac,
         round(CASE WHEN len(ws) > 2
               THEN 1.0 - len(list_distinct(tgs)) * 1.0 / len(tgs)
               ELSE 0.0 END, 6) AS dup_trigram_frac
  FROM g
)
SELECT doc_id, dup_word_frac, top_bigram_frac, dup_trigram_frac,
       CAST(dup_word_frac > 0.5 OR top_bigram_frac > 0.18
            OR dup_trigram_frac > 0.30 AS INT) AS repetitive
FROM m"""


def c4_filters_sql(min_words: int = 5) -> str:
    """Oracle for textstats.c4_filters."""
    from .operators.textstats import C4_BANNED

    banned = " OR ".join(
        f"contains(lower(text), '{m.replace(chr(39), chr(39) * 2)}')"
        for m in C4_BANNED
    )
    return f"""WITH s AS (
  SELECT doc_id,
         len(regexp_extract_all(text, '[.!?]+')) AS n_sentences,
         CASE WHEN regexp_matches(rtrim(text), '[.!?]["'')\\]]*$')
              THEN 1 ELSE 0 END AS ends_terminal,
         len(regexp_split_to_array(trim(text), '\\s+')) AS n_words,
         CASE WHEN {banned} THEN 1 ELSE 0 END AS has_banned
  FROM documents
)
SELECT doc_id, CAST(n_sentences AS BIGINT) AS n_sentences, ends_terminal,
       CAST(n_words AS BIGINT) AS n_words, has_banned,
       CAST(n_words >= {min_words} AND n_sentences >= 1
            AND has_banned = 0 AS INT) AS c4_keep
FROM s"""


def _lang_pred_ctes() -> str:
    """CTE chain ``c, p`` where ``p(doc_id, lang_pred)`` is the heuristic
    language-ID prediction — shared by lang_id_sql and lang_id_eval_sql."""
    from .operators.textstats import CJK_RE, LANG_MARKERS

    cnt_exprs = {
        lang: f"len(regexp_extract_all(text, '\\b({'|'.join(words)})\\b'))"
        for lang, words in LANG_MARKERS.items()
    }
    mx = "greatest(" + ", ".join(f"c_{lang}" for lang in LANG_MARKERS) + ")"
    whens = "\n".join(
        f"       WHEN c_{lang} = {mx} THEN '{lang}'" for lang in LANG_MARKERS
    )
    counts = ", ".join(f"{e} AS c_{lang}" for lang, e in cnt_exprs.items())
    return f"""c AS (SELECT doc_id, text, {counts} FROM documents),
p AS (SELECT doc_id,
  CASE WHEN len(regexp_extract_all(text, '{CJK_RE}')) > 0 THEN 'zh'
       WHEN {mx} = 0 THEN 'und'
{whens}
  END AS lang_pred
FROM c)"""


def lang_id_sql() -> str:
    return f"""WITH {_lang_pred_ctes()}
SELECT doc_id, lang_pred FROM p"""


def fingerprint_sql() -> str:
    return """SELECT doc_id,
       md5(lower(regexp_replace(text, '\\s+', ' ', 'g'))) AS fp_md5,
       list_reduce(
         list_prepend(CAST(0 AS BIGINT),
           list_transform(
             string_split(lower(regexp_replace(text, '\\s+', ' ', 'g')), ''),
             c -> CAST(ascii(c) AS BIGINT))),
         (a, b) -> (a * 31 + b) % 2147483647) AS fp_rolling
FROM documents"""


_COS = (
    "list_dot_product(a.e, b.e) / "
    "(sqrt(list_dot_product(a.e, a.e)) * sqrt(list_dot_product(b.e, b.e)))"
)


def cosine_topk_sql(k: int = 5, n_queries: int = 10) -> str:
    return f"""WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
scored AS (
  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id, {_COS} AS cosine
  FROM v a JOIN v b ON a.vec_id < {n_queries} AND a.vec_id <> b.vec_id
)
SELECT query_id, neighbor_id, round(cosine, 6) AS cosine,
       CAST(rank AS BIGINT) AS rank
FROM (SELECT *, row_number() OVER (PARTITION BY query_id
          ORDER BY cosine DESC, neighbor_id) AS rank FROM scored)
WHERE rank <= {k}"""


def ann_topk_sql(k: int = 5, n_queries: int | None = 10, n_planes: int = 2,
                 n_tables: int = 4, dim: int = 64) -> str:
    from .operators.similarity import hyperplane_weights

    rows = []
    for t in range(n_tables):
        planes = hyperplane_weights(n_planes, dim, seed=f"ann-t{t}")
        bucket_terms = []
        for p, w in enumerate(planes):
            lit = "[" + ", ".join(repr(x) for x in w) + "]"
            bucket_terms.append(
                f"(CASE WHEN list_dot_product(e, {lit}::DOUBLE[]) > 0 THEN {2 ** p} ELSE 0 END)"
            )
        rows.append(f"SELECT vec_id, e, {t} AS tbl, {' + '.join(bucket_terms)} AS bucket FROM v")
    buckets = " UNION ALL ".join(rows)
    qpred = f"a.vec_id < {n_queries} AND " if n_queries is not None else ""
    return f"""WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
bk AS ({buckets}),
cand AS (
  SELECT DISTINCT a.vec_id AS query_id, b.vec_id AS neighbor_id
  FROM bk a JOIN bk b ON a.tbl = b.tbl AND a.bucket = b.bucket
  WHERE {qpred}a.vec_id <> b.vec_id
),
scored AS (
  SELECT c.query_id, c.neighbor_id,
         list_dot_product(a.e, b.e)
         / (sqrt(list_dot_product(a.e, a.e)) * sqrt(list_dot_product(b.e, b.e))) AS cosine
  FROM cand c JOIN v a ON a.vec_id = c.query_id JOIN v b ON b.vec_id = c.neighbor_id
)
SELECT query_id, neighbor_id, round(cosine, 6) AS cosine, CAST(rank AS BIGINT) AS rank
FROM (SELECT *, row_number() OVER (PARTITION BY query_id
          ORDER BY cosine DESC, neighbor_id) AS rank FROM scored)
WHERE rank <= {k}"""


def ivf_topk_sql(k: int = 5, n_queries: int = 10, n_centroids: int = 16,
                 n_probe: int = 4) -> str:
    """Replicates similarity.ivf_topk (deterministic first-N centroids)."""
    cos = ("list_dot_product({a}, {b}) / (sqrt(list_dot_product({a}, {a})) * "
           "sqrt(list_dot_product({b}, {b})))")
    c_vc = cos.format(a="c.cv", b="v.e")
    return f"""WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
cents AS (SELECT vec_id AS cell, e AS cv FROM v WHERE vec_id < {n_centroids}),
ranked AS (SELECT v.vec_id, v.e, c.cell,
                  row_number() OVER (PARTITION BY v.vec_id
                      ORDER BY {c_vc} DESC, c.cell) AS rn
           FROM v CROSS JOIN cents c),
asn AS (SELECT vec_id, e, cell FROM ranked WHERE rn = 1),
qcells AS (SELECT vec_id AS query_id, e AS qe, cell FROM ranked
           WHERE vec_id < {n_queries} AND rn <= {n_probe}),
scored AS (SELECT q.query_id, a.vec_id AS neighbor_id,
                  {cos.format(a="q.qe", b="a.e")} AS cosine
           FROM qcells q JOIN asn a ON a.cell = q.cell
           WHERE a.vec_id <> q.query_id)
SELECT query_id, neighbor_id, round(cosine, 6) AS cosine,
       CAST(rank AS BIGINT) AS rank
FROM (SELECT *, row_number() OVER (PARTITION BY query_id
          ORDER BY cosine DESC, neighbor_id) AS rank FROM scored)
WHERE rank <= {k}"""


def _embed_pair_ctes(threshold: float, n_planes: int, n_tables: int,
                     dim: int) -> str:
    """CTE chain ending in ``epairs(id_a, id_b)`` — LSH-blocked cosine pairs
    over the embeddings view; shared by the pair query and semantic dedup."""
    from .operators.similarity import hyperplane_weights

    rows = []
    for t in range(n_tables):
        planes = hyperplane_weights(n_planes, dim, seed=f"ann-t{t}")
        bucket_terms = []
        for p, w in enumerate(planes):
            lit = "[" + ", ".join(repr(x) for x in w) + "]"
            bucket_terms.append(
                f"(CASE WHEN list_dot_product(e, {lit}::DOUBLE[]) > 0 THEN {2 ** p} ELSE 0 END)"
            )
        rows.append(
            f"SELECT vec_id, {t} AS tbl, {' + '.join(bucket_terms)} AS bucket FROM v"
        )
    buckets = " UNION ALL ".join(rows)
    return f"""v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
bk AS ({buckets}),
cand AS (
  SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
  FROM bk a JOIN bk b ON a.tbl = b.tbl AND a.bucket = b.bucket
  WHERE a.vec_id < b.vec_id
),
epairs AS (
  SELECT c.id_a, c.id_b, {_COS} AS cosine
  FROM cand c JOIN v a ON a.vec_id = c.id_a JOIN v b ON b.vec_id = c.id_b
  WHERE {_COS} >= {threshold}
)"""


def embed_neardup_lsh_sql(threshold: float = 0.4, n_planes: int = 2,
                          n_tables: int = 4, dim: int = 64) -> str:
    """Replicates similarity.embedding_neardup_pairs (LSH-blocked default)."""
    return f"""WITH {_embed_pair_ctes(threshold, n_planes, n_tables, dim)}
SELECT id_a, id_b, round(cosine, 6) AS cosine FROM epairs"""


def semantic_dedup_sql(threshold: float = 0.4, n_planes: int = 2,
                       n_tables: int = 4, dim: int = 64) -> str:
    """Expected dedup_documents(method='embedding') output: every vector
    labeled with the min vec_id of its cosine-near-dup cluster (transitive
    closure of the pair graph, like doc_dedup_sql)."""
    return f"""WITH RECURSIVE {_embed_pair_ctes(threshold, n_planes, n_tables, dim)},
sym AS (SELECT id_a AS a, id_b AS b FROM epairs
        UNION SELECT id_b, id_a FROM epairs),
reach(a, b) AS (SELECT a, b FROM sym
                UNION SELECT r.a, s.b FROM reach r JOIN sym s ON r.b = s.a),
comp AS (SELECT a AS id, least(a, min(b)) AS keep FROM reach GROUP BY a)
SELECT emb.vec_id, coalesce(c.keep, emb.vec_id) AS keep_id,
       CAST(CASE WHEN coalesce(c.keep, emb.vec_id) = emb.vec_id
            THEN 1 ELSE 0 END AS BIGINT) AS is_canonical
FROM embeddings emb LEFT JOIN comp c ON c.id = emb.vec_id"""


def host_counts_sql() -> str:
    return f"""SELECT 'site' || CAST(CASE WHEN doc_id % 5 = 0 THEN 0
           ELSE doc_id % {S.N_HOSTS} END AS VARCHAR) || '.example.com' AS host,
       CAST(count(*) AS BIGINT) AS n_pages
FROM documents GROUP BY 1"""


def image_features_sql() -> str:
    """Fake-decoder parity: feature i = md5-digest byte i / 256 (exact)."""
    feats = ", ".join(
        f"(('0x' || substr(md5(payload), {2 * i + 1}, 2))::INT) / 256.0 AS f{i}"
        for i in range(8)
    )
    return f"""WITH m AS (
  SELECT 'https://site' || CAST(CASE WHEN doc_id % 5 = 0 THEN 0
             ELSE doc_id % {S.N_HOSTS} END AS VARCHAR) || '.example.com/page/'
             || CAST(doc_id AS VARCHAR) AS url,
         'payload:https://site' || CAST(CASE WHEN doc_id % 5 = 0 THEN 0
             ELSE doc_id % {S.N_HOSTS} END AS VARCHAR) || '.example.com/page/'
             || CAST(doc_id AS VARCHAR) AS payload,
         CAST((doc_id % 8 + 1) * 64 AS INT) AS width,
         CAST((doc_id % 5 + 1) * 64 AS INT) AS height,
         3 AS n_channels
  FROM documents
  WHERE doc_id % 7 <> 0 AND doc_id % 3 = 0
)
SELECT url, width, height, n_channels, {feats} FROM m"""


def image_features_real_sql() -> str:
    """Real-decoder parity (multimodal.png_media_table → png.decode_png):
    the synthesized image is row-constant per channel — pixel (x, y, c) =
    (doc_id·31 + y + 85c) mod 256 — so every emitted byte statistic is
    closed-form: channel sums are w·Σ_y v, min/max/distinct range over the
    (y, c) residues, and the corner bytes are direct formulas. Any filter-
    reconstruction bug in the decoder perturbs some byte and breaks a sum."""
    return f"""WITH imgs AS (
  SELECT doc_id, (doc_id % 8 + 1) * 8 AS w, (doc_id % 5 + 1) * 8 AS h
  FROM documents WHERE doc_id % 3 = 0 AND doc_id % 7 <> 0),
ys AS (SELECT unnest(range(40)) AS y),
cs AS (SELECT unnest(range(3)) AS c),
px AS (SELECT i.doc_id, i.w, i.h,
              (i.doc_id * 31 + y.y + 85 * c.c) % 256 AS v, c.c
       FROM imgs i JOIN ys y ON y.y < i.h CROSS JOIN cs c),
agg AS (SELECT doc_id, w, h,
               CAST(w * sum(CASE WHEN c = 0 THEN v ELSE 0 END) AS DOUBLE) AS f0,
               CAST(w * sum(CASE WHEN c = 1 THEN v ELSE 0 END) AS DOUBLE) AS f1,
               CAST(w * sum(CASE WHEN c = 2 THEN v ELSE 0 END) AS DOUBLE) AS f2,
               CAST(min(v) AS DOUBLE) AS f3, CAST(max(v) AS DOUBLE) AS f4,
               CAST(count(DISTINCT v) AS DOUBLE) AS f7
        FROM px GROUP BY doc_id, w, h)
SELECT {URL_EXPR} AS url, CAST(w AS INT) AS width, CAST(h AS INT) AS height,
       CAST(3 AS INT) AS n_channels, f0, f1, f2, f3, f4,
       CAST((doc_id * 31) % 256 AS DOUBLE) AS f5,
       CAST((doc_id * 31 + h - 1 + 170) % 256 AS DOUBLE) AS f6,
       f7
FROM agg"""


def audio_features_real_sql() -> str:
    """Real-decoder parity for the audio modality (multimodal.wav_media_table
    → wav.decode_wav): samples are pure integer arithmetic on (doc_id, t),
    so every decoded statistic is closed-form — one wrong decoded sample
    anywhere breaks a sum/min/max/distinct/zero-crossing count."""
    return f"""WITH auds AS (
  SELECT doc_id, (doc_id % 5 + 1) * 64 AS n,
         8000 + (doc_id % 3) * 4000 AS rate
  FROM documents WHERE doc_id % 4 = 2),
ts AS (SELECT unnest(range(320)) AS t),
v AS (SELECT a.doc_id, a.n, a.rate, ts.t,
             ((a.doc_id * 13 + ts.t * ts.t) % 4096) - 2048 AS v
      FROM auds a JOIN ts ON ts.t < a.n),
w AS (SELECT doc_id, n, rate, t, v,
             lag(v) OVER (PARTITION BY doc_id ORDER BY t) AS pv FROM v),
agg AS (SELECT doc_id, n, rate,
               CAST(sum(v) AS DOUBLE) AS f0,
               CAST(min(v) AS DOUBLE) AS f1,
               CAST(max(v) AS DOUBLE) AS f2,
               CAST(count(DISTINCT v) AS DOUBLE) AS f5,
               CAST(sum(CASE WHEN pv IS NOT NULL AND ((pv < 0) <> (v < 0))
                        THEN 1 ELSE 0 END) AS DOUBLE) AS f6,
               CAST(sum(abs(v)) AS DOUBLE) AS f7
        FROM w GROUP BY doc_id, n, rate)
SELECT {URL_EXPR} AS url, CAST(1 AS INT) AS n_channels,
       CAST(rate AS INT) AS sample_rate, CAST(n AS INT) AS n_frames,
       f0, f1, f2,
       CAST((doc_id * 13) % 4096 - 2048 AS DOUBLE) AS f3,
       CAST((doc_id * 13 + (n - 1) * (n - 1)) % 4096 - 2048 AS DOUBLE) AS f4,
       f5, f6, f7
FROM agg"""


def spo_flatten_sql() -> str:
    """Expected P2 flatten output: the three composed slots per event row."""
    return """SELECT event_id, '头实体-用户' AS slot,
       CASE WHEN event_id % 7 = 0 THEN '[None]'
            ELSE 'user' || CAST(user_id AS VARCHAR) END AS value
FROM events
UNION ALL
SELECT event_id, '尾实体-事件' AS slot, 'ev' || CAST(event_id AS VARCHAR) AS value
FROM events
UNION ALL
SELECT event_id, '尾实体-类型' AS slot,
       CASE WHEN event_id % 5 = 0 THEN '[None]' ELSE event_type END AS value
FROM events"""


def budget_truncate_sql(budget: int = 50) -> str:
    """Expected P6 output: largest cond prefix (by '；' segments, floor 1)
    whose token count + text tokens + 3 fits the budget."""
    from .operators.textstats import BPE_TOKEN_RE

    re = BPE_TOKEN_RE
    return f"""WITH base AS (
  SELECT event_id,
         event_type || '；arg：'
           || repeat('tok ', CAST(json_extract(props, '$.k') AS INT) % 40)
           || '；next：' AS cond,
         repeat('w ', 30) AS text
  FROM events
),
segs AS (SELECT event_id, cond, str_split(cond, '；') AS s,
                len(regexp_extract_all(text, '{re}')) AS text_len
         FROM base),
pick AS (SELECT event_id, s,
                coalesce(list_max(list_filter(range(1, len(s) + 1),
                  k -> len(regexp_extract_all(array_to_string(s[1:k], '；'), '{re}'))
                       + text_len + 3 <= {budget})), 1) AS k_best
         FROM segs)
SELECT event_id, array_to_string(s[1:k_best], '；') AS cond_trunc FROM pick"""


def perm_examples_sql() -> str:
    """Expected P4+P7 output: permutation-expanded prefix examples over the
    event tuples (en and zh), deduped by (cond, url)."""
    import itertools

    selects = []
    for etype, gate, vals, _ in _event_rows():
        roles = list(S.EVENTS[etype]["roles"])
        for perm in itertools.permutations(range(len(roles))):
            for pos in range(len(roles)):
                cond = f"'{etype}；'"
                for j in perm[:pos]:
                    cond += f" || ' {roles[j]}：' || ({vals[roles[j]]}) || '；'"
                cond += f" || ' {roles[perm[pos]]}：'"
                selects.append(
                    f"SELECT {URL_EXPR} AS url, {cond} AS cond, "
                    f"({vals[roles[perm[pos]]]}) AS label FROM docs WHERE {gate}"
                )
    body = "\nUNION ALL\n".join(selects)
    return f"""WITH {_DOCS_CTE},
ex AS ({body})
SELECT cond, url,
       array_to_string(list_sort(list_distinct(list(label))), '|') AS labels
FROM ex GROUP BY cond, url"""


def _sampled_orders(k: int, n: int, seed: str = "perm") -> list[list[int]]:
    """The P5 deterministic md5 shuffles (nested._sampled_order semantics,
    recomputed here so the oracle does not import the operator)."""
    import hashlib

    seen: list[list[int]] = []
    for si in range(n):
        order = sorted(
            range(k),
            key=lambda j: hashlib.md5(
                f"{seed}#{k}#{si}#{j}".encode()
            ).hexdigest(),
        )
        if order not in seen:
            seen.append(order)
    return seen


def perm_examples_sampled_sql() -> str:
    """Expected P5 sampled-branch output: for each of the 10 md5-shuffle
    arity-5 orders, the prefix-grammar examples over the synthesized
    DuEE-fin-style tuples (5th role missing on doc_id % 3 = 0 → '[None]'),
    deduped by (cond, doc_key)."""
    roles = S.SAMPLED_EVENT_ROLES
    etype = S.SAMPLED_EVENT_TYPE

    def val(k: int) -> str:
        v = f"'v' || CAST((doc_id * {2 * k + 1} + {k}) % 7 AS VARCHAR)"
        if k == len(roles) - 1:
            return f"CASE WHEN doc_id % 3 = 0 THEN '{S.NONE_SENTINEL}' ELSE {v} END"
        return v

    selects = []
    for order in _sampled_orders(len(roles), 10):
        for pos in range(len(roles)):
            cond = f"'{etype}；'"
            for j in order[:pos]:
                cond += f" || ' {roles[j]}：' || ({val(j)}) || '；'"
            cond += f" || ' {roles[order[pos]]}：'"
            selects.append(
                f"SELECT 'd' || CAST(doc_id AS VARCHAR) AS doc_key, "
                f"{cond} AS cond, ({val(order[pos])}) AS label "
                f"FROM documents WHERE doc_id % 10 = 2"
            )
    body = "\nUNION ALL\n".join(selects)
    return f"""WITH ex AS ({body})
SELECT cond, doc_key,
       array_to_string(list_sort(list_distinct(list(label))), '|') AS labels
FROM ex GROUP BY cond, doc_key"""


def order_split_sql() -> str:
    """Expected O8 split: rendered gold triples the SEQUENCE (subject-first,
    primary-connector-only subject extraction) policy cannot recover.

    seq recovers a fact iff it is primary-rendered, OR its subject also
    appears as the subject of a primary fact of the same (url, rel) —
    anchored object extraction then sees ALL connectors. rl recovers
    everything (P/R = 1.0), so the split is gold MINUS that set."""
    alt = f"(lang = 'en' AND (doc_id*3 + i) % 4 = 0 AND {_in('rel_idx', _ALT_RELS)})"
    return f"""WITH {_DOCS_CTE}, {_FACTS_CTE},
r AS (SELECT {URL_EXPR} AS url, rel_idx, {_RELS}[rel_idx + 1] AS pred,
             {_subj_expr()} AS subj, {_obj_expr(False)} AS obj,
             {alt} AS is_alt
      FROM facts),
prim_subj AS (SELECT DISTINCT url, rel_idx, subj FROM r WHERE NOT is_alt),
seq AS (SELECT url, pred, subj, obj FROM r WHERE NOT is_alt
        UNION
        SELECT a.url, a.pred, a.subj, a.obj FROM r a
        WHERE a.is_alt AND EXISTS (SELECT 1 FROM prim_subj p
              WHERE p.url = a.url AND p.rel_idx = a.rel_idx
                AND p.subj = a.subj))
SELECT DISTINCT url, pred, subj, obj FROM r
EXCEPT
SELECT url, pred, subj, obj FROM seq"""


def slot_f1_sql() -> str:
    """Expected O6 accounting: rendered pipeline triples vs canonical gold,
    grouped per pred — tn counts variant-rendered org objects."""
    return f"""WITH {_DOCS_CTE}, {_FACTS_CTE},
r AS (SELECT DISTINCT {URL_EXPR} AS url, {_RELS}[rel_idx + 1] AS pred,
             {_subj_expr()} AS subj, {_obj_expr(False)} AS obj FROM facts),
g AS (SELECT DISTINCT {URL_EXPR} AS url, {_RELS}[rel_idx + 1] AS pred,
             {_subj_expr()} AS subj, {_obj_expr(True)} AS obj FROM facts),
rp AS (SELECT pred, count(*) AS np FROM r GROUP BY pred),
gp AS (SELECT pred, count(*) AS tot FROM g GROUP BY pred),
tpp AS (SELECT r.pred AS pred, count(*) AS tp
        FROM r JOIN g USING (url, pred, subj, obj) GROUP BY r.pred),
acc AS (SELECT gp.pred, coalesce(tpp.tp, 0) AS tp,
               rp.np - coalesce(tpp.tp, 0) AS tn, gp.tot
        FROM gp LEFT JOIN rp USING (pred) LEFT JOIN tpp USING (pred)),
pr AS (SELECT pred, tp, tn, tot,
              tp * 1.0 / greatest(tp + tn, 1) AS p,
              tp * 1.0 / greatest(tot, 1) AS rec
       FROM acc)
SELECT pred, CAST(tp AS BIGINT) AS tp, CAST(tn AS BIGINT) AS tn,
       CAST(tot AS BIGINT) AS tot,
       round(p, 6) AS precision, round(rec, 6) AS recall,
       round(2.0 * p * rec / greatest(p + rec, 0.000000001), 6) AS f1
FROM pr"""


def containment_audit_sql() -> str:
    """Expected P13 audit output over en canonical gold triples: a triple
    passes iff some sentence token-contains both args — i.e. some fact
    sentence renders exactly {subj, obj}, or some event sentence's surfaces
    cover both (variant-rendered org objects fail: 'Acme Corporation' does
    not token-contain 'Acme Corp')."""
    ev_selects = []
    for etype, gate, vals, lang in _event_rows():
        if lang != "en":  # the audit query is en-scoped
            continue
        vs = [vals[r] for r in S.EVENTS[etype]["roles"]]
        ev_selects.append(
            f"SELECT {URL_EXPR} AS url, {vs[0]} AS v1, {vs[1]} AS v2, {vs[2]} AS v3 "
            f"FROM docs WHERE {gate}"
        )
    ev_cte = " UNION ALL ".join(ev_selects)
    return f"""WITH {_DOCS_CTE}, {_FACTS_CTE},
r AS (SELECT {URL_EXPR} AS url, {_subj_expr()} AS s, {_obj_expr(False)} AS o
      FROM facts WHERE lang = 'en'),
g AS (SELECT DISTINCT {URL_EXPR} AS url, {_RELS}[rel_idx + 1] AS pred,
             {_subj_expr()} AS subj, {_obj_expr(True)} AS obj
      FROM facts WHERE lang = 'en'),
ev AS ({ev_cte})
SELECT g.url, g.pred, g.subj, g.obj,
       CAST(CASE WHEN EXISTS (SELECT 1 FROM r WHERE r.url = g.url
                AND (g.subj = r.s OR g.subj = r.o)
                AND (g.obj = r.s OR g.obj = r.o))
        OR EXISTS (SELECT 1 FROM ev e WHERE e.url = g.url
                AND g.subj IN (e.v1, e.v2, e.v3)
                AND g.obj IN (e.v1, e.v2, e.v3))
       THEN 1 ELSE 0 END AS BIGINT) AS passed
FROM g"""


def _conn_expr() -> str:
    """The fact sentence's connector string (schema.fact_parts), per rel_idx
    with the alt-template parity — shared by the span-labeling oracles."""
    en_whens, zh_whens = [], []
    for k, (rel, _, _) in enumerate(S.RELATIONS):
        templates = S.EN_TEMPLATES[rel]
        prim = templates[0][0]
        if len(templates) > 1:
            alt = templates[1][0]
            en = f"CASE WHEN (doc_id*3 + i) % 4 = 0 THEN '{alt}' ELSE '{prim}' END"
        else:
            en = f"'{prim}'"
        en_whens.append(f"WHEN rel_idx = {k} THEN {en}")
        zh_whens.append(f"WHEN rel_idx = {k} THEN '{S.ZH_TEMPLATES[rel][0][0]}'")
    return (
        f"CASE WHEN lang = 'zh' THEN CASE {' '.join(zh_whens)} END "
        f"ELSE CASE {' '.join(en_whens)} END END"
    )


def _sentence_cte() -> str:
    return f"""sent AS (
  SELECT {URL_EXPR} AS url, CAST(i AS BIGINT) AS i,
         {_RELS}[rel_idx + 1] AS rel,
         {_subj_expr()} AS subj, {_conn_expr()} AS conn,
         {_obj_expr(False)} AS obj,
         CASE WHEN lang = 'zh' THEN '。' ELSE '.' END AS tail
  FROM facts
)"""


def tokenize_offsets_sql(max_len: int = 512) -> str:
    """Replicates tokenize.encode_pairs over the documents table with
    cond = 'language ' || lang: [CLS] cond [SEP] text [SEP] with type ids
    and char offsets. The driver documents text is single-space lowercase
    words, so the whitespace split IS the BPE-ish tokenization and offsets
    follow from prefix lengths."""
    start = ("CASE WHEN i = 0 THEN 0 "
             "ELSE length(array_to_string(w[1:i], ' ')) + 1 END")
    return f"""WITH d AS (SELECT doc_id, lang, str_split(text, ' ') AS w FROM documents),
head AS (
  SELECT doc_id, 0 AS pos, '[CLS]' AS token, 0 AS type_id, 0 AS tok_start, 0 AS tok_end FROM d
  UNION ALL SELECT doc_id, 1, 'language', 0, 0, 8 FROM d
  UNION ALL SELECT doc_id, 2, lang, 0, 9, 9 + length(lang) FROM d
  UNION ALL SELECT doc_id, 3, '[SEP]', 0, 0, 0 FROM d
  UNION ALL SELECT doc_id, 4 + len(w), '[SEP]', 1, 0, 0 FROM d
),
t0 AS (SELECT doc_id, w, unnest(range(len(w))) AS i FROM d),
txt AS (
  SELECT doc_id, 4 + i AS pos, w[i + 1] AS token, 1 AS type_id,
         {start} AS tok_start,
         {start} + length(w[i + 1]) AS tok_end
  FROM t0
)
SELECT doc_id, CAST(pos AS BIGINT) AS pos, token,
       CAST(type_id AS BIGINT) AS type_id,
       CAST(tok_start AS BIGINT) AS tok_start,
       CAST(tok_end AS BIGINT) AS tok_end
FROM (SELECT * FROM head UNION ALL SELECT * FROM txt)
WHERE pos < {max_len}"""


def span_labels_search_sql() -> str:
    """Replicates tokenize.label_spans_search over gold fact tuples: every
    token-subsequence occurrence of subj/obj in the pair encoding
    (cond = rel name), coordinates in encoded positions, e exclusive.
    n_pre = |[CLS]| + |cond tokens| + |[SEP]|; a match at 1-based text-token
    position p sits at encoded s = n_pre + p - 1."""
    re_ = "[A-Za-z0-9]+|[^A-Za-z0-9 ]"
    return f"""WITH {_DOCS_CTE}, {_FACTS_CTE},
{_sentence_cte()},
tok AS (SELECT url, i, subj, obj,
               regexp_extract_all(subj || conn || obj || tail, '{re_}') AS tl,
               2 + len(regexp_extract_all(rel, '{re_}')) AS n_pre
        FROM sent),
m AS (
  SELECT url, i, 'subj' AS slot, subj AS value, tl, n_pre,
         regexp_extract_all(subj, '{re_}') AS el FROM tok
  UNION ALL
  SELECT url, i, 'obj' AS slot, obj AS value, tl, n_pre,
         regexp_extract_all(obj, '{re_}') AS el FROM tok
),
hits AS (SELECT url, i, slot, value, n_pre, len(el) AS k,
                unnest(list_filter(range(1, len(tl) - len(el) + 2),
                                   p -> tl[p:p + len(el) - 1] = el)) AS p
         FROM m)
SELECT url, i, slot, value,
       CAST(n_pre + p - 1 AS BIGINT) AS s,
       CAST(n_pre + p - 1 + k AS BIGINT) AS e
FROM hits"""


def span_labels_char_sql() -> str:
    """Replicates tokenize.label_spans_char over gold fact tuples: char
    spans (subj at 0, obj at len(subj)+len(conn)) mapped to token spans via
    offsets, e INCLUSIVE. Token index of a boundary = number of tokens in
    the sentence prefix before it (tokens never straddle an entity
    boundary)."""
    re_ = "[A-Za-z0-9]+|[^A-Za-z0-9 ]"
    return f"""WITH {_DOCS_CTE}, {_FACTS_CTE},
{_sentence_cte()},
base AS (SELECT url, i, subj, obj,
                subj || conn || obj || tail AS sentence,
                2 + len(regexp_extract_all(rel, '{re_}')) AS n_pre,
                length(subj) AS ls, length(conn) AS lc, length(obj) AS lo
         FROM sent),
sp AS (
  SELECT url, i, 'subj' AS slot, subj AS value, sentence, n_pre,
         0 AS c0, ls AS c1 FROM base
  UNION ALL
  SELECT url, i, 'obj' AS slot, obj AS value, sentence, n_pre,
         ls + lc AS c0, ls + lc + lo AS c1 FROM base
)
SELECT url, i, slot, value,
       CAST(n_pre + len(regexp_extract_all(substr(sentence, 1, c0), '{re_}')) AS BIGINT) AS s,
       CAST(n_pre + len(regexp_extract_all(substr(sentence, 1, c1), '{re_}')) - 1 AS BIGINT) AS e
FROM sp"""


def char_f1_sql() -> str:
    """Replicates metrics.char_f1 (O7, reference utils.py char-bag F1) on
    (rendered obj, canonical obj) per gold fact: lowercase char-multiset
    overlap with spaces stripped — variant-rendered orgs score < 1."""
    return f"""WITH {_DOCS_CTE}, {_FACTS_CTE},
p AS (SELECT {URL_EXPR} AS url, CAST(i AS BIGINT) AS i,
             lower(replace({_obj_expr(False)}, ' ', '')) AS pa,
             lower(replace({_obj_expr(True)}, ' ', '')) AS pb
      FROM facts),
ca AS (SELECT url, i, c, count(*) AS na
       FROM (SELECT url, i, unnest(str_split(pa, '')) AS c FROM p)
       GROUP BY url, i, c),
cb AS (SELECT url, i, c, count(*) AS nb
       FROM (SELECT url, i, unnest(str_split(pb, '')) AS c FROM p)
       GROUP BY url, i, c),
ov AS (SELECT url, i, sum(least(na, nb)) AS overlap
       FROM ca JOIN cb USING (url, i, c) GROUP BY url, i),
sc AS (SELECT p.url, p.i, coalesce(o.overlap, 0) AS ov,
              length(p.pa) AS la, length(p.pb) AS lb
       FROM p LEFT JOIN ov o ON o.url = p.url AND o.i = p.i)
SELECT url, i,
       round(CASE WHEN ov = 0 THEN 0.0
             ELSE 2.0 * (ov * 1.0 / greatest(la, 1)) * (ov * 1.0 / greatest(lb, 1))
                  / ((ov * 1.0 / greatest(la, 1)) + (ov * 1.0 / greatest(lb, 1)))
             END, 6) AS cf1
FROM sc"""


def cond_roundtrip_sql() -> str:
    """Replicates output.render_cond → parse_cond (O2, predict.py:109-126):
    the byte-exact cond grammar per language, with the parsed fields being
    the roundtripped originals."""
    return f"""WITH {_DOCS_CTE}, {_FACTS_CTE},
r AS (SELECT {URL_EXPR} AS url, CAST(i AS BIGINT) AS i, lang,
             {_RELS}[rel_idx + 1] AS rel, {_subj_expr()} AS subj,
             {_obj_expr(False)} AS obj
      FROM facts)
SELECT url, i,
       CASE WHEN lang = 'zh'
            THEN rel || '； 头实体：' || subj || '； 尾实体：' || obj
            ELSE rel || '; subject:' || subj || '; object:' || obj
       END AS cond,
       rel AS rel_rt, subj AS subj_rt, obj AS obj_rt
FROM r"""


def metric_f1_perfect_sql() -> str:
    """MetricF1 row assuming the pipeline is exact: P = R = F1 = 1.0."""
    return f"""WITH {_DOCS_CTE}, {_FACTS_CTE},
g AS (SELECT DISTINCT {URL_EXPR} AS url, {_RELS}[rel_idx + 1] AS pred,
             {_subj_expr()} AS subj, {_obj_expr(False)} AS obj FROM facts)
SELECT CAST(count(*) AS BIGINT) AS correct, CAST(count(*) AS BIGINT) AS output,
       CAST(count(*) AS BIGINT) AS golden,
       1.0 AS precision, 1.0 AS recall, 1.0 AS f1
FROM g"""


def _slot_case(col: str, idx: int) -> str:
    return (
        f"CASE WHEN {col} = 'zh' THEN '{S.ZH_SLOTS[idx]}' "
        f"ELSE '{S.EN_SLOTS[idx]}' END"
    )


def _rl_base_ctes() -> str:
    """docs → facts → r (one row per rendered fact sentence, with its
    primary/alt rendering flag) → gate (one row per detected (url, rel)) —
    the CTE spine shared by every RL oracle."""
    is_alt = f"(lang = 'en' AND (doc_id*3 + i) % 4 = 0 AND {_in('rel_idx', _ALT_RELS)})"
    return f"""{_DOCS_CTE}, {_FACTS_CTE},
r AS (SELECT doc_id, lang, i, rel_idx, {URL_EXPR} AS url,
             {_RELS}[rel_idx + 1] AS rel,
             {_subj_expr()} AS subj, {_obj_expr(False)} AS obj,
             {is_alt} AS is_alt
      FROM facts),
gate AS (SELECT url, lang, rel_idx, any_value(rel) AS rel FROM r GROUP BY url, lang, rel_idx)"""


def _rl_trans_ctes() -> str:
    """Extends the base spine to ``trans``: the expected E13 transitions
    table (one row per processed (state, action), lang carried through)."""
    return f"""{_rl_base_ctes()},
prim_subj AS (SELECT DISTINCT url, lang, rel_idx, subj FROM r WHERE NOT is_alt),
n_prim AS (SELECT url, rel_idx, count(*) AS n FROM prim_subj GROUP BY url, rel_idx),
step0 AS (
  SELECT g.url, g.lang, g.rel, 0 AS step, '' AS given, {_slot_case('g.lang', 0)} AS action,
         CASE WHEN np.n IS NULL THEN 3.0 ELSE 2.5 END AS reward,
         0 AS done, CAST(coalesce(np.n, 1) AS INT) AS n_next
  FROM gate g LEFT JOIN n_prim np ON g.url = np.url AND g.rel_idx = np.rel_idx
),
obj_per_subj AS (
  SELECT url, lang, rel_idx, subj, obj,
         max(CASE WHEN is_alt THEN 1.2 ELSE 2.5 END) AS logit
  FROM r GROUP BY url, lang, rel_idx, subj, obj
),
step1 AS (
  SELECT o.url, o.lang, any_value(g.rel) AS rel, 1 AS step, o.subj AS given,
         {_slot_case('o.lang', 1)} AS action, round(avg(o.logit), 6) AS reward,
         1 AS done, CAST(count(*) AS INT) AS n_next
  FROM obj_per_subj o
  JOIN prim_subj p ON o.url = p.url AND o.rel_idx = p.rel_idx AND o.subj = p.subj
  JOIN gate g ON o.url = g.url AND o.rel_idx = g.rel_idx
  GROUP BY o.url, o.lang, o.rel_idx, o.subj
),
step1_none AS (
  SELECT g.url, g.lang, g.rel, 1 AS step, '{S.NONE_SENTINEL}' AS given,
         {_slot_case('g.lang', 1)} AS action, 3.0 AS reward, 1 AS done, 1 AS n_next
  FROM gate g LEFT JOIN n_prim np ON g.url = np.url AND g.rel_idx = np.rel_idx
  WHERE np.n IS NULL
),
trans AS (
  SELECT url, lang, rel, CAST(step AS INT) AS step, given, action, reward,
         CAST(done AS INT) AS done, n_next FROM step0
  UNION ALL
  SELECT url, lang, rel, CAST(step AS INT), given, action, reward,
         CAST(done AS INT), n_next FROM step1
  UNION ALL
  SELECT url, lang, rel, CAST(step AS INT), given, action, reward,
         CAST(done AS INT), n_next FROM step1_none
)"""


def _rl_feat_ext() -> str:
    """``cnt``/``feat`` extension over the base spine: per detected
    (url, rel) the clipped primary/alt connector fractions that
    ``scorers.featurize`` reads off the page text — a primary-rendered fact
    sentence contributes exactly one occurrence of its relation's primary
    connector (and alt correspondingly), so the text-count features are
    fact-render counts."""
    return """cnt AS (SELECT url, rel_idx,
               count(*) FILTER (WHERE NOT is_alt) AS prim_n,
               count(*) FILTER (WHERE is_alt) AS alt_n
        FROM r GROUP BY url, rel_idx),
feat AS (SELECT g.url, g.lang, g.rel,
                least(coalesce(c.prim_n, 0), 4) / 4.0 AS prim,
                least(coalesce(c.alt_n, 0), 4) / 4.0 AS alt
         FROM gate g LEFT JOIN cnt c
           ON g.url = c.url AND g.rel_idx = c.rel_idx)"""


def rl_transitions_sql() -> str:
    """Expected E13 transitions table for a SEQUENCE-ordered rollout —
    ``rl_train.generate_transitions`` with ε = 0 and zero-initialized
    weights (all Q equal → first-max tie-break → schema order), relations
    only. One row per processed (state, action):

    step 0 (action = first slot): one row per gated (url, rel); candidates
    are the distinct subjects of PRIMARY-rendered facts (subject extraction
    is primary-connector-only), reward = mean per-mention max logit = 2.5,
    or the '[None]' fallback (reward 3.0, one fork) when every fact of the
    relation is alt-rendered. done = false (one slot remains).

    step 1 (action = second slot): one row per fork. For a real subject s:
    candidates are the distinct objects of facts with subject s under ANY
    connector (primary logit 2.5, alt 1.2, max per mention), reward = mean
    over distinct objects. For the '[None]' fork nothing anchors → the
    fallback again (reward 3.0, n_next 1). done = true.
    """
    return f"""WITH {_rl_trans_ctes()}
SELECT url, rel, step, given, action, reward, done, n_next FROM trans"""


def _q_affine(
    w: list[float], rel: str, lang: str, slot_idx: int, n_assigned: int
) -> tuple[float, float, float]:
    """(c0, cp, ca) with w·φ(state, slot) = c0 + cp·prim + ca·alt, where
    prim/alt are featurize's clipped connector-count fractions (the ONLY
    text-dependent features). Derived by probing ``scorers.featurize`` on
    texts with known connector counts — exact because all probe weights and
    feature values are binary fractions."""
    from . import scorers

    slot = (S.ZH_SLOTS if lang == "zh" else S.EN_SLOTS)[slot_idx]
    assigned = {f"k{j}": "v" for j in range(n_assigned)}
    conns = (S.ZH_TEMPLATES if lang == "zh" else S.EN_TEMPLATES)[rel]
    prim_c = next(c for c, p in conns if p)
    alt_c = next((c for c, p in conns if not p), None)
    c0 = scorers.linear_q(w, "", rel, lang, assigned, slot)
    cp = 4.0 * (scorers.linear_q(w, prim_c, rel, lang, assigned, slot) - c0)
    ca = 0.0
    if alt_c is not None:
        ca = 4.0 * (scorers.linear_q(w, alt_c, rel, lang, assigned, slot) - c0)
    return c0, cp, ca


def dqn_td_sql() -> str:
    """Expected iteration-1 fitted-Q TD pass (E14, ref RL_utils/dqn.py:
    126-152) under the fixed PROBE weights: q_pred = w·φ(s, a), target =
    r + γ·next_q·(1−done) with next_q = mean over forks of max over
    remaining choices of w_target·φ — for two-slot relations every fork at
    step 0 leaves the same single remaining slot and φ depends on assigned
    only through its SIZE, so next_q collapses to one affine expression in
    (prim, alt). All weight/feature values are binary fractions chosen so
    every emitted number is an exact multiple of 1/64 (6 decimals)."""
    from .operators.rl_train import GAMMA, PROBE_W, PROBE_W_TARGET

    rows = []
    for rel, _st, _ot in S.RELATIONS:
        for lang in ("en", "zh"):
            t0, tp, ta = _q_affine(PROBE_W_TARGET, rel, lang, 1, 1)
            for step in (0, 1):
                c0, cp, ca = _q_affine(PROBE_W, rel, lang, step, step)
                rows.append(
                    f"('{rel}', '{lang}', {step}, {c0!r}, {cp!r}, {ca!r}, "
                    f"{t0!r}, {tp!r}, {ta!r})"
                )
    coef = (
        "coef AS (SELECT * FROM (VALUES\n  "
        + ",\n  ".join(rows)
        + "\n) AS t(crel, clang, cstep, c0, cp, ca, t0, tp, ta))"
    )
    q_pred = "k.c0 + k.cp * f.prim + k.ca * f.alt"
    target = (
        "t.reward + CASE WHEN t.done = 1 THEN 0.0 "
        f"ELSE {GAMMA!r} * (k.t0 + k.tp * f.prim + k.ta * f.alt) END"
    )
    return f"""WITH {_rl_trans_ctes()},
{_rl_feat_ext()},
{coef}
SELECT t.url, t.rel, t.step, t.given, t.action,
       round({q_pred}, 6) AS q_pred,
       round({target}, 6) AS td_target,
       round(({q_pred}) - ({target}), 6) AS td_err
FROM trans t
JOIN feat f ON t.url = f.url AND t.rel = f.rel AND t.lang = f.lang
JOIN coef k ON k.crel = t.rel AND k.clang = t.lang AND k.cstep = t.step"""


def learned_policy_sql() -> str:
    """Expected opening-action distribution of the FIXED-weights learned
    policy (``rl_train.first_actions`` with PROBE_POLICY_W): per (url, rel)
    the policy opens with slot1 iff q(slot1) − q(slot0) > 0 (strict — the
    first-max tie-break keeps slot0 on ties, like torch.argmax), and the
    margin is an affine function of (prim, alt) with coefficients computed
    here from the same featurize probe as dqn_td_sql."""
    from .operators.rl_train import PROBE_POLICY_W

    rows = []
    for rel, _st, _ot in S.RELATIONS:
        for lang in ("en", "zh"):
            a0 = _q_affine(PROBE_POLICY_W, rel, lang, 0, 0)
            a1 = _q_affine(PROBE_POLICY_W, rel, lang, 1, 0)
            d0, dp, da = a1[0] - a0[0], a1[1] - a0[1], a1[2] - a0[2]
            s0 = (S.ZH_SLOTS if lang == "zh" else S.EN_SLOTS)[0]
            s1 = (S.ZH_SLOTS if lang == "zh" else S.EN_SLOTS)[1]
            rows.append(
                f"('{rel}', '{lang}', {d0!r}, {dp!r}, {da!r}, '{s0}', '{s1}')"
            )
    coef = (
        "coef AS (SELECT * FROM (VALUES\n  "
        + ",\n  ".join(rows)
        + "\n) AS t(crel, clang, d0, dp, da, s0, s1))"
    )
    return f"""WITH {_rl_base_ctes()},
{_rl_feat_ext()},
{coef}
SELECT f.rel,
       CASE WHEN k.d0 + k.dp * f.prim + k.da * f.alt > 0
            THEN k.s1 ELSE k.s0 END AS action,
       CAST(count(*) AS BIGINT) AS n
FROM feat f
JOIN coef k ON k.crel = f.rel AND k.clang = f.lang
GROUP BY 1, 2"""


def rl_event_transitions_sql() -> str:
    """Expected E13 transitions for the 3-role EVENT episodes (sequence
    order under ε = 0 / zero weights): role0 → role1 → role2. Every event
    doc renders exactly one event sentence, so each extraction step has
    exactly one candidate (logit 2.5 → reward 2.5, one fork). ``given`` is
    '' at step 0, the role-0 value at step 1, and at step 2 the
    key-sorted JSON of the two assigned roles — rendered here byte-for-byte
    (json.dumps with default separators, ensure_ascii=False)."""
    selects = []
    for etype, gate, vals, _lang in _event_rows():
        ev = S.EVENTS[etype]
        r0, r1, r2 = ev["roles"]
        v = {r: vals[r] for r in ev["roles"]}
        # step-2 given: JSON object over the two assigned roles, keys sorted
        (ka, kb) = sorted([r0, r1])
        j = (
            "'{\"" + ka + "\": \"' || " + v[ka] + " || '\", \"" + kb
            + "\": \"' || " + v[kb] + " || '\"}'"
        )
        base = f"SELECT {URL_EXPR} AS url, '{etype}' AS rel"
        selects.append(
            f"{base}, 0 AS step, '' AS given, '{r0}' AS action, "
            f"2.5 AS reward, 0 AS done, 1 AS n_next FROM docs WHERE {gate}"
        )
        selects.append(
            f"{base}, 1 AS step, {v[r0]} AS given, '{r1}' AS action, "
            f"2.5 AS reward, 0 AS done, 1 AS n_next FROM docs WHERE {gate}"
        )
        selects.append(
            f"{base}, 2 AS step, {j} AS given, '{r2}' AS action, "
            f"2.5 AS reward, 1 AS done, 1 AS n_next FROM docs WHERE {gate}"
        )
    body = "\nUNION ALL\n".join(selects)
    return f"WITH {_DOCS_CTE}\n{body}"


def paragraph_dedup_sql(chunk: int = 8) -> str:
    """Replicates operators.dedup.paragraph_dedup over the documents table
    with ``chunk``-word synthetic paragraphs (the driver corpus is
    single-line, so the query wrapper derives the paragraph structure from
    the SAME arithmetic on both sides): keep the first corpus-order
    (doc_id, pos) occurrence of each distinct paragraph, reassemble."""
    return f"""WITH w AS (SELECT doc_id, str_split(text, ' ') AS w FROM documents),
ln AS (SELECT doc_id, i,
              array_to_string(w[i*{chunk}+1:i*{chunk}+{chunk}], ' ') AS line
       FROM (SELECT doc_id, w,
                    unnest(range(CAST(ceil(len(w)/{chunk}.0) AS INT))) AS i
             FROM w)),
r AS (SELECT doc_id, i, line,
             row_number() OVER (PARTITION BY line ORDER BY doc_id, i) AS rn
      FROM ln)
SELECT doc_id,
       coalesce(string_agg(CASE WHEN rn = 1 THEN line END, chr(10) ORDER BY i),
                '') AS text_dedup,
       CAST(count(*) AS BIGINT) AS n_lines,
       CAST(sum(CASE WHEN rn = 1 THEN 0 ELSE 1 END) AS BIGINT) AS n_dropped
FROM r GROUP BY doc_id"""


def decontaminate_sql(n: int = 5, threshold: float = 0.05, bench_mod: int = 10,
                      bench_rem: int = 7) -> str:
    """Replicates operators.dedup.decontaminate: training docs
    (doc_id % bench_mod != bench_rem) scored by the fraction of their
    distinct word n-grams that appear in the benchmark split's n-gram set.
    Mirrors word_shingles' shorter-than-n behavior (one whole-string gram
    via greatest(len-n+1, 1))."""
    grams = f"""SELECT doc_id,
       array_to_string(w[i+1:i+{n}], ' ') AS g
FROM (SELECT doc_id, w, unnest(range(greatest(len(w) - {n - 1}, 1))) AS i
      FROM (SELECT doc_id, str_split(text, ' ') AS w FROM documents))"""
    return f"""WITH grams AS ({grams}),
bg AS (SELECT DISTINCT g FROM grams WHERE doc_id % {bench_mod} = {bench_rem}),
tg AS (SELECT DISTINCT doc_id, g FROM grams
       WHERE doc_id % {bench_mod} <> {bench_rem}),
agg AS (SELECT tg.doc_id,
               count(*) AS n_grams,
               sum(CASE WHEN bg.g IS NOT NULL THEN 1 ELSE 0 END) AS n_matched
        FROM tg LEFT JOIN bg USING (g) GROUP BY tg.doc_id)
SELECT doc_id, CAST(n_grams AS BIGINT) AS n_grams,
       CAST(n_matched AS BIGINT) AS n_matched,
       round(n_matched * 1.0 / n_grams, 6) AS contam_frac,
       CAST(n_matched * 1.0 / n_grams >= {threshold} AS INT) AS contaminated
FROM agg"""


# Deterministic boilerplate the substring_dedup query wrapper appends to
# every (doc_id % SUBSTR_BOILER_MOD == 0) document so the corpus contains
# cross-document duplicated >=L-token runs (the driver corpus's natural
# texts rarely share exact 8-grams at sf0.01). Both engines see the SAME
# synthesized input — the wrapper builds it with concat, this module
# mirrors it in SQL (the pii_scrub injection precedent).
SUBSTR_BOILER = (
    "subscribe to our newsletter for updates terms of service apply "
    "all rights reserved"
)
SUBSTR_BOILER_MOD = 3


def substring_dedup_sql(length: int = 8) -> str:
    """Replicates operators.dedup.substring_dedup over documents with the
    query wrapper's boilerplate injection: every corpus-order-repeated run
    of ``length`` consecutive word tokens is removed token-wise except its
    first (doc_id, pos) occurrence; documents reassemble from surviving
    tokens."""
    ln = int(length)
    return f"""WITH base AS (
  SELECT doc_id,
         CASE WHEN doc_id % {SUBSTR_BOILER_MOD} = 0
              THEN text || ' {SUBSTR_BOILER}' ELSE text END AS text
  FROM documents),
toks AS (SELECT doc_id, str_split(text, ' ') AS w FROM base),
tok AS (SELECT doc_id, generate_subscripts(w, 1) - 1 AS pos, unnest(w) AS word
        FROM toks),
g AS (SELECT doc_id, i AS pos,
             md5(array_to_string(w[i+1:i+{ln}], ' ')) AS key
      FROM (SELECT doc_id, w, unnest(range(len(w) - {ln - 1})) AS i
            FROM toks WHERE len(w) >= {ln})),
r AS (SELECT doc_id, pos,
             row_number() OVER (PARTITION BY key ORDER BY doc_id, pos) AS rn
      FROM g),
cov AS (SELECT DISTINCT doc_id, tok FROM
          (SELECT doc_id, unnest(range(pos, pos + {ln})) AS tok
           FROM r WHERE rn > 1)),
m AS (SELECT t.doc_id, t.pos, t.word, cov.tok IS NOT NULL AS dup
      FROM tok t LEFT JOIN cov
        ON cov.doc_id = t.doc_id AND cov.tok = t.pos)
SELECT doc_id,
       coalesce(string_agg(CASE WHEN NOT dup THEN word END, ' ' ORDER BY pos),
                '') AS text_dedup,
       CAST(count(*) AS BIGINT) AS n_tokens,
       CAST(sum(CASE WHEN dup THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_tokens
FROM m GROUP BY doc_id"""


def bm25_sql(query_terms: list[str], k1: float = 1.2, b: float = 0.75) -> str:
    """Replicates operators.textstats.bm25_score over documents: Okapi
    BM25 with the Lucene ``1 +`` idf, identical expression trees (the
    constants are pre-folded the same way the Spark plan folds them)."""
    terms = ", ".join(sql_str(t) for t in query_terms)
    return f"""WITH d AS (SELECT doc_id, len(str_split(text, ' ')) AS dl,
              str_split(text, ' ') AS w FROM documents),
stats AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM d),
tok AS (SELECT doc_id, dl, unnest(w) AS term FROM d),
tf AS (SELECT doc_id, dl, term, count(*) AS tf FROM tok
       WHERE term IN ({terms}) GROUP BY doc_id, dl, term),
dft AS (SELECT term, count(*) AS df_t FROM tf GROUP BY term),
sc AS (SELECT tf.doc_id,
              ln(1.0 + (s.n_docs - dft.df_t + 0.5) / (dft.df_t + 0.5))
              * (tf.tf * {float(k1) + 1.0!r})
              / (tf.tf + {float(k1)!r} * ({1.0 - float(b)!r}
                 + {float(b)!r} * tf.dl / s.avgdl)) AS contrib
       FROM tf JOIN dft USING (term) CROSS JOIN stats s),
agg AS (SELECT doc_id, round(sum(contrib), 6) AS score,
               count(*) AS n_matched FROM sc GROUP BY doc_id)
SELECT d.doc_id, coalesce(agg.score, 0.0) AS score,
       CAST(coalesce(agg.n_matched, 0) AS BIGINT) AS n_matched
FROM d LEFT JOIN agg USING (doc_id)"""


def _dsir_ctes(
    source: str = "documents", n_buckets: int = 256, k: float = 0.5,
    target_mod: int = 10, target_rem: int = 7, seed: str = "|dsir",
) -> str:
    """CTE chain ending in ``dweights(doc_id, n_grams, log_weight)`` over a
    (doc_id, text) CTE/table named ``source`` — shared by the standalone
    dsir oracle and the composed curation-pipeline oracle."""
    kr, B = repr(float(k)), int(n_buckets)
    return f"""w AS (
  SELECT doc_id, doc_id % {target_mod} = {target_rem} AS is_target,
         str_split(text, ' ') AS ws
  FROM {source} WHERE len(str_split(text, ' ')) >= 2),
grams AS MATERIALIZED (
  SELECT doc_id, is_target,
         ('0x' || substr(md5(
            unnest(list_transform(range(1, len(ws)), i -> ws[i] || ' ' || ws[i+1]))
            || '{seed}'), 1, 15))::BIGINT % {B} AS bucket
  FROM w),
raw AS (SELECT bucket, count(*) AS c_raw FROM grams GROUP BY bucket),
tgt AS (SELECT bucket, count(*) AS c_tgt FROM grams WHERE is_target GROUP BY bucket),
n_raw AS (SELECT count(*) AS n_raw FROM grams),
n_tgt AS (SELECT count(*) AS n_tgt FROM grams WHERE is_target),
ratio AS (
  SELECT raw.bucket,
         ln((coalesce(tgt.c_tgt, 0) + {kr}) / (n_tgt.n_tgt + {float(k) * B!r}))
         - ln((raw.c_raw + {kr}) / (n_raw.n_raw + {float(k) * B!r})) AS logratio
  FROM raw LEFT JOIN tgt USING (bucket) CROSS JOIN n_raw CROSS JOIN n_tgt),
dweights AS (
  SELECT g.doc_id, CAST(count(*) AS BIGINT) AS n_grams,
         round(sum(r.logratio), 6) AS log_weight
  FROM grams g JOIN ratio r USING (bucket)
  GROUP BY g.doc_id)"""


def dsir_sql(
    n_buckets: int = 256, k: float = 0.5, target_mod: int = 10,
    target_rem: int = 7, seed: str = "|dsir",
) -> str:
    """Replicates operators.textstats.dsir_weights over documents with the
    ``doc_id % target_mod == target_rem`` subset as the target domain:
    hashed-bigram (portable 60-bit md5 hash mod B) add-k bucket models,
    per-doc sum of ln-ratio rounded to 6 (absorbs float-sum ordering and
    1-ulp libm-log differences, the lm_perplexity parity rule)."""
    ctes = _dsir_ctes("documents", n_buckets, k, target_mod, target_rem, seed)
    return f"""WITH {ctes}
SELECT doc_id, n_grams, log_weight FROM dweights"""


def curation_pipeline_sql(
    n_buckets: int = 256, budget: int = 128, n_shards: int = 4,
) -> str:
    """The composed round-5 curation pipeline: URL-canonical dedup winners
    → DSIR importance weights over the survivors → keep log_weight > 0 →
    concat-and-chunk packing. Recomputes the WHOLE composition from the
    shared CTE fragments (_url_chain_ctes, _dsir_ctes, _pack_sql), so the
    stage interfaces are verified jointly."""
    return f"""WITH {_url_chain_ctes()},
uwin AS (SELECT min(doc_id) AS doc_id FROM curl GROUP BY url_canonical),
dk AS MATERIALIZED (
  SELECT d.doc_id, d.text FROM documents d JOIN uwin USING (doc_id)),
{_dsir_ctes("dk", n_buckets)},
sel AS (
  SELECT dk.doc_id, dk.text FROM dk JOIN dweights USING (doc_id)
  WHERE log_weight > 0),
{_pack_sql("sel", budget, n_shards)}"""


def _url_chain_ctes() -> str:
    """CTE chain ending in ``curl(doc_id, url, url_canonical)`` — the
    synthesized messy URLs + the canonical_url normalization chain, shared
    by the standalone url_dedup oracle and the composed curation-pipeline
    oracle so the rule order exists exactly once."""
    return r"""p AS (SELECT doc_id,
  (CASE doc_id % 3 WHEN 0 THEN 'https://WWW.Example.COM'
                   WHEN 1 THEN 'https://www.example.com'
                   ELSE 'http://news.site.org' END)
  || (CASE WHEN doc_id % 2 = 0 THEN ':443' ELSE '' END)
  || '/Article/' || CAST(doc_id % 40 AS VARCHAR)
  || (CASE WHEN doc_id % 5 = 0 THEN '/' ELSE '' END)
  || (CASE doc_id % 4 WHEN 0 THEN '?utm_source=feed&utm_campaign=x'
                      WHEN 1 THEN '?utm_medium=a&ref=2' ELSE '' END)
  || (CASE WHEN doc_id % 7 = 0 THEN '#section-2' ELSE '' END) AS url
 FROM documents),
c1 AS (SELECT doc_id, url,
              regexp_replace(url, '#.*$', '') AS u FROM p),
c2 AS (SELECT doc_id, url,
              regexp_replace(u, '[?&]utm_[^&]*', '', 'g') AS u FROM c1),
c3 AS (SELECT doc_id, url,
              regexp_replace(u, '^([^?&]*)&', '\1?') AS u FROM c2),
c4 AS (SELECT doc_id, url,
              regexp_replace(u, '\?$', '') AS u FROM c3),
c5 AS (SELECT doc_id, url,
              regexp_replace(u, '^(https?://[^/:]+):(?:80|443)([/?]|$)',
                             '\1\2') AS u FROM c4),
c6 AS (SELECT doc_id, url,
              CASE WHEN regexp_extract(u, '^(https?://[^/]+)', 1) = ''
                   THEN u
                   ELSE lower(regexp_extract(u, '^(https?://[^/]+)', 1))
                        || regexp_replace(u, '^https?://[^/]+', '')
              END AS u FROM c5),
curl AS (SELECT doc_id, url,
               regexp_replace(u, '/$', '') AS url_canonical FROM c6)"""


def url_dedup_sql() -> str:
    """Replicates pipeline.canonical_url + pipeline.url_dedup over the
    q_url_dedup wrapper's synthesized messy URLs: the identical fixed-order
    normalization chain (fragment, utm_*, orphaned '&', dangling '?',
    default ports, host lowercasing, trailing slash), then lowest-doc_id
    winner per canonical URL."""
    return f"""WITH {_url_chain_ctes()}
SELECT doc_id, url, url_canonical,
       doc_id = min(doc_id) OVER (PARTITION BY url_canonical) AS keep
FROM curl"""


def pii_scrub_sql() -> str:
    """Replicates operators.textstats.pii_scrub over documents with the
    query wrapper's deterministic PII injection: sequential
    count-then-replace per pattern, so each rule sees the previous rule's
    redacted text — byte-identical to the Spark pass."""
    from .operators.textstats import PII_PATTERNS

    inject = """text
      || CASE WHEN doc_id % 3 = 0
              THEN ' contact user' || CAST(doc_id % 1000 AS VARCHAR)
                   || '@mail' || CAST(doc_id % 7 AS VARCHAR) || '.example.com'
              ELSE '' END
      || CASE WHEN doc_id % 4 = 1
              THEN ' call +1 555-01' || lpad(CAST(doc_id % 100 AS VARCHAR), 2, '0')
                   || '-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
              ELSE '' END
      || CASE WHEN doc_id % 5 = 2
              THEN ' from host ' || CAST(doc_id % 256 AS VARCHAR) || '.0.'
                   || CAST(doc_id % 100 AS VARCHAR) || '.1 port 80'
              ELSE '' END"""
    sql = f"WITH s0 AS (SELECT doc_id, {inject} AS t FROM documents)"
    prev = "s0"
    for k, (kind, pat, rep) in enumerate(PII_PATTERNS, start=1):
        p = pat.replace("'", "''")
        sql += (
            f",\ns{k} AS (SELECT doc_id, "
            + ", ".join(f"n_{pk}" for pk, _, _ in PII_PATTERNS[: k - 1])
            + (", " if k > 1 else "")
            + f"CAST(len(regexp_extract_all(t, '{p}')) AS BIGINT) AS n_{kind}, "
            f"regexp_replace(t, '{p}', '{rep}', 'g') AS t FROM {prev})"
        )
        prev = f"s{k}"
    cols = ", ".join(f"n_{kind}" for kind, _, _ in PII_PATTERNS)
    sql += f"\nSELECT doc_id, {cols}, t AS text_redacted FROM {prev}"
    return sql


def _pagerank_parts(
    setup: str,
    damping: float,
    iters: int,
    alias: str = "entity",
    weighted: bool = False,
) -> tuple[str, str, str]:
    """Shared damped-PageRank unroller: ``setup`` is a WITH-body fragment
    whose LAST CTE must be ``e(src, dst)`` (the distinct edge list). The
    recurrence mirrors operators.graph.entity_pagerank term-for-term
    (uniform dangling redistribution, round(…, 6)); float literals are
    embedded via repr() of the SAME python values the Spark plan uses, so
    the only drift source is float-sum ordering — absorbed by the round.
    Returns (complete query, WITH-body for composition, final rank CTE
    name)."""
    d = float(damping)
    omd = 1.0 - d
    prev = "r0"
    carry = ", b.out_w" if weighted else ""
    share = "r.rank * e.w / r.out_w" if weighted else "r.rank / r.out_deg"
    iter_ctes = ""
    for k in range(1, iters + 1):
        iter_ctes += f""",
r{k} AS (
  SELECT b.node, b.out_deg{carry},
         {omd!r} / (SELECT n FROM nn)
         + {d!r} * (coalesce(c.m, 0.0)
                    + (SELECT coalesce(sum(rank), 0.0) FROM {prev} WHERE out_deg = 0)
                      / (SELECT n FROM nn)) AS rank
  FROM base b
  LEFT JOIN (SELECT e.dst, sum({share}) AS m
             FROM {prev} r JOIN e ON r.node = e.src
             WHERE r.out_deg > 0 GROUP BY e.dst) c ON b.node = c.dst
)"""
        prev = f"r{k}"
    od = (
        "od AS (SELECT src, count(*) AS out_deg,"
        " CAST(sum(w) AS BIGINT) AS out_w FROM e GROUP BY src)"
        if weighted
        else "od AS (SELECT src, count(*) AS out_deg FROM e GROUP BY src)"
    )
    base_w = ", coalesce(od.out_w, 0) AS out_w" if weighted else ""
    body = f"""{setup},
nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
{od},
idg AS (SELECT dst, count(*) AS in_deg FROM e GROUP BY dst),
base AS (SELECT node, coalesce(od.out_deg, 0) AS out_deg,
                coalesce(idg.in_deg, 0) AS in_deg{base_w}
         FROM nodes LEFT JOIN od ON node = od.src
                    LEFT JOIN idg ON node = idg.dst),
nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM base),
r0 AS (SELECT node, out_deg{", out_w" if weighted else ""},
       1.0 / (SELECT n FROM nn) AS rank FROM base){iter_ctes}"""
    return f"""WITH {body}
SELECT b.node AS {alias}, CAST(b.out_deg AS BIGINT) AS out_deg,
       CAST(b.in_deg AS BIGINT) AS in_deg, round(r.rank, 6) AS pagerank
FROM base b JOIN {prev} r ON b.node = r.node""", body, prev


def _pagerank_unrolled(
    setup: str, damping: float, iters: int, alias: str = "entity"
) -> str:
    return _pagerank_parts(setup, damping, iters, alias)[0]


def pagerank_sql(damping: float = 0.85, iters: int = 3) -> str:
    """Replicates operators.graph.entity_pagerank over the gold triple
    graph: fixed-depth damped PageRank with uniform dangling redistribution,
    unrolled one CTE per iteration (see _pagerank_unrolled)."""
    setup = f"""{_DOCS_CTE}, {_FACTS_CTE},
g AS (SELECT DISTINCT {_subj_expr()} AS subj, {_obj_expr(False)} AS obj FROM facts),
e AS (SELECT DISTINCT subj AS src, obj AS dst FROM g)"""
    return _pagerank_unrolled(setup, damping, iters, "entity")


def _gold_graph_ctes(canonical: bool = False) -> str:
    """Shared (pred, subj, obj) gold-triple CTE ``g`` — the single source the
    graph-reasoning oracles (rule inference / closure / BFS / triangles)
    build on, so the triple semantics cannot drift between them.
    ``canonical=True`` uses the post-linking canonical surfaces."""
    return (
        f"{_DOCS_CTE}, {_FACTS_CTE},\n"
        f"g AS (SELECT DISTINCT {_RELS}[rel_idx + 1] AS pred,\n"
        f"      {_subj_expr()} AS subj, {_obj_expr(canonical)} AS obj FROM facts)"
    )


def rule_inference_sql(
    rules: list[tuple[str, str, str]], canonical: bool = False
) -> str:
    """Replicates operators.graph.rule_inference: one equi-join per
    property-chain rule over the gold triple graph, unioned. With
    ``canonical=True`` the composition additionally verifies the linking +
    CC canonicalization stages the Spark side runs upstream."""
    parts = [
        f"""SELECT DISTINCT a.subj AS subj, {sql_str(out)} AS pred, b.obj AS obj
FROM g a JOIN g b ON a.obj = b.subj
WHERE a.pred = {sql_str(pa)} AND b.pred = {sql_str(pb)}"""
        for pa, pb, out in rules
    ]
    return f"WITH {_gold_graph_ctes(canonical)}\n" + "\nUNION ALL\n".join(parts)


def transitive_closure_sql(pred: str = "acquired", max_depth: int = 8) -> str:
    """Replicates operators.graph.transitive_closure via WITH RECURSIVE with
    UNION (distinct-row) semantics: enumerates every (src, dst, depth ≤ cap)
    triple — min(depth) per pair IS the BFS-minimal hop count, exactly what
    the Spark semi-naive frontier emits."""
    return f"""WITH RECURSIVE {_gold_graph_ctes()},
e AS (SELECT DISTINCT subj AS src, obj AS dst FROM g WHERE pred = {sql_str(pred)}),
paths(src, dst, depth) AS (
  SELECT src, dst, 1 FROM e
  UNION
  SELECT p.src, q.dst, p.depth + 1
  FROM paths p JOIN e q ON p.dst = q.src
  WHERE p.depth < {max_depth}
)
SELECT src, dst, CAST(min(depth) AS INT) AS depth FROM paths GROUP BY src, dst"""


def bfs_sql(seeds: list[str], max_depth: int = 6) -> str:
    """Replicates operators.graph.bfs_distances over the full (all
    predicates) gold entity graph from a literal seed set."""
    seed_rows = ", ".join(f"({sql_str(s)})" for s in seeds)
    return f"""WITH RECURSIVE {_gold_graph_ctes()},
e AS (SELECT DISTINCT subj AS src, obj AS dst FROM g),
reach(node, dist) AS (
  SELECT node, 0 FROM (VALUES {seed_rows}) s(node)
  UNION
  SELECT q.dst, p.dist + 1
  FROM reach p JOIN e q ON p.node = q.src
  WHERE p.dist < {max_depth}
)
SELECT node, CAST(min(dist) AS INT) AS dist FROM reach GROUP BY node"""


def triangles_sql() -> str:
    """Replicates operators.graph.triangle_counts with LEXICOGRAPHIC edge
    orientation — any acyclic orientation enumerates the identical triangle
    set, so matching counts also verify the Spark side's degree-ordered
    orientation logic."""
    return f"""WITH {_gold_graph_ctes()},
und AS (SELECT DISTINCT least(subj, obj) AS u, greatest(subj, obj) AS v
        FROM g WHERE subj <> obj),
tri AS (SELECT e1.u AS a, e1.v AS b, e2.v AS c
        FROM und e1
        JOIN und e2 ON e2.u = e1.v
        JOIN und e3 ON e3.u = e1.u AND e3.v = e2.v),
m AS (SELECT a AS entity FROM tri
      UNION ALL SELECT b FROM tri
      UNION ALL SELECT c FROM tri)
SELECT entity, count(*) AS triangles FROM m GROUP BY entity"""


def incremental_delta_sql(mod: int = 10) -> str:
    """Replicates pipeline.incremental_delta over the gold triples: new
    batch = doc_id % mod = 0, snapshot = the rest; NOT EXISTS on the full
    fact key mirrors the Spark left_anti join."""
    return f"""WITH {_DOCS_CTE}, {_FACTS_CTE},
t AS (SELECT doc_id, {URL_EXPR} AS url, {_RELS}[rel_idx + 1] AS pred,
      {_subj_expr()} AS subj, {_obj_expr(False)} AS obj FROM facts),
newt AS (SELECT DISTINCT url, pred, subj, obj FROM t WHERE doc_id % {mod} = 0),
oldt AS (SELECT DISTINCT pred, subj, obj FROM t WHERE doc_id % {mod} <> 0)
SELECT n.url, n.pred, n.subj, n.obj FROM newt n
WHERE NOT EXISTS (SELECT 1 FROM oldt o
                  WHERE o.pred = n.pred AND o.subj = n.subj AND o.obj = n.obj)"""


def _transe_ctes(
    dim: int = 4,
    iters: int = 2,
    lr: float = 0.05,
    margin: float = 1.0,
    neg_offset: int = 7,
) -> tuple[str, str, str]:
    """CTE chain replicating operators.kge.transe_train term-for-term:
    integer-arithmetic init, rank-shift corrupted tails, per-dim dp/dn
    tables, hinge decisions on round(margin+sp−sn, 9), gradient sums keyed
    (name, d). Returns (ctes, final_ent_cte, final_rel_cte)."""
    ea, eb, em = 37, 101, 97
    ra, rb, rm = 53, 67, 89
    # MATERIALIZED everywhere a CTE is referenced more than once downstream:
    # DuckDB inlines plain CTEs, and the 4 per-iteration references to the
    # previous embedding table would otherwise re-expand the whole upstream
    # chain — exponential in the iteration count.
    ctes = f"""{_gold_graph_ctes()},
enames AS (SELECT DISTINCT subj AS name FROM g UNION SELECT obj FROM g),
ents AS MATERIALIZED (SELECT name, row_number() OVER (ORDER BY name) - 1 AS rank FROM enames),
nent AS (SELECT count(*) AS n FROM ents),
rnames AS (SELECT DISTINCT pred AS name FROM g),
rels AS MATERIALIZED (SELECT name, row_number() OVER (ORDER BY name) - 1 AS rank FROM rnames),
dims AS (SELECT unnest(range({dim})) AS d),
e0 AS MATERIALIZED (SELECT name, d, ((rank*{ea} + d*{eb}) % {em})/{float(em)!r} - 0.5 AS val
       FROM ents CROSS JOIN dims),
r0 AS MATERIALIZED (SELECT name, d, ((rank*{ra} + d*{rb}) % {rm})/{float(rm)!r} - 0.5 AS val
       FROM rels CROSS JOIN dims),
tq AS (SELECT DISTINCT pred, subj, obj FROM g),
tr AS MATERIALIZED (SELECT t.pred, t.subj, t.obj, e2.name AS neg
       FROM tq t JOIN ents et ON t.obj = et.name
       JOIN ents e2 ON e2.rank = (et.rank + {neg_offset}) % (SELECT n FROM nent))"""
    pe, pr = "e0", "r0"
    for k in range(1, iters + 1):
        ctes += f""",
dp{k} AS MATERIALIZED (SELECT t.pred, t.subj, t.obj, t.neg, h.d,
                 h.val + r.val - tt.val AS dp, h.val + r.val - nn.val AS dn
          FROM tr t
          JOIN {pe} h ON h.name = t.subj
          JOIN {pr} r ON r.name = t.pred AND r.d = h.d
          JOIN {pe} tt ON tt.name = t.obj AND tt.d = h.d
          JOIN {pe} nn ON nn.name = t.neg AND nn.d = h.d),
sc{k} AS (SELECT pred, subj, obj, neg, sum(dp*dp) AS sp, sum(dn*dn) AS sn
          FROM dp{k} GROUP BY pred, subj, obj, neg),
viol{k} AS MATERIALIZED (SELECT d.* FROM dp{k} d
            JOIN sc{k} s ON d.pred = s.pred AND d.subj = s.subj
                        AND d.obj = s.obj AND d.neg = s.neg
            WHERE round({float(margin)!r} + s.sp - s.sn, 9) > 0),
gent{k} AS (SELECT name, d, sum(gv) AS g FROM (
              SELECT subj AS name, d, 2.0*(dp - dn) AS gv FROM viol{k}
              UNION ALL SELECT obj, d, -2.0*dp FROM viol{k}
              UNION ALL SELECT neg, d, 2.0*dn FROM viol{k}) u
            GROUP BY name, d),
grel{k} AS (SELECT pred AS name, d, sum(2.0*(dp - dn)) AS g FROM viol{k}
            GROUP BY pred, d),
e{k} AS MATERIALIZED (SELECT e.name, e.d, round(e.val - {float(lr)!r}*coalesce(gg.g, 0.0) + 2e-11, 9) AS val
         FROM {pe} e LEFT JOIN gent{k} gg ON e.name = gg.name AND e.d = gg.d),
r{k} AS MATERIALIZED (SELECT e.name, e.d, round(e.val - {float(lr)!r}*coalesce(gg.g, 0.0) + 2e-11, 9) AS val
         FROM {pr} e LEFT JOIN grel{k} gg ON e.name = gg.name AND e.d = gg.d)"""
        pe, pr = f"e{k}", f"r{k}"
    return ctes, pe, pr


def transe_sql(**kw) -> str:
    """Trained (kind, name, d, val) embedding table after the unrolled
    TransE trajectory — the closed-form check of the whole training run."""
    ctes, pe, pr = _transe_ctes(**kw)
    return f"""WITH {ctes}
SELECT 'ent' AS kind, name, CAST(d AS INT) AS d, round(val, 6) AS val FROM {pe}
UNION ALL
SELECT 'rel' AS kind, name, CAST(d AS INT) AS d, round(val, 6) AS val FROM {pr}"""


def distmult_sql(
    dim: int = 4,
    iters: int = 2,
    lr: float = 0.05,
    margin: float = 1.0,
    neg_offset: int = 7,
) -> str:
    """CTE chain replicating operators.kge.distmult_train term-for-term:
    same integer init / rank-shift negatives / MATERIALIZED unroll as
    TransE, with the bilinear-diagonal score sum(h·r·t), hinge on
    round(margin − sp + sn, 9), and gradients from the shared nmt = n − t
    intermediate (r·nmt, h·nmt, ∓h·r)."""
    ea, eb, em = 37, 101, 97
    ra, rb, rm = 53, 67, 89
    ctes = f"""{_gold_graph_ctes()},
enames AS (SELECT DISTINCT subj AS name FROM g UNION SELECT obj FROM g),
ents AS MATERIALIZED (SELECT name, row_number() OVER (ORDER BY name) - 1 AS rank FROM enames),
nent AS (SELECT count(*) AS n FROM ents),
rnames AS (SELECT DISTINCT pred AS name FROM g),
rels AS MATERIALIZED (SELECT name, row_number() OVER (ORDER BY name) - 1 AS rank FROM rnames),
dims AS (SELECT unnest(range({dim})) AS d),
e0 AS MATERIALIZED (SELECT name, d, ((rank*{ea} + d*{eb}) % {em})/{float(em)!r} - 0.5 AS val
       FROM ents CROSS JOIN dims),
r0 AS MATERIALIZED (SELECT name, d, ((rank*{ra} + d*{rb}) % {rm})/{float(rm)!r} - 0.5 AS val
       FROM rels CROSS JOIN dims),
tq AS (SELECT DISTINCT pred, subj, obj FROM g),
tr AS MATERIALIZED (SELECT t.pred, t.subj, t.obj, e2.name AS neg
       FROM tq t JOIN ents et ON t.obj = et.name
       JOIN ents e2 ON e2.rank = (et.rank + {neg_offset}) % (SELECT n FROM nent))"""
    pe, pr = "e0", "r0"
    for k in range(1, iters + 1):
        ctes += f""",
dd{k} AS MATERIALIZED (SELECT t.pred, t.subj, t.obj, t.neg, h.d,
                 h.val AS hp, r.val AS rp, tt.val AS tp, nn.val AS np
          FROM tr t
          JOIN {pe} h ON h.name = t.subj
          JOIN {pr} r ON r.name = t.pred AND r.d = h.d
          JOIN {pe} tt ON tt.name = t.obj AND tt.d = h.d
          JOIN {pe} nn ON nn.name = t.neg AND nn.d = h.d),
ds{k} AS (SELECT pred, subj, obj, neg,
                 sum((hp * rp) * tp) AS sp, sum((hp * rp) * np) AS sn
          FROM dd{k} GROUP BY pred, subj, obj, neg),
dv{k} AS MATERIALIZED (SELECT d.* FROM dd{k} d
            JOIN ds{k} s ON d.pred = s.pred AND d.subj = s.subj
                        AND d.obj = s.obj AND d.neg = s.neg
            WHERE round({float(margin)!r} - s.sp + s.sn, 9) > 0),
dge{k} AS (SELECT name, d, sum(gv) AS g FROM (
              SELECT subj AS name, d, rp * (np - tp) AS gv FROM dv{k}
              UNION ALL SELECT obj, d, -(hp * rp) FROM dv{k}
              UNION ALL SELECT neg, d, hp * rp FROM dv{k}) u
            GROUP BY name, d),
dgr{k} AS (SELECT pred AS name, d, sum(hp * (np - tp)) AS g FROM dv{k}
            GROUP BY pred, d),
de{k} AS MATERIALIZED (SELECT e.name, e.d, round(e.val - {float(lr)!r}*coalesce(gg.g, 0.0) + 2e-11, 9) AS val
         FROM {pe} e LEFT JOIN dge{k} gg ON e.name = gg.name AND e.d = gg.d),
dr{k} AS MATERIALIZED (SELECT e.name, e.d, round(e.val - {float(lr)!r}*coalesce(gg.g, 0.0) + 2e-11, 9) AS val
         FROM {pr} e LEFT JOIN dgr{k} gg ON e.name = gg.name AND e.d = gg.d)"""
        pe, pr = f"de{k}", f"dr{k}"
    return f"""WITH {ctes}
SELECT 'ent' AS kind, name, CAST(d AS INT) AS d, round(val, 6) AS val FROM {pe}
UNION ALL
SELECT 'rel' AS kind, name, CAST(d AS INT) AS d, round(val, 6) AS val FROM {pr}"""


def complex_sql(
    dim: int = 4,
    iters: int = 2,
    lr: float = 0.05,
    margin: float = 1.0,
    neg_offset: int = 7,
) -> str:
    """CTE chain replicating operators.kge.complex_train term-for-term:
    the packed 2·dim layout is unrolled as two joins per role (re at j,
    im at j + dim), score sum((hre·rre − him·rim)·tre + (him·rre +
    hre·rim)·tim), hinge on round(margin − sp + sn, 9), gradients from the
    identical per-part expression trees the Spark transform() lambdas
    write."""
    D = int(dim)
    ea, eb, em = 37, 101, 97
    ra, rb, rm = 53, 67, 89
    ctes = f"""{_gold_graph_ctes()},
enames AS (SELECT DISTINCT subj AS name FROM g UNION SELECT obj FROM g),
ents AS MATERIALIZED (SELECT name, row_number() OVER (ORDER BY name) - 1 AS rank FROM enames),
nent AS (SELECT count(*) AS n FROM ents),
rnames AS (SELECT DISTINCT pred AS name FROM g),
rels AS MATERIALIZED (SELECT name, row_number() OVER (ORDER BY name) - 1 AS rank FROM rnames),
dims AS (SELECT unnest(range({2 * D})) AS d),
e0 AS MATERIALIZED (SELECT name, d, ((rank*{ea} + d*{eb}) % {em})/{float(em)!r} - 0.5 AS val
       FROM ents CROSS JOIN dims),
r0 AS MATERIALIZED (SELECT name, d, ((rank*{ra} + d*{rb}) % {rm})/{float(rm)!r} - 0.5 AS val
       FROM rels CROSS JOIN dims),
tq AS (SELECT DISTINCT pred, subj, obj FROM g),
tr AS MATERIALIZED (SELECT t.pred, t.subj, t.obj, e2.name AS neg
       FROM tq t JOIN ents et ON t.obj = et.name
       JOIN ents e2 ON e2.rank = (et.rank + {neg_offset}) % (SELECT n FROM nent))"""
    pe, pr = "e0", "r0"
    for k in range(1, iters + 1):
        ctes += f""",
cd{k} AS MATERIALIZED (SELECT t.pred, t.subj, t.obj, t.neg, jj.j,
                 hre.val AS hre, him.val AS him, rre.val AS rre, rim.val AS rim,
                 tre.val AS tre, tim.val AS tim, nre.val AS nre, nim.val AS nim
          FROM tr t CROSS JOIN (SELECT unnest(range({D})) AS j) jj
          JOIN {pe} hre ON hre.name = t.subj AND hre.d = jj.j
          JOIN {pe} him ON him.name = t.subj AND him.d = jj.j + {D}
          JOIN {pr} rre ON rre.name = t.pred AND rre.d = jj.j
          JOIN {pr} rim ON rim.name = t.pred AND rim.d = jj.j + {D}
          JOIN {pe} tre ON tre.name = t.obj AND tre.d = jj.j
          JOIN {pe} tim ON tim.name = t.obj AND tim.d = jj.j + {D}
          JOIN {pe} nre ON nre.name = t.neg AND nre.d = jj.j
          JOIN {pe} nim ON nim.name = t.neg AND nim.d = jj.j + {D}),
cs{k} AS (SELECT pred, subj, obj, neg,
                 sum((hre*rre - him*rim)*tre + (him*rre + hre*rim)*tim) AS sp,
                 sum((hre*rre - him*rim)*nre + (him*rre + hre*rim)*nim) AS sn
          FROM cd{k} GROUP BY pred, subj, obj, neg),
cv{k} AS MATERIALIZED (SELECT d.* FROM cd{k} d
            JOIN cs{k} s ON d.pred = s.pred AND d.subj = s.subj
                        AND d.obj = s.obj AND d.neg = s.neg
            WHERE round({float(margin)!r} - s.sp + s.sn, 9) > 0),
cge{k} AS (SELECT name, d, sum(gv) AS g FROM (
              SELECT subj AS name, j AS d, rre*(nre - tre) + rim*(nim - tim) AS gv FROM cv{k}
              UNION ALL SELECT subj, j + {D}, rre*(nim - tim) - rim*(nre - tre) FROM cv{k}
              UNION ALL SELECT obj, j, -(hre*rre - him*rim) FROM cv{k}
              UNION ALL SELECT obj, j + {D}, -(him*rre + hre*rim) FROM cv{k}
              UNION ALL SELECT neg, j, hre*rre - him*rim FROM cv{k}
              UNION ALL SELECT neg, j + {D}, him*rre + hre*rim FROM cv{k}) u
            GROUP BY name, d),
cgr{k} AS (SELECT name, d, sum(gv) AS g FROM (
              SELECT pred AS name, j AS d, hre*(nre - tre) + him*(nim - tim) AS gv FROM cv{k}
              UNION ALL SELECT pred, j + {D}, hre*(nim - tim) - him*(nre - tre) FROM cv{k}) u
            GROUP BY name, d),
ce{k} AS MATERIALIZED (SELECT e.name, e.d, round(e.val - {float(lr)!r}*coalesce(gg.g, 0.0) + 2e-11, 9) AS val
         FROM {pe} e LEFT JOIN cge{k} gg ON e.name = gg.name AND e.d = gg.d),
cr{k} AS MATERIALIZED (SELECT e.name, e.d, round(e.val - {float(lr)!r}*coalesce(gg.g, 0.0) + 2e-11, 9) AS val
         FROM {pr} e LEFT JOIN cgr{k} gg ON e.name = gg.name AND e.d = gg.d)"""
        pe, pr = f"ce{k}", f"cr{k}"
    return f"""WITH {ctes}
SELECT 'ent' AS kind, name, CAST(d AS INT) AS d, round(val, 6) AS val FROM {pe}
UNION ALL
SELECT 'rel' AS kind, name, CAST(d AS INT) AS d, round(val, 6) AS val FROM {pr}"""


def link_predict_sql(query_pred: str = "founded", **kw) -> str:
    """Brute-force TransE link prediction over the trained embeddings:
    min rounded score per (subj, pred) query, ties broken on candidate
    name — the same two-step min the Spark side runs."""
    ctes, pe, pr = _transe_ctes(**kw)
    return f"""WITH {ctes},
q AS (SELECT DISTINCT subj, pred FROM g WHERE pred = {sql_str(query_pred)}),
scored AS (SELECT q.subj, q.pred, c.name AS predicted,
                  round(sum((h.val + r.val - c.val)*(h.val + r.val - c.val)), 9) AS score
           FROM q
           JOIN {pe} h ON h.name = q.subj
           JOIN {pr} r ON r.name = q.pred AND r.d = h.d
           JOIN {pe} c ON c.d = h.d
           GROUP BY q.subj, q.pred, c.name),
best AS (SELECT subj, pred, min(score) AS score FROM scored
         GROUP BY subj, pred)
SELECT s.subj, s.pred, min(s.predicted) AS predicted, s.score
FROM scored s JOIN best b ON s.subj = b.subj AND s.pred = b.pred
                         AND s.score = b.score
GROUP BY s.subj, s.pred, s.score"""


def link_predict_ann_sql(
    query_pred: str = "founded",
    n_planes: int = 2,
    n_tables: int = 4,
    dim: int = 4,
    **kw,
) -> str:
    """Replicates operators.kge.link_predict_ann: sign-LSH bucket candidate
    generation (the SAME hyperplane literals similarity.hyperplane_weights
    emits) + exact TransE re-rank on colliding candidates + recall@1 hit
    column vs the brute-force argmin."""
    from .operators.similarity import hyperplane_weights

    ctes, pe, pr = _transe_ctes(**kw)

    def bucket_selects(src: str, keys: str) -> str:
        rows = []
        for t in range(n_tables):
            planes = hyperplane_weights(n_planes, dim, seed=f"ann-t{t}")
            terms = []
            for p, w in enumerate(planes):
                lit = "[" + ", ".join(repr(x) for x in w) + "]"
                terms.append(
                    f"(CASE WHEN list_dot_product(v, {lit}::DOUBLE[]) > 0"
                    f" THEN {2 ** p} ELSE 0 END)"
                )
            rows.append(
                f"SELECT {keys}, {t} AS tbl, {' + '.join(terms)} AS bucket FROM {src}"
            )
        return " UNION ALL ".join(rows)

    return f"""WITH {ctes},
q AS (SELECT DISTINCT subj, pred FROM g WHERE pred = {sql_str(query_pred)}),
qv AS MATERIALIZED (SELECT q.subj, q.pred, list(h.val + r.val ORDER BY h.d) AS v
      FROM q JOIN {pe} h ON h.name = q.subj
             JOIN {pr} r ON r.name = q.pred AND r.d = h.d
      GROUP BY q.subj, q.pred),
cv AS MATERIALIZED (SELECT name, list(val ORDER BY d) AS v FROM {pe} GROUP BY name),
qb AS ({bucket_selects("qv", "subj, pred")}),
cb AS ({bucket_selects("cv", "name")}),
cand AS (SELECT DISTINCT a.subj, a.pred, b.name
         FROM qb a JOIN cb b ON a.tbl = b.tbl AND a.bucket = b.bucket),
scored AS MATERIALIZED (
  SELECT c.subj, c.pred, c.name,
         round(sum((h.val + r.val - e.val)*(h.val + r.val - e.val)), 9) AS score
  FROM cand c
  JOIN {pe} h ON h.name = c.subj
  JOIN {pr} r ON r.name = c.pred AND r.d = h.d
  JOIN {pe} e ON e.name = c.name AND e.d = h.d
  GROUP BY c.subj, c.pred, c.name),
best AS (SELECT subj, pred, min(score) AS score FROM scored GROUP BY subj, pred),
ann AS (SELECT s.subj, s.pred, min(s.name) AS predicted, s.score
        FROM scored s JOIN best b ON s.subj = b.subj AND s.pred = b.pred
                                 AND s.score = b.score
        GROUP BY s.subj, s.pred, s.score),
bf_scored AS MATERIALIZED (
  SELECT q.subj, q.pred, c.name AS predicted,
         round(sum((h.val + r.val - c.val)*(h.val + r.val - c.val)), 9) AS score
  FROM q
  JOIN {pe} h ON h.name = q.subj
  JOIN {pr} r ON r.name = q.pred AND r.d = h.d
  JOIN {pe} c ON c.d = h.d
  GROUP BY q.subj, q.pred, c.name),
bf_best AS (SELECT subj, pred, min(score) AS score FROM bf_scored
            GROUP BY subj, pred),
bf AS (SELECT s.subj, s.pred, min(s.predicted) AS predicted_bf
       FROM bf_scored s JOIN bf_best b ON s.subj = b.subj AND s.pred = b.pred
                                      AND s.score = b.score
       GROUP BY s.subj, s.pred, s.score)
SELECT q.subj, q.pred, a.predicted, a.score,
       CAST(CASE WHEN a.predicted = bf.predicted_bf THEN 1 ELSE 0 END AS INT) AS hit
FROM q
LEFT JOIN ann a ON a.subj = q.subj AND a.pred = q.pred
LEFT JOIN bf ON bf.subj = q.subj AND bf.pred = q.pred"""


def export_ids_sql() -> str:
    """Replicates operators.graph.export_int_ids: dense ids by binary name
    rank over the gold triple graph."""
    return f"""WITH {_gold_graph_ctes()},
enames AS (SELECT DISTINCT subj AS name FROM g UNION SELECT obj FROM g),
ents AS (SELECT name, row_number() OVER (ORDER BY name) - 1 AS eid FROM enames),
rels AS (SELECT name, row_number() OVER (ORDER BY name) - 1 AS pid
         FROM (SELECT DISTINCT pred AS name FROM g) r)
SELECT es.eid AS src_id, rl.pid AS pred_id, eo.eid AS dst_id
FROM g JOIN ents es ON g.subj = es.name
       JOIN rels rl ON g.pred = rl.name
       JOIN ents eo ON g.obj = eo.name"""


def conjunctive_sql(patterns: list[tuple[str, str, str]]) -> str:
    """Replicates operators.graph.conjunctive_query over the gold graph."""
    sel: dict[str, str] = {}
    froms: list[str] = []
    conds: list[str] = []
    for i, (sv, pred, ov) in enumerate(patterns):
        alias = f"p{i}"
        froms.append(f"g {alias}")
        conds.append(f"{alias}.pred = {sql_str(pred)}")
        for var, col in ((sv, "subj"), (ov, "obj")):
            if var in sel:
                conds.append(f"{alias}.{col} = {sel[var]}")
            else:
                sel[var] = f"{alias}.{col}"
    cols = ", ".join(f"{expr} AS {var}" for var, expr in sel.items())
    return f"""WITH {_gold_graph_ctes()}
SELECT DISTINCT {cols}
FROM {", ".join(froms)}
WHERE {" AND ".join(conds)}"""


def schema_induction_sql(type_dicts: dict[str, list[str]]) -> str:
    """Replicates operators.graph.schema_induction: dictionary-membership
    CASE typing + signature counts over the gold graph."""
    def type_case(col: str) -> str:
        whens = "\n    ".join(
            f"WHEN {col} IN ({', '.join(sql_str(n) for n in names)}) THEN {sql_str(t)}"
            for t, names in type_dicts.items()
        )
        return f"CASE {whens} ELSE 'other' END"

    return f"""WITH {_gold_graph_ctes()}
SELECT pred, {type_case('subj')} AS subj_type, {type_case('obj')} AS obj_type,
       count(*) AS n_facts
FROM g GROUP BY pred, subj_type, obj_type"""


def shared_neighbor_sql(min_shared: int = 2) -> str:
    """Replicates operators.graph.shared_neighbor_similarity over the gold
    entity graph (all predicates collapsed to distinct (src, dst))."""
    return f"""WITH {_gold_graph_ctes()},
e AS (SELECT DISTINCT subj AS src, obj AS dst FROM g),
deg AS (SELECT src, count(*) AS deg FROM e GROUP BY src),
pairs AS (SELECT x.src AS a, y.src AS b, count(*) AS shared
          FROM e x JOIN e y ON x.dst = y.dst AND x.src < y.src
          GROUP BY x.src, y.src
          HAVING count(*) >= {min_shared})
SELECT p.a, p.b, p.shared,
       round(p.shared * 1.0 / (da.deg + db.deg - p.shared), 6) AS jaccard
FROM pairs p JOIN deg da ON p.a = da.src JOIN deg db ON p.b = db.src"""


def personalized_pagerank_sql(
    seeds: list[str], damping: float = 0.85, iters: int = 3
) -> str:
    """Replicates operators.graph.personalized_pagerank over the full gold
    entity graph from a literal seed set — unrolled like pagerank_sql, with
    the seed indicator folded into every update term."""
    d = float(damping)
    omd = 1.0 - d
    seed_list = ", ".join(sql_str(s) for s in seeds)
    prev = "r0"
    iter_ctes = ""
    for k in range(1, iters + 1):
        iter_ctes += f""",
r{k} AS (
  SELECT b.node, b.out_deg, b.is_seed,
         {omd!r} * b.is_seed / (SELECT greatest(ns, 1.0) FROM nsd)
         + {d!r} * (coalesce(c.m, 0.0)
                    + b.is_seed
                      * (SELECT coalesce(sum(rank), 0.0) FROM {prev} WHERE out_deg = 0)
                      / (SELECT greatest(ns, 1.0) FROM nsd)) AS rank
  FROM base b
  LEFT JOIN (SELECT e.dst, sum(r.rank / r.out_deg) AS m
             FROM {prev} r JOIN e ON r.node = e.src
             WHERE r.out_deg > 0 GROUP BY e.dst) c ON b.node = c.dst
)"""
        prev = f"r{k}"
    return f"""WITH {_gold_graph_ctes()},
e AS MATERIALIZED (SELECT DISTINCT subj AS src, obj AS dst FROM g),
nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
od AS (SELECT src, count(*) AS out_deg FROM e GROUP BY src),
base AS MATERIALIZED (
  SELECT node, coalesce(od.out_deg, 0) AS out_deg,
         CASE WHEN node IN ({seed_list}) THEN 1.0 ELSE 0.0 END AS is_seed
  FROM nodes LEFT JOIN od ON node = od.src),
nsd AS (SELECT sum(is_seed) AS ns FROM base),
r0 AS (SELECT node, out_deg, is_seed,
              is_seed / (SELECT greatest(ns, 1.0) FROM nsd) AS rank FROM base){iter_ctes}
SELECT node AS entity, round(rank, 6) AS ppr FROM {prev}"""


def label_propagation_sql(iters: int = 3) -> str:
    """Replicates operators.graph.label_propagation: unrolled synchronous
    rounds, argmax as max-count-then-min-label (engine-portable)."""
    prev = "l0"
    iter_ctes = ""
    for k in range(1, iters + 1):
        iter_ctes += f""",
cnt{k} AS MATERIALIZED (
  SELECT s.u AS node, p.label, count(*) AS cnt
  FROM sym s JOIN {prev} p ON s.v = p.node
  GROUP BY s.u, p.label),
mx{k} AS (SELECT node, max(cnt) AS cnt FROM cnt{k} GROUP BY node),
l{k} AS MATERIALIZED (
  SELECT c.node, min(c.label) AS label
  FROM cnt{k} c JOIN mx{k} m ON c.node = m.node AND c.cnt = m.cnt
  GROUP BY c.node)"""
        prev = f"l{k}"
    return f"""WITH {_gold_graph_ctes()},
e AS (SELECT DISTINCT subj AS src, obj AS dst FROM g),
sym AS MATERIALIZED (
  SELECT src AS u, dst AS v FROM e WHERE src <> dst
  UNION
  SELECT dst AS u, src AS v FROM e WHERE src <> dst),
l0 AS (SELECT DISTINCT u AS node, u AS label FROM sym){iter_ctes}
SELECT node AS entity, label AS community FROM {prev}"""


def resolve_recency_sql(pred: str = "born_in") -> str:
    """Replicates operators.output.resolve_by_recency for one functional
    predicate: recency key from the SAME doc_id arithmetic that generated
    warc_ts; two-step portable argmax (max key, then max obj)."""
    return f"""WITH {_DOCS_CTE}, {_FACTS_CTE},
t AS (SELECT DISTINCT doc_id, {_RELS}[rel_idx + 1] AS pred,
      {_subj_expr()} AS subj, {_obj_expr(False)} AS obj FROM facts),
tt AS (SELECT pred, subj, obj,
              (doc_id % 365) * 86400 + (doc_id * 7) % 86400 AS rk
       FROM t WHERE pred = {sql_str(pred)}),
latest AS (SELECT pred, subj, max(rk) AS rk FROM tt GROUP BY pred, subj)
SELECT t.subj, t.pred, max(t.obj) AS obj
FROM tt t JOIN latest l ON t.pred = l.pred AND t.subj = l.subj AND t.rk = l.rk
GROUP BY t.subj, t.pred"""


def fuse_sql() -> str:
    """Replicates operators.output.fuse_by_provenance: per distinct fact,
    supporting-page count, distinct-host count and the noisy-OR fused
    confidence from the per-(url, rel) detection scores of detect_sql —
    the IDENTICAL rounding ladder (rc→6 before ln, log-sum→9 before exp,
    conf→6), never an algebraic equivalent."""
    alt_cond = (
        f"lang = 'en' AND (doc_id*3 + i) % 4 = 0 AND {_in('rel_idx', _ALT_RELS)}"
    )
    return f"""WITH {_DOCS_CTE}, {_FACTS_CTE},
gated AS (
  SELECT doc_id, lang, rel_idx,
         max(CASE WHEN {alt_cond} THEN 0 ELSE 1 END) AS has_primary
  FROM facts GROUP BY doc_id, lang, rel_idx
),
trip AS (SELECT DISTINCT doc_id, rel_idx, {_RELS}[rel_idx + 1] AS pred,
                {_subj_expr()} AS subj, {_obj_expr(False)} AS obj
         FROM facts),
sight AS (
  SELECT t.subj, t.pred, t.obj, t.doc_id,
         least(round(1.0/(1.0 + exp(-(CASE WHEN g.has_primary = 1
                                           THEN 2.5 ELSE 1.5 END))), 6),
               0.999999) AS rc
  FROM trip t JOIN gated g ON t.doc_id = g.doc_id AND t.rel_idx = g.rel_idx
)
SELECT subj, pred, obj,
       count(*) AS n_urls,
       count(DISTINCT CASE WHEN doc_id % 5 = 0 THEN 0
                           ELSE doc_id % {S.N_HOSTS} END) AS n_hosts,
       round(1.0 - exp(round(sum(ln(1.0 - rc)), 9)), 6) AS conf
FROM sight GROUP BY subj, pred, obj"""


def rank_eval_sql(
    test_pred: str = "born_in",
    ks: tuple[int, ...] = (1, 3, 10),
    filtered: bool = False,
    **kw,
) -> str:
    """Replicates operators.kge.rank_eval over the trained TransE embeddings
    for one predicate's facts as the test set. ``filtered=False`` is the raw
    setting; ``filtered=True`` mirrors the engine's ``known=`` path (the
    Bordes-protocol filtered setting: known-true tails other than the
    queried one are excluded from the candidate ranking, known = all gold
    triples)."""
    ctes, pe, pr = _transe_ctes(**kw)
    hit_cols = ", ".join(
        f"round(avg(CASE WHEN rank <= {k} THEN 1.0 ELSE 0.0 END), 6) AS hits_{k}"
        for k in ks
    )
    filter_cte = """,
scored_f AS (
  SELECT s.* FROM scored s
  LEFT JOIN (SELECT DISTINCT subj, pred, obj FROM g) k
    ON k.subj = s.subj AND k.pred = s.pred AND k.obj = s.cand
  WHERE k.subj IS NULL OR s.cand = s.obj)"""
    rank_src = "scored_f" if filtered else "scored"
    return f"""WITH {ctes},
q AS (SELECT DISTINCT subj, pred, obj FROM g WHERE pred = {sql_str(test_pred)}),
scored AS MATERIALIZED (
  SELECT q.subj, q.pred, q.obj, c.name AS cand,
         round(sum((h.val + r.val - c.val)*(h.val + r.val - c.val)), 9) AS score
  FROM q
  JOIN {pe} h ON h.name = q.subj
  JOIN {pr} r ON r.name = q.pred AND r.d = h.d
  JOIN {pe} c ON c.d = h.d
  GROUP BY q.subj, q.pred, q.obj, c.name),
true_s AS (SELECT subj, pred, obj, score AS ts FROM scored WHERE cand = obj){filter_cte if filtered else ""},
ranks AS (
  SELECT s.subj, s.pred, s.obj,
         1 + sum(CASE WHEN s.score < t.ts
                        OR (s.score = t.ts AND s.cand < s.obj)
                 THEN 1 ELSE 0 END) AS rank
  FROM {rank_src} s JOIN true_s t
    ON s.subj = t.subj AND s.pred = t.pred AND s.obj = t.obj
  GROUP BY s.subj, s.pred, s.obj)
SELECT count(*) AS n_test, round(avg(1.0 / rank), 6) AS mrr, {hit_cols},
       (SELECT count(*) FROM q) - count(*) AS n_dropped
FROM ranks"""


def hash_walks_sql(steps: int = 3) -> str:
    """Replicates operators.graph.hash_random_walks: unrolled hash-argmin
    next-hop choice per step over the gold entity graph."""
    prev = "w0"
    ctes = ""
    selects = ["SELECT start, CAST(0 AS INT) AS step, node FROM w0"]
    for k in range(1, steps + 1):
        ctes += f""",
c{k} AS MATERIALIZED (
  SELECT w.start, e.dst AS nxt, md5(w.node || ':{k}:' || e.dst) AS h
  FROM {prev} w JOIN e ON w.node = e.src),
b{k} AS (SELECT start, min(h) AS h FROM c{k} GROUP BY start),
w{k} AS MATERIALIZED (
  SELECT c.start, c.nxt AS node
  FROM c{k} c JOIN b{k} b ON c.start = b.start AND c.h = b.h)"""
        selects.append(f"SELECT start, CAST({k} AS INT) AS step, node FROM w{k}")
        prev = f"w{k}"
    return f"""WITH {_gold_graph_ctes()},
e AS MATERIALIZED (SELECT DISTINCT subj AS src, obj AS dst FROM g),
w0 AS (SELECT DISTINCT src AS start, src AS node FROM e){ctes}
{" UNION ALL ".join(selects)}"""


def _quality_xs() -> list[str]:
    """The five quality-classifier feature expressions over a ``text``
    column — the single SQL counterpart of classifier.quality_features
    (every oracle that scores features builds from THIS list, so the
    formulas cannot drift between the train/score/composed oracles)."""
    from .operators.textstats import STOPWORDS

    stop_alt = "|".join(STOPWORDS)
    return [
        "1.0",
        "least(len(string_split(text, ' ')), 200) / 200.0",
        "len(regexp_extract_all(text, '[.,;:!?]')) * 1.0 / greatest(length(text), 1)",
        f"len(regexp_extract_all(text, '\\b({stop_alt})\\b')) * 1.0"
        " / greatest(len(string_split(text, ' ')), 1)",
        "least(length(text) * 1.0 / greatest(len(string_split(text, ' ')), 1),"
        " 10.0) / 10.0",
    ]


def _pack_sql(source: str, budget: int, n_shards: int,
              seed: str = "|shard") -> str:
    """The concat-and-chunk packing tail (shard hash, per-shard cumsum,
    sequence spans) over a CTE named ``source`` — shared by the standalone
    pack_sequences oracle and the composed-pipeline oracle so the span
    arithmetic exists exactly once."""
    h = _H60.format(seed=seed)
    return f"""t AS (
  SELECT doc_id,
         CAST(({h} % {n_shards}) AS INT) AS shard,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
  FROM {source}
),
c AS (
  SELECT *, sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
            ROWS UNBOUNDED PRECEDING) AS cum
  FROM t
)
SELECT doc_id, shard, n_tokens,
       CAST(cum - n_tokens AS BIGINT) AS tok_start,
       CAST(floor((cum - n_tokens) * 1.0 / {budget}) AS BIGINT) AS seq_first,
       CAST(floor((cum - 1) * 1.0 / {budget}) AS BIGINT) AS seq_last
FROM c"""


def _gd_unroll(lr: float, iters: int, n_features: int = 5) -> tuple[str, str, str]:
    """Unrolled full-batch logistic-GD CTE chain over a CTE ``f`` carrying
    x0..x{n-1} and y — the SQL counterpart of classifier.logreg_train,
    shared by quality_classifier_sql and the detector trainer. Returns
    (iter_ctes, final_weights_cte, snapshots_select). Every per-iteration
    CTE is MATERIALIZED: w{k}s references its predecessor twice (once via
    g{k}), so plain CTE inlining would re-expand the chain 2^iters times.
    The only cross-engine drift source is float-sum ordering in the avg —
    absorbed by round(…, 6) on the emitted snapshots."""
    lrr = repr(float(lr))
    js = range(n_features)
    dot = " + ".join(f"w.w{j} * f.x{j}" for j in js)
    grads = ",\n         ".join(
        f"avg((1.0 / (1.0 + exp(-({dot}))) - f.y) * f.x{j}) AS g{j}"
        for j in js
    )
    steps = ", ".join(f"w.w{j} - {lrr} * g.g{j} AS w{j}" for j in js)
    zeros = ", ".join(f"0.0 AS w{j}" for j in js)
    iter_ctes = f",\nw0s AS (SELECT {zeros})"
    prev = "w0s"
    for k in range(1, iters + 1):
        iter_ctes += f""",
g{k} AS MATERIALIZED (SELECT {grads}
         FROM f, {prev} w),
w{k}s AS MATERIALIZED (SELECT {steps} FROM {prev} w, g{k} g)"""
        prev = f"w{k}s"
    snap = " UNION ALL ".join(
        f"SELECT {k} AS iter, "
        + ", ".join(f"round(w{j}, 6) AS w{j}" for j in js)
        + f" FROM w{k}s"
        for k in range(iters + 1)
    )
    return iter_ctes, prev, snap


def quality_classifier_sql(lr: float = 2.0, iters: int = 3) -> str:
    """Replicates operators.classifier.logreg_train over quality_features
    with y = (lang = 'en'): full-batch logistic GD from w = 0, one CTE pair
    (gradient, weights) per unrolled iteration. Each feature formula and the
    sigmoid/error/average expressions mirror the Spark column tree
    term-for-term; lr is embedded via repr() of the same python float."""
    iter_ctes, _, snap = _gd_unroll(lr, iters)
    feat_cols = ",\n         ".join(
        f"{x} AS x{j}" for j, x in enumerate(_quality_xs())
    )
    return f"""WITH f AS MATERIALIZED (
  SELECT CASE WHEN lang = 'en' THEN 1.0 ELSE 0.0 END AS y,
         {feat_cols}
  FROM documents
){iter_ctes}
SELECT CAST(iter AS BIGINT) AS iter, w0, w1, w2, w3, w4 FROM ({snap})"""


def _detector_f_ctes() -> str:
    """CTE chain ending in ``f(url, rel, x0..x4, y)`` — the closed-form
    feature/label table of the trainable detection gate (one row per
    (page, candidate relation/event of the page's language)), mirroring
    detect.detector_features + with_detector_labels: x1 = primary-anchor
    presence, x2 = alt-anchor presence (both derivable from the fact math,
    the detect_sql gating logic), x3 = zh flag, x4 = event flag, y = gold
    carries the relation/event on that page."""
    alt_cond = (
        f"f2.lang = 'en' AND (f2.doc_id*3 + f2.i) % 4 = 0 AND {_in('f2.rel_idx', _ALT_RELS)}"
    )
    ev_selects = []
    for etype, gate, _, lang in _event_rows():
        ev_selects.append(
            f"""SELECT url, {sql_str(etype)} AS rel, 1.0 AS x0,
         CASE WHEN {gate} THEN 1.0 ELSE 0.0 END AS x1, 0.0 AS x2,
         CASE WHEN lang = 'zh' THEN 1.0 ELSE 0.0 END AS x3, 1.0 AS x4,
         CASE WHEN {gate} THEN 1.0 ELSE 0.0 END AS y
  FROM docsu WHERE lang = {sql_str(lang)}"""
        )
    ev_union = "\n  UNION ALL\n  ".join(ev_selects)
    return f"""{_DOCS_CTE}, {_FACTS_CTE},
docsu AS (SELECT doc_id, lang, {URL_EXPR} AS url FROM docs),
relagg AS (
  SELECT f2.doc_id, f2.rel_idx,
         max(CASE WHEN {alt_cond} THEN 0 ELSE 1 END) AS anyprim,
         max(CASE WHEN {alt_cond} THEN 1 ELSE 0 END) AS anyalt
  FROM facts f2 GROUP BY f2.doc_id, f2.rel_idx),
f AS MATERIALIZED (
  SELECT d.url, {_RELS}[ri.ridx + 1] AS rel, 1.0 AS x0,
         CASE WHEN r.anyprim = 1 THEN 1.0 ELSE 0.0 END AS x1,
         CASE WHEN r.anyalt = 1 THEN 1.0 ELSE 0.0 END AS x2,
         CASE WHEN d.lang = 'zh' THEN 1.0 ELSE 0.0 END AS x3,
         0.0 AS x4,
         CASE WHEN r.doc_id IS NOT NULL THEN 1.0 ELSE 0.0 END AS y
  FROM docsu d
  CROSS JOIN (SELECT CAST(unnest(range({len(S.RELATIONS)})) AS INT) AS ridx) ri
  LEFT JOIN relagg r ON r.doc_id = d.doc_id AND r.rel_idx = ri.ridx
  UNION ALL
  {ev_union}
)"""


def detector_train_sql(lr: float, iters: int) -> str:
    """Replicates detect.train_detector: the GD-trajectory snapshot table
    of the trainable detection gate over the closed-form feature CTE."""
    iter_ctes, _, snap = _gd_unroll(lr, iters)
    return f"""WITH {_detector_f_ctes()}{iter_ctes}
SELECT CAST(iter AS BIGINT) AS iter, w0, w1, w2, w3, w4 FROM ({snap})"""


def detector_score_sql(lr: float, iters: int, threshold: float = 0.5) -> str:
    """Replicates detect.detect_relations_with_weights over the weights
    train_detector converges to: score = round(sigmoid(w·x), 6) per
    candidate pair with the ROUNDED final snapshot (both engines deploy the
    6-decimal artifact, so the keep decision compares identical doubles)."""
    iter_ctes, final, _ = _gd_unroll(lr, iters)
    rounded = ", ".join(f"round(w{j}, 6) AS w{j}" for j in range(5))
    dot = " + ".join(f"w.w{j} * f.x{j}" for j in range(5))
    return f"""WITH {_detector_f_ctes()}{iter_ctes},
wfin AS (SELECT {rounded} FROM {final})
SELECT f.url, f.rel,
       round(1.0 / (1.0 + exp(-({dot}))), 6) AS score,
       CAST(CASE WHEN round(1.0 / (1.0 + exp(-({dot}))), 6) >= {threshold!r}
            THEN 1 ELSE 0 END AS INT) AS keep
FROM f, wfin w"""


def classifier_score_sql(weights: list[float], threshold: float = 0.5) -> str:
    """Replicates operators.classifier.classify with a fixed weight literal
    (the trained model artifact): score = sigmoid(w·x), keep = round(score,
    6) >= t — the threshold compares the ROUNDED score on both sides (repo
    invariant), so a last-ulp exp() difference between engines cannot flip
    keep unless the rounded values themselves differ."""
    dot = " + ".join(f"{w!r} * ({x})" for w, x in zip(weights, _quality_xs()))
    return f"""WITH s AS (
  SELECT doc_id, round(1.0 / (1.0 + exp(-({dot}))), 6) AS score FROM documents
)
SELECT doc_id, score,
       CAST(CASE WHEN score >= {threshold!r} THEN 1 ELSE 0 END AS INT) AS keep
FROM s"""


def lm_perplexity_sql(k: float = 0.5, ref_lang: str = "en") -> str:
    """Replicates operators.lm: add-k bigram LM trained on the ref_lang
    subset, perplexity for every document with ≥1 bigram. Bigrams are built
    with the same list_transform(range(1, len(ws))) pattern as
    repetition_sql (1-based, end-exclusive — pairs (ws[i], ws[i+1])); the
    smoothing constant is an exact binary fraction embedded via repr() so
    the literal is bit-identical; round(…, 6) absorbs float-sum ordering."""
    kr = repr(float(k))
    return f"""WITH w AS (
  SELECT doc_id, lang, string_split(text, ' ') AS ws FROM documents
),
rp AS (
  SELECT unnest(list_transform(range(1, len(ws)), i -> ws[i])) AS w1,
         unnest(list_transform(range(1, len(ws)), i -> ws[i+1])) AS w2
  FROM w WHERE lang = '{ref_lang}'
),
big AS (SELECT w1, w2, count(*) AS c12 FROM rp GROUP BY w1, w2),
uni AS (SELECT w1, count(*) AS c1 FROM rp GROUP BY w1),
voc AS (SELECT CAST(count(DISTINCT tok) AS DOUBLE) AS v
        FROM (SELECT unnest(ws) AS tok FROM w WHERE lang = '{ref_lang}')),
dp AS (
  SELECT doc_id,
         unnest(list_transform(range(1, len(ws)), i -> ws[i])) AS w1,
         unnest(list_transform(range(1, len(ws)), i -> ws[i+1])) AS w2
  FROM w
),
sc AS (
  SELECT dp.doc_id,
         log2((coalesce(big.c12, 0) + {kr})
              / (coalesce(uni.c1, 0) + {kr} * (SELECT v FROM voc))) AS logp
  FROM dp LEFT JOIN big ON dp.w1 = big.w1 AND dp.w2 = big.w2
          LEFT JOIN uni ON dp.w1 = uni.w1
)
SELECT doc_id, count(*) AS n_bigrams,
       round(avg(logp), 6) AS avg_logp,
       round(pow(2.0, -avg(logp)), 6) AS ppl
FROM sc GROUP BY doc_id"""


_H60 = "('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '{seed}'), 1, 15))::BIGINT"


def mixture_sample_sql(rates: dict[str, float], default_rate: float = 0.0,
                       seed: str = "|mix") -> str:
    """Replicates operators.compose.mixture_sample: keep iff the portable
    60-bit hash < rate·2^60, thresholds as integer literals computed once
    at plan build — zero float involvement on either side at runtime."""
    from .operators.compose import exact_threshold

    cases = " ".join(
        f"WHEN '{s}' THEN {exact_threshold(r)}" for s, r in rates.items()
    )
    h = _H60.format(seed=seed)
    return f"""SELECT doc_id, lang FROM documents
WHERE {h} < (CASE lang {cases} ELSE {exact_threshold(default_rate)} END)"""


def pack_sequences_sql(budget: int = 512, n_shards: int = 8,
                       seed: str = "|shard") -> str:
    """Replicates operators.compose.pack_sequences: hash shard, per-shard
    id-ordered token cumsum, sequence span by integer-exact floor division
    (all values ≪ 2^53, so the double path is exact on both engines).
    The packing tail is the shared _pack_sql fragment."""
    return "WITH " + _pack_sql("documents", budget, n_shards, seed)


def training_pipeline_sql(
    weights: list[float],
    rates: dict[str, float],
    threshold: float = 0.4377,
    budget: int = 256,
    n_shards: int = 4,
) -> str:
    """Replicates the composed training-data pipeline query: exact dedup
    (min-doc_id winner per md5(text)) → quality-classifier filter at a
    fixed weight literal → mixture downsampling → concat-and-chunk packing.
    Each stage mirrors its operator's oracle expression exactly; the
    pipeline is their composition over a shrinking document set."""
    from .operators.compose import exact_threshold

    dot = " + ".join(f"{w!r} * ({x})" for w, x in zip(weights, _quality_xs()))
    cases = " ".join(
        f"WHEN '{s}' THEN {exact_threshold(r)}" for s, r in rates.items()
    )
    h = _H60.format(seed="|mix")
    return f"""WITH winners AS (
  SELECT min(doc_id) AS doc_id FROM documents GROUP BY md5(text)
),
surv AS (SELECT d.* FROM documents d JOIN winners USING (doc_id)),
kept AS (
  SELECT doc_id, text, lang FROM surv
  WHERE round(1.0 / (1.0 + exp(-({dot}))), 6) >= {threshold!r}
),
mixed AS (
  SELECT doc_id, text FROM kept
  WHERE {h} < (CASE lang {cases} ELSE 0 END)
),
{_pack_sql("mixed", budget, n_shards)}"""


def cap_per_group_sql(group_col: str = "source", n: int = 100,
                      order_col: str = "doc_id") -> str:
    """Replicates operators.compose.cap_per_group over documents."""
    return f"""SELECT doc_id, {group_col} FROM (
  SELECT doc_id, {group_col},
         row_number() OVER (PARTITION BY {group_col} ORDER BY {order_col}) AS rn
  FROM documents
) WHERE rn <= {n}"""


def hash_split_sql(fractions: dict[str, float], seed: str = "|split") -> str:
    """Replicates operators.compose.hash_split over documents: consecutive
    integer hash ranges, first matching range wins, last split absorbs the
    remainder."""
    from .operators.compose import exact_threshold

    h = _H60.format(seed=seed)
    names = list(fractions)
    acc, whens = 0.0, []
    for name in names[:-1]:
        acc += fractions[name]
        whens.append(f"WHEN {h} < {exact_threshold(min(acc, 1.0))} THEN '{name}'")
    case = "CASE " + " ".join(whens) + f" ELSE '{names[-1]}' END"
    return f"SELECT doc_id, lang, {case} AS split FROM documents"


def latest_event_sql() -> str:
    """Replicates dedup.latest_by_key over events (keys user_id +
    event_type, latest ts, event_id tiebreak): the window form — same
    winner as the Spark struct-max aggregation, since (ts, event_id) is a
    total order."""
    return """SELECT user_id, event_type,
       epoch_us(ts) AS ts_us, event_id, value
FROM (
  SELECT user_id, event_type, ts, event_id, value,
         row_number() OVER (PARTITION BY user_id, event_type
                            ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
) WHERE rn = 1"""


def ntriples_sql(base: str = "http://kg.example/") -> str:
    """Replicates operators.output.to_ntriples over the gold extraction
    triples: percent-encoded IRIs for subj/pred, ECHAR-escaped literal for
    obj, identical fixed-order replace chains (DuckDB needs the 'g' flag;
    Spark's regexp_replace is global by default)."""

    def iri(col: str) -> str:
        c = f"regexp_replace({col}, '%', '%25', 'g')"
        for ch, enc in ((" ", "%20"), ('"', "%22"), ("<", "%3C"),
                        (">", "%3E"), ("\\\\", "%5C")):
            c = f"regexp_replace({c}, '{ch}', '{enc}', 'g')"
        return c

    def lit_esc(col: str) -> str:
        c = f"regexp_replace({col}, '\\\\', '\\\\\\\\', 'g')"
        c = f"regexp_replace({c}, '\"', '\\\\\"', 'g')"
        c = f"regexp_replace({c}, chr(10), '\\\\n', 'g')"
        c = f"regexp_replace({c}, chr(13), '\\\\r', 'g')"
        c = f"regexp_replace({c}, chr(9), '\\\\t', 'g')"
        return c

    return f"""WITH {_gold_graph_ctes()}
SELECT subj, pred, obj,
       '<{base}' || {iri("subj")} || '> <{base}' || {iri("pred")}
       || '> "' || {lit_esc("obj")} || '" .' AS ntriple
FROM g"""


def incremental_minhash_sql(
    threshold: float = 0.8, num_perm: int = 16, bands: int = 8,
    new_mod: int = 5, new_rem: int = 0,
) -> str:
    """Replicates dedup.incremental_minhash_dedup with documents where
    ``doc_id % new_mod == new_rem`` as the NEW batch and the rest as the
    stored index: asymmetric banded candidates (batch probes index ∪
    smaller-id batch rows; the index never self-joins), exact Jaccard ≥
    threshold, best partner by (jaccard DESC, id)."""
    cond = (
        f"a.id % {new_mod} = {new_rem} AND "
        f"(b.id % {new_mod} <> {new_rem} OR b.id < a.id)"
    )
    return f"""WITH {_minhash_pairs_ctes(num_perm, bands, cand_cond=cond)},
best AS (
  SELECT id_a, id_b, jaccard,
         row_number() OVER (PARTITION BY id_a
                            ORDER BY jaccard DESC, id_b) AS rn
  FROM jac WHERE jaccard >= {threshold})
SELECT d.doc_id, b.id_b IS NULL AS keep, b.id_b AS dup_of,
       round(b.jaccard, 6) AS jaccard
FROM documents d
LEFT JOIN (SELECT * FROM best WHERE rn = 1) b ON b.id_a = d.doc_id
WHERE d.doc_id % {new_mod} = {new_rem}"""


def _kmeans_ctes(
    k: int = 8,
    iters: int = 2,
    inject: bool = False,
    prefix: str = "",
    v_sql: str | None = None,
) -> tuple[str, str]:
    """Unrolled Lloyd's k-means over the embeddings table — mirrors
    similarity.kmeans_train term-for-term (init = first k vectors by id;
    assignment argmin over round(dist + QUANT_EPS, 9) with cluster-id
    tie-break; per-dim mean re-quantized the same way; empty clusters keep
    the previous centroid). Returns (ctes, final_centroid_cte_name); the
    chain also defines ``{prefix}v(id, v)``, ``{prefix}vd(id, d, val)``
    and ``{prefix}asg{iters}(id, cluster)``. ``prefix`` namespaces every
    CTE so several chains compose in one statement (the PQ per-subspace
    unroll); ``v_sql`` overrides the input SELECT (must yield (id, v))."""
    from .operators.kge import QUANT_EPS

    eps = repr(QUANT_EPS)
    p = prefix
    dist = (
        "round(list_aggregate(list_transform(range(1, len(v.v) + 1),"
        f" j -> (v.v[j] - c.cv[j]) * (v.v[j] - c.cv[j])), 'sum') + {eps}, 9)"
    )
    if v_sql is not None:
        v_cte = f"""{p}v AS MATERIALIZED (
  {v_sql}),"""
    elif inject:
        # near-dup injection (the pii_scrub/url_dedup precedent — both
        # engines synthesize the identical input): vec_id % 7 == 3 becomes
        # a copy of vec_id−3's embedding with +0.05 on coordinate 1
        v_cte = f"""{p}v AS MATERIALIZED (
  SELECT r.vec_id AS id,
         CASE WHEN r.vec_id % 7 = 3 AND d.e IS NOT NULL
              THEN list_transform(range(1, len(d.e) + 1),
                     j -> CASE WHEN j = 1 THEN d.e[j] + 0.05 ELSE d.e[j] END)
              ELSE r.e END AS v
  FROM (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings) r
  LEFT JOIN (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings) d
    ON d.vec_id = r.vec_id - 3),"""
    else:
        v_cte = f"""{p}v AS MATERIALIZED (
  SELECT vec_id AS id, embedding::DOUBLE[] AS v FROM embeddings),"""
    ctes = f"""{v_cte}
{p}vd AS MATERIALIZED (
  SELECT id, unnest(range(1, len(v) + 1)) AS d, unnest(v) AS val FROM {p}v),
{p}c0 AS (SELECT CAST(id AS INT) AS cluster, v AS cv FROM {p}v WHERE id < {k})"""
    prev = f"{p}c0"
    for i in range(1, iters + 1):
        ctes += f""",
{p}asg{i} AS MATERIALIZED (
  SELECT id, cluster FROM (
    SELECT v.id, c.cluster,
           row_number() OVER (PARTITION BY v.id
                              ORDER BY {dist}, c.cluster) AS rn
    FROM {p}v v CROSS JOIN {prev} c)
  WHERE rn = 1),
{p}upd{i} AS (
  SELECT a.cluster, vd.d, round(avg(vd.val) + {eps}, 9) AS val
  FROM {p}asg{i} a JOIN {p}vd vd USING (id) GROUP BY a.cluster, vd.d),
{p}c{i} AS MATERIALIZED (
  SELECT p.cluster, coalesce(u.cv, p.cv) AS cv
  FROM {prev} p LEFT JOIN (
    SELECT cluster, list(val ORDER BY d) AS cv FROM {p}upd{i} GROUP BY cluster
  ) u USING (cluster))"""
        prev = f"{p}c{i}"
    return ctes, prev


def kmeans_sql(k: int = 8, iters: int = 2) -> str:
    """Final k-means centroids, exploded to (cluster, d, val) rows for an
    order-insensitive exact compare."""
    ctes, final = _kmeans_ctes(k, iters)
    return f"""WITH {ctes}
SELECT CAST(cluster AS BIGINT) AS cluster,
       CAST(unnest(range(1, len(cv) + 1)) AS BIGINT) AS d,
       unnest(cv) AS val
FROM {final}"""


def pq_sql(m: int = 4, k: int = 4, iters: int = 2, dim: int = 64) -> str:
    """Expected similarity.pq_codes output: per (vector, subspace), the
    trained-codebook assignment and squared reconstruction error — m
    independent k-means unrolls (prefixed _kmeans_ctes chains over sliced
    vectors) plus a final assignment against each final codebook."""
    from .operators.kge import QUANT_EPS

    eps = repr(QUANT_EPS)
    sub = dim // m
    all_ctes, selects = [], []
    dist = (
        "round(list_aggregate(list_transform(range(1, len(v.v) + 1),"
        f" j -> (v.v[j] - c.cv[j]) * (v.v[j] - c.cv[j])), 'sum') + {eps}, 9)"
    )
    for s in range(m):
        lo, hi = s * sub + 1, (s + 1) * sub
        v_sql = (
            f"SELECT vec_id AS id, (embedding::DOUBLE[])[{lo}:{hi}] AS v "
            "FROM embeddings"
        )
        ctes, final = _kmeans_ctes(k, iters, prefix=f"s{s}_", v_sql=v_sql)
        all_ctes.append(ctes)
        selects.append(f"""SELECT CAST(id AS BIGINT) AS vec_id,
       CAST({s} AS BIGINT) AS subspace,
       CAST(cluster AS BIGINT) AS code, dist AS sq_err
FROM (
  SELECT v.id, c.cluster, {dist} AS dist,
         row_number() OVER (PARTITION BY v.id
                            ORDER BY {dist}, c.cluster) AS rn
  FROM s{s}_v v CROSS JOIN {final} c)
WHERE rn = 1""")
    return "WITH " + ",\n".join(all_ctes) + "\n" + "\nUNION ALL\n".join(selects)


def semdedup_sql(k: int = 8, iters: int = 2, threshold: float = 0.95,
                 inject: bool = True) -> str:
    """Replicates similarity.semdedup over the embeddings table (near-dup
    injection on by default — the natural synthetic embeddings have no
    high-cosine pairs, max intra-cluster cosine 0.51): final k-means
    assignment, intra-cluster cosine vs every smaller id, suppress at
    cosine ≥ threshold, best partner by (cosine DESC, id)."""
    ctes, final = _kmeans_ctes(k, iters, inject=inject)
    cos = (
        "list_dot_product(va.v, vb.v) / "
        "(sqrt(list_dot_product(va.v, va.v)) * sqrt(list_dot_product(vb.v, vb.v)))"
    )
    return f"""WITH {ctes},
-- re-assign against the FINAL centroids (the engine scores membership once
-- more at deploy, same argmin rule)
fin AS MATERIALIZED (
  SELECT id, cluster FROM (
    SELECT v.id, c.cluster,
           row_number() OVER (PARTITION BY v.id
                              ORDER BY round(list_aggregate(list_transform(
                                  range(1, len(v.v) + 1),
                                  j -> (v.v[j] - c.cv[j]) * (v.v[j] - c.cv[j])),
                                  'sum') + 2e-11, 9), c.cluster) AS rn
    FROM v CROSS JOIN {final} c)
  WHERE rn = 1),
pairs AS (
  SELECT a.id AS id_a, b.id AS id_b, {cos} AS cosine
  FROM fin a JOIN fin b ON a.cluster = b.cluster AND b.id < a.id
  JOIN v va ON va.id = a.id JOIN v vb ON vb.id = b.id),
best AS (
  SELECT id_a, id_b, cosine,
         row_number() OVER (PARTITION BY id_a
                            ORDER BY cosine DESC, id_b) AS rn
  FROM pairs WHERE cosine >= {threshold})
SELECT f.id AS vec_id, CAST(f.cluster AS BIGINT) AS cluster,
       b.id_b IS NULL AS keep, b.id_b AS dup_of, round(b.cosine, 6) AS cosine
FROM fin f LEFT JOIN (SELECT * FROM best WHERE rn = 1) b ON b.id_a = f.id"""


def k_core_sql(k: int = 2, max_iter: int = 8) -> str:
    """Replicates operators.graph.k_core over the gold entity graph:
    unrolled peeling rounds (post-fixpoint rounds are no-ops, so a fixed
    unroll agrees with the engine's converge-or-raise loop)."""
    ctes = f"""e0 AS MATERIALIZED (
  SELECT src, dst FROM (
    SELECT subj AS src, obj AS dst FROM g WHERE subj <> obj
    UNION SELECT obj, subj FROM g WHERE subj <> obj))"""
    prev = "e0"
    for i in range(1, max_iter + 1):
        ctes += f""",
keep{i} AS (SELECT src FROM {prev} GROUP BY src HAVING count(*) >= {k}),
e{i} AS MATERIALIZED (
  SELECT e.src, e.dst FROM {prev} e
  JOIN keep{i} ka ON ka.src = e.src
  JOIN keep{i} kb ON kb.src = e.dst)"""
        prev = f"e{i}"
    return f"""WITH {_gold_graph_ctes()},
{ctes}
SELECT src AS node, CAST(count(*) AS BIGINT) AS degree
FROM {prev} GROUP BY src HAVING count(*) >= {k}"""


def harmonic_centrality_sql(max_depth: int = 4) -> str:
    """Replicates operators.graph.harmonic_centrality over the full gold
    entity graph: recursive closure with min-depth per pair, then
    Σ 1/depth grouped by target."""
    return f"""WITH RECURSIVE {_gold_graph_ctes()},
e AS (SELECT DISTINCT subj AS src, obj AS dst FROM g),
paths(src, dst, depth) AS (
  SELECT src, dst, 1 FROM e
  UNION
  SELECT p.src, q.dst, p.depth + 1
  FROM paths p JOIN e q ON p.dst = q.src
  WHERE p.depth < {max_depth}
),
md AS (SELECT src, dst, min(depth) AS depth FROM paths GROUP BY src, dst)
SELECT dst AS node, round(sum(1.0 / depth), 6) AS centrality,
       count(*) AS n_reaching
FROM md GROUP BY dst"""


def _bpe_ctes(n_merges: int, table: str = "documents") -> tuple[str, str]:
    """CTE chain replicating operators.bpe._bpe_loop: word vocab ->
    symbolize -> n_merges unrolled rounds of (pair count, argmax, 3-pass
    string rewrite). Integer/string-exact — no rounding anywhere."""
    ctes = f"""w AS (SELECT word, count(*) AS freq
     FROM (SELECT unnest(string_split(text, ' ')) AS word FROM {table})
     WHERE word <> '' GROUP BY word),
v0 AS MATERIALIZED (
  SELECT word,
         concat(trim(regexp_replace(word, '(.)', '\\1 ', 'g')), ' </w>') AS r,
         freq
  FROM w)"""
    prev = "v0"
    for i in range(1, n_merges + 1):
        pat = "' ' || b.pair || ' '"
        rep = "' ' || replace(b.pair, ' ', '') || ' '"
        rewritten = f"' ' || v.r || ' '"
        for _ in range(3):  # operators.bpe._REWRITE_PASSES
            rewritten = f"replace({rewritten}, {pat}, {rep})"
        ctes += f""",
p{i} AS (SELECT pair, CAST(sum(freq) AS BIGINT) AS cnt FROM (
    SELECT freq,
           unnest(list_transform(range(1, len(string_split(r, ' '))),
             i -> string_split(r, ' ')[i] || ' ' || string_split(r, ' ')[i+1]
           )) AS pair
    FROM {prev}) GROUP BY pair),
b{i} AS MATERIALIZED (SELECT pair, cnt FROM p{i} ORDER BY cnt DESC, pair LIMIT 1),
v{i} AS MATERIALIZED (
  SELECT v.word, trim({rewritten}) AS r, v.freq FROM {prev} v, b{i} b)"""
        prev = f"v{i}"
    return ctes, prev


def bpe_train_sql(n_merges: int = 8) -> str:
    """Replicates operators.bpe.bpe_train: the learned merge table."""
    ctes, _ = _bpe_ctes(n_merges)
    unions = "\nUNION ALL\n".join(
        f"SELECT CAST({i} AS INT) AS step, pair,"
        f" replace(pair, ' ', '') AS merged, cnt FROM b{i}"
        for i in range(1, n_merges + 1)
    )
    return f"WITH {ctes}\n{unions}"


def bpe_vocab_sql(n_merges: int = 8) -> str:
    """Replicates operators.bpe.bpe_subword_vocab: the deployed subword
    inventory after applying the learned merges."""
    ctes, final = _bpe_ctes(n_merges)
    return f"""WITH {ctes}
SELECT token, CAST(sum(freq) AS BIGINT) AS freq, count(*) AS n_words
FROM (SELECT freq, unnest(string_split(r, ' ')) AS token FROM {final})
GROUP BY token"""


def _scc_ctes(pred: str = "acquired", max_depth: int = 8) -> str:
    """WITH-body fragment (requires WITH RECURSIVE) replicating
    operators.graph.strongly_connected over the gold ``pred`` edges:
    hop-bounded mutual reachability, min-node SCC labels. Defines
    ``e(src, dst)``, ``scc(node, scc_id)`` and ``sizes``."""
    return f"""{_gold_graph_ctes()},
e AS (SELECT DISTINCT subj AS src, obj AS dst FROM g WHERE pred = {sql_str(pred)}),
paths(src, dst, depth) AS (
  SELECT src, dst, 1 FROM e
  UNION
  SELECT p.src, q.dst, p.depth + 1
  FROM paths p JOIN e q ON p.dst = q.src
  WHERE p.depth < {max_depth}
),
cl AS (SELECT DISTINCT src, dst FROM paths),
mutual AS (SELECT a.src AS node, a.dst AS peer
           FROM cl a JOIN cl b ON a.src = b.dst AND a.dst = b.src),
nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
pairs AS (SELECT node, peer FROM mutual
          UNION ALL SELECT node, node FROM nodes),
scc AS (SELECT node, min(peer) AS scc_id FROM pairs GROUP BY node),
sizes AS (SELECT scc_id, count(*) AS scc_size FROM scc GROUP BY scc_id)"""


def scc_sql(pred: str = "acquired", max_depth: int = 8) -> str:
    """Replicates operators.graph.strongly_connected over the gold
    ``pred`` edges: hop-bounded mutual reachability, min-node SCC labels."""
    return f"""WITH RECURSIVE {_scc_ctes(pred, max_depth)}
SELECT s.node, s.scc_id, sz.scc_size
FROM scc s JOIN sizes sz USING (scc_id)"""


def toposort_sql(
    pred: str = "acquired", max_depth: int = 8, max_levels: int = 32
) -> str:
    """Replicates operators.graph.condensation_levels: SCC condensation
    (cross-SCC distinct edges) + longest-path levels from the roots,
    enumerated by a depth-bounded recursive walk (the condensation is a
    DAG, so max(d) per node is the longest-path level)."""
    return f"""WITH RECURSIVE {_scc_ctes(pred, max_depth)},
ce AS (SELECT DISTINCT s1.scc_id AS src, s2.scc_id AS dst
       FROM e JOIN scc s1 ON e.src = s1.node
              JOIN scc s2 ON e.dst = s2.node
       WHERE s1.scc_id <> s2.scc_id),
cn AS (SELECT DISTINCT scc_id AS c FROM scc),
roots AS (SELECT c FROM cn
          WHERE c NOT IN (SELECT dst FROM ce)),
walk(c, d) AS (
  SELECT c, 0 FROM roots
  UNION
  SELECT ce.dst, w.d + 1 FROM walk w JOIN ce ON w.c = ce.src
  WHERE w.d < {max_levels}
),
levels AS (SELECT c, max(d) AS level FROM walk GROUP BY c)
SELECT s.node, s.scc_id, CAST(l.level AS INT) AS level
FROM scc s JOIN levels l ON s.scc_id = l.c"""


def _link_edges_ctes() -> str:
    """WITH-body fragment shared by the link-graph family: byte-identical
    injected html per doc, href extraction, per-link host resolution —
    ends with CTE ``le(src_host, dst_host, url)``."""
    host = lambda t: (  # noqa: E731 - schema.host_id rule in SQL
        f"CAST(CASE WHEN ({t}) % 5 = 0 THEN 0 ELSE ({t}) % 97 END AS VARCHAR)"
    )
    return f"""pages AS (
  SELECT 'https://site' || {host('doc_id')} || '.example.com/page/'
           || CAST(doc_id AS VARCHAR) AS url,
         '<html><body>'
           || array_to_string(list_transform(range(0, CAST(doc_id % 3 AS INT) + 1),
                j -> '<a href="https://site' || {host('(doc_id*31 + j*17) % 9973')}
                     || '.example.com/page/'
                     || CAST((doc_id*31 + j*17) % 9973 AS VARCHAR) || '">v'
                     || CAST(((doc_id*31 + j*17) % 9973 + doc_id) % 3 AS VARCHAR)
                     || '</a>'),
              '')
           || CASE WHEN doc_id % 4 = 0
                   THEN '<a href="/about">about</a>' ELSE '' END
           || '</body></html>' AS html
  FROM documents),
links AS (
  SELECT url, u.z[1] AS href, u.z[2] AS anchor
  FROM pages,
       unnest(list_zip(
         regexp_extract_all(html, 'href="([^"]+)"', 1),
         regexp_extract_all(html, '<a href="[^"]*">([^<]*)</a>', 1)
       )) AS u(z)),
le AS (
  SELECT regexp_extract(url, '^https?://([^/]+)', 1) AS src_host,
         CASE WHEN regexp_matches(href, '^https?://')
              THEN regexp_extract(href, '^https?://([^/]+)', 1)
              ELSE regexp_extract(url, '^https?://([^/]+)', 1) END AS dst_host,
         CASE WHEN regexp_matches(href, '^https?://')
              THEN href
              ELSE 'https://' || regexp_extract(url, '^https?://([^/]+)', 1)
                   || href END AS target_url,
         anchor,
         url
  FROM links)"""


def anchor_names_sql() -> str:
    """Replicates __spark_entry__.q_anchor_names: per target url, the most
    frequent anchor text (ties broken by lexicographic min anchor) plus
    evidence counts — the external-alias table for entity naming."""
    return f"""WITH {_link_edges_ctes()},
cnt AS (SELECT target_url AS url, anchor, count(*) AS n
        FROM le GROUP BY target_url, anchor),
mx AS (SELECT url, max(n) AS n_top, CAST(sum(n) AS BIGINT) AS n_links,
              count(*) AS n_variants
       FROM cnt GROUP BY url)
SELECT m.url, min(c.anchor) AS top_anchor, m.n_top, m.n_links, m.n_variants
FROM mx m JOIN cnt c ON c.url = m.url AND c.n = m.n_top
GROUP BY m.url, m.n_top, m.n_links, m.n_variants"""


def link_graph_sql() -> str:
    """Replicates __spark_entry__.q_link_graph +
    operators.text_extract.host_link_graph: byte-identical injected html,
    regexp href extraction, host-pair aggregation."""
    return f"""WITH {_link_edges_ctes()}
SELECT src_host, dst_host, src_host = dst_host AS is_intra,
       count(*) AS n_links, count(DISTINCT url) AS n_pages
FROM le GROUP BY src_host, dst_host"""


def host_authority_sql(damping: float = 0.85, iters: int = 3) -> str:
    """Replicates __spark_entry__.q_host_authority: damped PageRank over
    the DISTINCT cross-host link-graph edges (intra-host links excluded,
    the standard host-authority convention)."""
    setup = f"""{_link_edges_ctes()},
e AS (SELECT DISTINCT src_host AS src, dst_host AS dst FROM le
      WHERE src_host <> dst_host)"""
    return _pagerank_unrolled(setup, damping, iters, "host")


def host_authority_weighted_sql(damping: float = 0.85, iters: int = 3) -> str:
    """Replicates __spark_entry__.q_host_authority_weighted: PageRank with
    link-count transition weights over the cross-host edges."""
    setup = f"""{_link_edges_ctes()},
e AS (SELECT src_host AS src, dst_host AS dst, count(*) AS w FROM le
      WHERE src_host <> dst_host GROUP BY src_host, dst_host)"""
    return _pagerank_parts(setup, damping, iters, "host", weighted=True)[0]


def crawl_frontier_sql(damping: float = 0.85, iters: int = 3) -> str:
    """Replicates __spark_entry__.q_crawl_frontier: link targets absent
    from the corpus urls, per-target referrer counts, host-authority join
    (composes _link_edges_ctes with the _pagerank_parts WITH body — the
    stage interfaces verify jointly, the training_pipeline precedent)."""
    setup = f"""{_link_edges_ctes()},
e AS (SELECT DISTINCT src_host AS src, dst_host AS dst FROM le
      WHERE src_host <> dst_host)"""
    _, body, prev = _pagerank_parts(setup, damping, iters)
    return f"""WITH {body},
auth AS (SELECT b.node AS host, round(r.rank, 6) AS pagerank
         FROM base b JOIN {prev} r ON b.node = r.node),
corp AS (SELECT 'https://site'
                || CAST(CASE WHEN doc_id % 5 = 0 THEN 0
                        ELSE doc_id % 97 END AS VARCHAR)
                || '.example.com/page/' || CAST(doc_id AS VARCHAR) AS url
         FROM documents),
fr AS (SELECT l.target_url AS url, l.dst_host AS host,
              count(*) AS n_links, count(DISTINCT l.url) AS n_referrers
       FROM le l
       WHERE NOT EXISTS (SELECT 1 FROM corp c WHERE c.url = l.target_url)
       GROUP BY l.target_url, l.dst_host)
SELECT f.url, f.host, f.n_links, f.n_referrers,
       coalesce(a.pagerank, 0.0) AS authority
FROM fr f LEFT JOIN auth a ON f.host = a.host"""


def crawl_schedule_sql(damping: float = 0.85, iters: int = 3) -> str:
    """Replicates __spark_entry__.q_crawl_schedule: per-host fetch waves
    (row_number over a deterministic total order) on top of the frontier."""
    frontier = crawl_frontier_sql(damping, iters)
    return f"""WITH fr AS ({frontier})
SELECT url, host,
       CAST(row_number() OVER (PARTITION BY host
                               ORDER BY n_referrers DESC, url) AS BIGINT)
         AS wave,
       n_referrers, authority
FROM fr"""


def temperature_mixture_sql(
    tau: float = 0.5, seed: str = "|tmix", table: str = "documents",
    stratum: str = "lang",
) -> str:
    """Replicates operators.compose.temperature_mixture: corpus-derived
    q ∝ p^tau keep rates (subsample-only normalization), quantized to 9
    decimals + RATE_EPS, portable-hash threshold keep decision."""
    from .operators.compose import HASH_SPACE, RATE_EPS

    h = _H60.format(seed=seed)
    return f"""WITH cnt AS (
  SELECT {stratum} AS s, count(*) AS n FROM {table} GROUP BY {stratum}),
tot AS (SELECT CAST(sum(n) AS DOUBLE) AS N FROM cnt),
shares AS (SELECT s, n / (SELECT N FROM tot) AS p FROM cnt),
w AS (SELECT s, p, power(p, {float(tau)!r}) AS w FROM shares),
z AS (SELECT sum(w) AS Z FROM w),
ratio AS (SELECT s, w / (SELECT Z FROM z) / p AS ratio FROM w),
mx AS (SELECT max(ratio) AS mr FROM ratio),
rates AS (SELECT s, round(ratio / (SELECT mr FROM mx), 9) + {RATE_EPS!r} AS rate
          FROM ratio)
SELECT d.doc_id, d.{stratum}, round(r.rate, 6) AS rate
FROM {table} d JOIN rates r ON d.{stratum} = r.s
WHERE CAST({h} AS DOUBLE) < r.rate * {float(HASH_SPACE)!r}"""


def chunk_tokens_sql(
    window: int = 32, stride: int = 24, table: str = "documents"
) -> str:
    """Replicates operators.compose.chunk_tokens: overlapping token-window
    chunking via list slicing (DuckDB 1-based inclusive slices clamp
    exactly like Spark's slice(start, length))."""
    return f"""WITH t AS (
  SELECT doc_id, string_split(text, ' ') AS toks FROM {table})
SELECT doc_id,
       CAST(k AS INT) AS chunk_id,
       CAST(least({window}, len(toks) - k * {stride}) AS INT) AS n_chunk_tokens,
       array_to_string(toks[k * {stride} + 1 : k * {stride} + {window}], ' ')
         AS chunk
FROM t, unnest(range(0, (len(toks) - 1) // {stride} + 1)) AS u(k)"""


def mirror_hosts_sql(max_hosts_per_digest: int = 20) -> str:
    """Replicates __spark_entry__.q_mirror_hosts +
    operators.dedup.host_mirror_pairs: planted cross-host mirrors
    (doc_id % 10 == 3 serves doc_id-3's text), digest-overlap host pairs,
    stop-digest exclusion, digest-set Jaccard."""
    return f"""WITH d0 AS (SELECT doc_id, text FROM documents),
mir AS (SELECT a.doc_id, b.text FROM d0 a
        JOIN d0 b ON b.doc_id = a.doc_id - 3
        WHERE a.doc_id % 10 = 3),
alld AS (SELECT doc_id, text FROM d0 WHERE doc_id % 10 <> 3
         UNION ALL SELECT doc_id, text FROM mir),
hd AS (SELECT DISTINCT
         'site' || CAST(CASE WHEN doc_id % 5 = 0 THEN 0
                        ELSE doc_id % 97 END AS VARCHAR) AS host,
         md5(text) AS dg
       FROM alld),
hot AS (SELECT dg FROM hd GROUP BY dg
        HAVING count(*) > {max_hosts_per_digest}),
hd2 AS (SELECT * FROM hd WHERE dg NOT IN (SELECT dg FROM hot)),
sz AS (SELECT host, count(*) AS n FROM hd2 GROUP BY host),
sh AS (SELECT a.host AS host_a, b.host AS host_b, count(*) AS shared
       FROM hd2 a JOIN hd2 b ON a.dg = b.dg AND a.host < b.host
       GROUP BY a.host, b.host)
SELECT host_a, host_b, shared, s1.n AS n_a, s2.n AS n_b,
       round(shared * 1.0 / (s1.n + s2.n - shared), 6) AS jaccard
FROM sh JOIN sz s1 ON host_a = s1.host JOIN sz s2 ON host_b = s2.host"""


def bpe_fertility_sql(
    n_merges: int = 8, table: str = "documents", stratum: str = "lang"
) -> str:
    """Replicates operators.bpe.bpe_fertility: merges trained corpus-wide,
    fertility (avg segments per word) evaluated per stratum."""
    ctes, final = _bpe_ctes(n_merges, table)
    return f"""WITH {ctes},
mapping AS (SELECT word, CAST(len(string_split(r, ' ')) AS BIGINT) AS n_sub
            FROM {final}),
pw AS (SELECT {stratum} AS stratum, word, count(*) AS n FROM (
         SELECT {stratum}, unnest(string_split(text, ' ')) AS word
         FROM {table}) WHERE word <> '' GROUP BY {stratum}, word)
SELECT stratum,
       CAST(sum(n) AS BIGINT) AS n_words,
       CAST(sum(n * m.n_sub) AS BIGINT) AS n_subwords,
       round(CAST(sum(n * m.n_sub) AS DOUBLE) / CAST(sum(n) AS DOUBLE), 6)
         AS fertility
FROM pw JOIN mapping m USING (word)
GROUP BY stratum"""


def entity_pmi_sql() -> str:
    """Replicates operators.graph.entity_pmi over the per-document gold
    facts: page-level entity co-occurrence PMI."""
    return f"""WITH {_DOCS_CTE}, {_FACTS_CTE},
gd AS (SELECT DISTINCT doc_id, {_subj_expr()} AS subj, {_obj_expr(False)} AS obj
       FROM facts),
ue AS (SELECT DISTINCT doc_id, e FROM (
         SELECT doc_id, subj AS e FROM gd
         UNION ALL SELECT doc_id, obj FROM gd)),
nn AS (SELECT CAST(count(DISTINCT doc_id) AS DOUBLE) AS n_docs FROM ue),
cx AS (SELECT e, count(*) AS c FROM ue GROUP BY e),
pr AS (SELECT a.e AS e1, b.e AS e2, count(*) AS c_pair
       FROM ue a JOIN ue b ON a.doc_id = b.doc_id AND a.e < b.e
       GROUP BY a.e, b.e)
SELECT e1, e2, c_pair,
       round(ln((SELECT n_docs FROM nn) * c_pair / (c1.c * c2.c)), 6) AS pmi
FROM pr JOIN cx c1 ON e1 = c1.e JOIN cx c2 ON e2 = c2.e"""


def canonical_paths_sql(pred: str = "acquired", max_depth: int = 8) -> str:
    """Replicates operators.graph.canonical_paths over the gold ``pred``
    edges: per-round unrolled greedy-min BFS (new pairs via NOT EXISTS
    against the accumulated known set, min(path) per pair per round —
    post-fixpoint rounds are no-ops, the k_core unrolling rule)."""
    ctes = f"""{_gold_graph_ctes()},
e AS (SELECT DISTINCT subj AS src, obj AS dst FROM g WHERE pred = {sql_str(pred)}),
p1 AS (SELECT src, dst, src || '->' || dst AS path FROM e),
k1 AS (SELECT src, dst FROM p1)"""
    prev_p, prev_k = "p1", "k1"
    for d in range(2, max_depth + 1):
        ctes += f""",
p{d} AS MATERIALIZED (
  SELECT src, dst, min(path) AS path FROM (
    SELECT p.src, q.dst, p.path || '->' || q.dst AS path
    FROM {prev_p} p JOIN e q ON p.dst = q.src) n
  WHERE NOT EXISTS (SELECT 1 FROM {prev_k} k
                    WHERE k.src = n.src AND k.dst = n.dst)
  GROUP BY src, dst),
k{d} AS (SELECT src, dst FROM {prev_k}
         UNION ALL SELECT src, dst FROM p{d})"""
        prev_p, prev_k = f"p{d}", f"k{d}"
    unions = "\nUNION ALL\n".join(
        f"SELECT src, dst, CAST({d} AS INT) AS depth, path FROM p{d}"
        for d in range(1, max_depth + 1)
    )
    return f"WITH {ctes}\n{unions}"


def detector_calibration_sql(lr: float, iters: int, n_bins: int = 10) -> str:
    """Replicates detect.detector_calibration: score with the rounded
    final GD snapshot, bin by floor(score·n_bins), empirical positive rate
    and mean score per bin."""
    iter_ctes, final, _ = _gd_unroll(lr, iters)
    rounded = ", ".join(f"round(w{j}, 6) AS w{j}" for j in range(5))
    dot = " + ".join(f"w.w{j} * f.x{j}" for j in range(5))
    return f"""WITH {_detector_f_ctes()}{iter_ctes},
wfin AS (SELECT {rounded} FROM {final}),
scored AS (SELECT f.y, round(1.0 / (1.0 + exp(-({dot}))), 6) AS score
           FROM f, wfin w)
SELECT CAST(least(floor(score * {n_bins}), {n_bins - 1}) AS INT) AS bin,
       count(*) AS n, CAST(sum(y) AS BIGINT) AS n_pos,
       round(sum(y) / count(*), 6) AS pos_rate,
       round(avg(score), 6) AS mean_score
FROM scored GROUP BY 1"""


def adamic_adar_sql(min_shared: int = 2) -> str:
    """Replicates operators.graph.adamic_adar over the full gold entity
    graph: rarity-weighted shared-neighbor pairs."""
    return f"""WITH {_gold_graph_ctes()},
e AS (SELECT DISTINCT subj AS src, obj AS dst FROM g),
idg AS (SELECT dst, count(*) AS din FROM e GROUP BY dst)
SELECT a.src AS a, b.src AS b, count(*) AS shared,
       round(sum(1.0 / ln(i.din)), 6) AS aa
FROM e a JOIN e b ON a.dst = b.dst AND a.src < b.src
JOIN idg i ON i.dst = a.dst
GROUP BY a.src, b.src
HAVING count(*) >= {min_shared}"""


def mixture_plan_sql(
    tau: float = 0.5, max_epochs: float = 4.0,
    table: str = "documents", stratum: str = "lang",
) -> str:
    """Replicates operators.compose.mixture_plan: per-stratum q ∝ p^tau
    recipe table (keep rate for over-represented strata, fractional epochs
    for under-represented ones, clip flag)."""
    return f"""WITH cnt AS (
  SELECT {stratum} AS s, count(*) AS n FROM {table} GROUP BY {stratum}),
tot AS (SELECT CAST(sum(n) AS DOUBLE) AS n_tot FROM cnt),
shares AS (SELECT s, n, n / (SELECT n_tot FROM tot) AS p FROM cnt),
w AS (SELECT s, n, p, power(p, {float(tau)!r}) AS w FROM shares),
z AS (SELECT sum(w) AS w_tot FROM w),
r AS (SELECT s, n, p,
             w / (SELECT w_tot FROM z) AS q,
             w / (SELECT w_tot FROM z) / p AS ratio
      FROM w)
SELECT s AS {stratum}, n, round(p, 6) AS p, round(q, 6) AS q,
       round(least(ratio, 1.0), 6) AS keep_rate,
       round(least(ratio, {float(max_epochs)!r}), 6) AS epochs,
       ratio > {float(max_epochs)!r} AS clipped
FROM r"""


def degree_dist_sql() -> str:
    """Replicates __spark_entry__.q_kg_degree_dist over the gold entity
    graph: total (in+out) degree histogram."""
    return f"""WITH {_gold_graph_ctes()},
e AS (SELECT DISTINCT subj AS src, obj AS dst FROM g),
deg AS (SELECT node, count(*) AS degree FROM (
          SELECT src AS node FROM e UNION ALL SELECT dst FROM e)
        GROUP BY node)
SELECT degree, count(*) AS n_nodes FROM deg GROUP BY degree"""


def ccnet_buckets_sql(k: float = 0.5, ref_lang: str = "en") -> str:
    """Replicates __spark_entry__.q_ccnet_buckets: per-language perplexity
    terciles (head/middle/tail) over the reference-LM scores — ntile(3)
    over the deterministic (ppl, doc_id) order, both rounded first."""
    inner = lm_perplexity_sql(k=k, ref_lang=ref_lang)
    return f"""WITH sc AS ({inner}),
j AS (SELECT s.doc_id, d.lang, s.ppl
      FROM sc s JOIN documents d USING (doc_id))
SELECT doc_id, lang, ppl,
       CASE ntile(3) OVER (PARTITION BY lang ORDER BY ppl, doc_id)
            WHEN 1 THEN 'head' WHEN 2 THEN 'middle' ELSE 'tail' END AS bucket
FROM j"""


def entity_cards_sql(
    damping: float = 0.85, pr_iters: int = 3, lp_iters: int = 3,
    hc_depth: int = 4,
) -> str:
    """Replicates __spark_entry__.q_kg_entity_cards: PageRank + community +
    harmonic centrality joined per entity (each operator's full oracle
    nested as a CTE — the composed-pipeline verification precedent)."""
    return f"""WITH pr AS ({pagerank_sql(damping, pr_iters)}),
cm AS ({label_propagation_sql(lp_iters)}),
hc AS ({harmonic_centrality_sql(hc_depth)})
SELECT pr.entity, pr.out_deg, pr.in_deg, pr.pagerank,
       coalesce(cm.community, pr.entity) AS community,
       coalesce(hc.centrality, 0.0) AS centrality,
       CAST(coalesce(hc.n_reaching, 0) AS BIGINT) AS n_reaching
FROM pr LEFT JOIN cm ON pr.entity = cm.entity
        LEFT JOIN hc ON pr.entity = hc.node"""


def shortest_paths_sql(seeds: list[str], max_iter: int = 8, wmod: int = 5) -> str:
    """Replicates operators.graph.weighted_shortest_paths over the full
    gold entity graph with the deterministic integer edge weights
    w = 1 + hash60(src||'→'||dst||'#w') % wmod: WITH RECURSIVE enumerates
    every (node, cost, hops ≤ max_iter) walk cost — min(cost) per node IS
    the frontier-improvement Bellman-Ford fixpoint, because after
    max_iter rounds the Spark side holds the exact minimum over walks of
    ≤ max_iter edges (invariant documented on the operator)."""
    seed_rows = ", ".join(f"({sql_str(s)})" for s in seeds)
    return f"""WITH RECURSIVE {_gold_graph_ctes()},
e AS (SELECT DISTINCT subj AS src, obj AS dst,
      1 + (CAST(('0x' || substr(md5(subj || '→' || obj || '#w'), 1, 15))
           AS BIGINT) % {wmod}) AS w
      FROM g),
paths(node, cost, hops) AS (
  SELECT node, CAST(0 AS BIGINT), 0 FROM (VALUES {seed_rows}) s(node)
  UNION
  SELECT q.dst, p.cost + q.w, p.hops + 1
  FROM paths p JOIN e q ON p.node = q.src
  WHERE p.hops < {max_iter}
)
SELECT node, CAST(min(cost) AS BIGINT) AS cost FROM paths GROUP BY node"""


def modularity_sql(iters: int = 3) -> str:
    """Replicates operators.graph.community_modularity: the
    label_propagation oracle's unrolled labels, the undirected
    least/greatest edge set, and the per-community integer counts feeding
    dq = internal/m − (degree_sum/2m)² (pure integer-ratio IEEE arithmetic
    — bitwise engine-independent — with the defensive round(·, 9))."""
    return f"""WITH lp AS ({label_propagation_sql(iters)}),
{_gold_graph_ctes()},
e AS (SELECT DISTINCT subj AS src, obj AS dst FROM g),
und AS MATERIALIZED (
  SELECT DISTINCT least(src, dst) AS u, greatest(src, dst) AS v
  FROM e WHERE src <> dst),
m AS (SELECT count(*) AS m FROM und),
deg AS (SELECT entity, count(*) AS deg FROM (
          SELECT u AS entity FROM und UNION ALL SELECT v FROM und)
        GROUP BY entity),
internal AS (
  SELECT la.community AS community, count(*) AS internal_edges
  FROM und
  JOIN lp la ON la.entity = und.u
  JOIN lp lb ON lb.entity = und.v
  WHERE la.community = lb.community
  GROUP BY la.community),
per_c AS (
  SELECT lp.community, count(*) AS n_nodes, sum(deg.deg) AS degree_sum
  FROM deg JOIN lp ON deg.entity = lp.entity
  GROUP BY lp.community)
SELECT p.community,
       CAST(p.n_nodes AS BIGINT) AS n_nodes,
       CAST(coalesce(i.internal_edges, 0) AS BIGINT) AS internal_edges,
       CAST(p.degree_sum AS BIGINT) AS degree_sum,
       round(coalesce(i.internal_edges, 0) / CAST(m.m AS DOUBLE)
             - (p.degree_sum / (2.0 * m.m)) * (p.degree_sum / (2.0 * m.m)),
             9) AS dq
FROM per_c p LEFT JOIN internal i ON p.community = i.community
CROSS JOIN m"""


def event_bursts_sql(z_min: float = 2.0) -> str:
    """Replicates __spark_entry__.q_event_bursts: hourly event-type counts,
    per-type population moments from EXACT integer sums (Σc, Σc², n as
    BIGINTs — so mean/variance are IEEE-exact in both engines; sqrt is
    correctly rounded per IEEE-754), z-score flagged at z ≥ z_min."""
    return f"""WITH hourly AS (
  SELECT event_type,
         strftime(date_trunc('hour', ts), '%Y-%m-%d %H:00:00') AS hour,
         CAST(count(*) AS BIGINT) AS cnt
  FROM events GROUP BY 1, 2),
stats AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(cnt) AS BIGINT) AS s, CAST(sum(cnt * cnt) AS BIGINT) AS ss
  FROM hourly GROUP BY event_type),
z AS (
  SELECT h.event_type, h.hour, h.cnt,
         round((h.cnt - st.s / CAST(st.n AS DOUBLE))
               / sqrt(st.ss / CAST(st.n AS DOUBLE)
                      - (st.s / CAST(st.n AS DOUBLE))
                      * (st.s / CAST(st.n AS DOUBLE))), 6) AS z
  FROM hourly h JOIN stats st ON h.event_type = st.event_type
  WHERE st.ss * st.n > st.s * st.s)
SELECT event_type, hour, cnt, z FROM z WHERE z >= {z_min}"""


def tfidf_sql(top_k: int = 5) -> str:
    """Replicates textstats.tfidf_keywords: whitespace tokens, exact
    integer tf/df/N, score = round(tf·ln(N/df), 6), per-doc top-k ranked
    by (rounded score DESC, term ASC) — a total, engine-portable order."""
    return f"""WITH tok AS (
  SELECT doc_id, unnest(str_split(text, ' ')) AS term FROM documents),
tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
       FROM tok GROUP BY doc_id, term),
df AS (SELECT term, CAST(count(DISTINCT doc_id) AS BIGINT) AS df
       FROM tok GROUP BY term),
n AS (SELECT CAST(count(DISTINCT doc_id) AS BIGINT) AS n FROM tok),
s AS (SELECT tf.doc_id, tf.term, tf.tf, df.df,
             round(tf.tf * ln(CAST(n.n AS DOUBLE) / df.df), 6) AS score
      FROM tf JOIN df ON tf.term = df.term CROSS JOIN n),
r AS (SELECT *, CAST(row_number() OVER (
        PARTITION BY doc_id ORDER BY score DESC, term ASC) AS BIGINT) AS rank
      FROM s)
SELECT doc_id, term, tf, df, score, rank FROM r WHERE rank <= {top_k}"""


def collocations_sql(min_count: int = 5) -> str:
    """Replicates textstats.collocations: adjacent whitespace-token bigrams,
    pmi = round(ln(c_xy·U²/(T·c_x·c_y)), 6) from exact integer counts
    (one ln over one integer ratio — the engine-portable PMI form)."""
    return f"""WITH arrs AS (SELECT str_split(text, ' ') AS a FROM documents),
big AS (
  SELECT a[i] AS x, a[i + 1] AS y
  FROM arrs, unnest(range(1, greatest(len(a) - 1, 0) + 1)) AS u(i)),
bc AS (SELECT x, y, CAST(count(*) AS BIGINT) AS c_xy
       FROM big GROUP BY x, y HAVING count(*) >= {min_count}),
uni AS (SELECT unnest(a) AS t FROM arrs),
uc AS (SELECT t, CAST(count(*) AS BIGINT) AS c FROM uni GROUP BY t),
tot AS (SELECT CAST(sum(greatest(len(a) - 1, 0)) AS BIGINT) AS t_big,
               CAST(sum(len(a)) AS BIGINT) AS u_tok FROM arrs)
SELECT bc.x, bc.y, bc.c_xy, cx.c AS c_x, cy.c AS c_y,
       round(ln(CAST(bc.c_xy * tot.u_tok * tot.u_tok AS DOUBLE)
                / (tot.t_big * cx.c * cy.c)), 6) AS pmi
FROM bc JOIN uc cx ON bc.x = cx.t
        JOIN uc cy ON bc.y = cy.t
CROSS JOIN tot"""


def reach_profile_sql(pred: str = "acquired", max_depth: int = 8) -> str:
    """Replicates __spark_entry__.q_kg_reach_profile: depth histogram +
    cumulative pair counts + cumulative fraction over the transitive-closure
    oracle (exact integer sums; the division is IEEE-exact)."""
    return f"""WITH c AS ({transitive_closure_sql(pred, max_depth)}),
d AS (SELECT depth, CAST(count(*) AS BIGINT) AS n_pairs FROM c GROUP BY depth)
SELECT depth, n_pairs,
       CAST(sum(n_pairs) OVER (ORDER BY depth) AS BIGINT) AS cum_pairs,
       round(sum(n_pairs) OVER (ORDER BY depth)
             / CAST(sum(n_pairs) OVER () AS DOUBLE), 9) AS frac
FROM d"""


def entity_types_sql(signatures: list[tuple[str, str, str]]) -> str:
    """Replicates operators.graph.entity_type_inference over the distinct
    gold facts: per-slot CASE type votes, portable two-step argmax
    (max votes, then min type)."""
    s_case = " ".join(
        f"WHEN {sql_str(p)} THEN {sql_str(st)}" for p, st, _ in signatures
    )
    o_case = " ".join(
        f"WHEN {sql_str(p)} THEN {sql_str(ot)}" for p, _, ot in signatures
    )
    return f"""WITH {_gold_graph_ctes()},
v AS (
  SELECT subj AS entity, CASE pred {s_case} ELSE NULL END AS etype FROM g
  UNION ALL
  SELECT obj AS entity, CASE pred {o_case} ELSE NULL END AS etype FROM g),
c AS (SELECT entity, etype, CAST(count(*) AS BIGINT) AS votes
      FROM v WHERE etype IS NOT NULL GROUP BY entity, etype),
mx AS (SELECT entity, max(votes) AS votes FROM c GROUP BY entity)
SELECT c.entity, min(c.etype) AS etype, c.votes
FROM c JOIN mx ON c.entity = mx.entity AND c.votes = mx.votes
GROUP BY c.entity, c.votes"""


def cdc_sql(k: int = 8, mask: int = 64) -> str:
    """Replicates textstats.cdc_chunks: content-defined boundaries at
    positions whose k-gram hash ≡ 0 (mod mask), chunks between consecutive
    boundaries, 0-based chunk_idx matching Spark's posexplode."""
    return f"""WITH h AS (
  SELECT doc_id, text AS t,
         list_transform(range(1, greatest(length(text) - {k - 1}, 1) + 1),
             i -> CAST(('0x' || substr(md5(substr(text, i, {k}) || '#cdc'),
                        1, 15)) AS BIGINT)) AS hs
  FROM documents),
b AS (
  SELECT doc_id, t,
         list_filter(range(1, len(hs) + 1), i -> hs[i] % {mask} = 0) AS bp
  FROM h),
se AS (
  SELECT doc_id, t,
         list_prepend(1, bp) AS starts,
         list_append(bp, length(t) + 1) AS ends
  FROM b),
c AS (
  SELECT doc_id, CAST(i - 1 AS BIGINT) AS chunk_idx,
         CAST(starts[i] AS BIGINT) AS start,
         CAST(ends[i] - starts[i] AS BIGINT) AS length,
         substr(t, starts[i], ends[i] - starts[i]) AS chunk
  FROM se, unnest(range(1, len(starts) + 1)) AS u(i))
SELECT doc_id, chunk_idx, start, length,
       CAST(('0x' || substr(md5(chunk || '#chunk'), 1, 15)) AS BIGINT)
           AS chunk_hash
FROM c WHERE length > 0"""


def _hll_ctes(key_expr: str, seed: str, prefix: str) -> str:
    """Register-build + estimate CTE chain for one HyperLogLog sketch over
    ``key_expr`` grouped by event_type. Mirrors sketch.hll_registers /
    hll_estimate bit for bit: same md5 hash, integer shift for the
    bucket/rank split (NOT float division — h has 60 bits), exact-integer
    bit-length rank, exact-long harmonic sum 2^(56-reg), one IEEE division
    of the shared float constant, linear-counting branch below 2.5m."""
    from .operators import sketch as SK

    m = SK.HLL_M
    max_rho = SK.HLL_MAX_RHO
    shift = SK.HLL_RANK_BITS + 2
    return f"""{prefix}h AS (
  SELECT event_type,
         {_portable_hash(f"CAST({key_expr} AS VARCHAR) || '{seed}'")} AS h
  FROM events),
{prefix}r AS (
  SELECT event_type, h % {m} AS bucket,
         CASE WHEN (h >> {SK.HLL_P}) = 0 THEN {max_rho}
              ELSE {max_rho} - length(bin(h >> {SK.HLL_P})) END AS rho
  FROM {prefix}h),
{prefix}regs AS (
  SELECT event_type, bucket, max(rho) AS reg
  FROM {prefix}r GROUP BY event_type, bucket),
{prefix}allb AS (
  SELECT event_type, unnest(range({m})) AS bucket
  FROM (SELECT DISTINCT event_type FROM events)),
{prefix}full AS (
  SELECT a.event_type, coalesce(g.reg, 0) AS reg
  FROM {prefix}allb a
  LEFT JOIN {prefix}regs g
    ON a.event_type = g.event_type AND a.bucket = g.bucket),
{prefix}agg AS (
  SELECT event_type,
         CAST(sum(CAST(1 AS BIGINT) << ({shift} - reg)) AS BIGINT) AS s,
         CAST(sum(CASE WHEN reg = 0 THEN 1 ELSE 0 END) AS BIGINT) AS v
  FROM {prefix}full GROUP BY event_type),
{prefix}est AS (
  SELECT event_type,
         round(CASE WHEN {SK.HLL_RAW_NUM!r} / CAST(s AS DOUBLE)
                         <= {SK.HLL_LC_THRESHOLD!r} AND v > 0
                    THEN {float(m)!r} * ln({float(m)!r} / CAST(v AS DOUBLE))
                    ELSE {SK.HLL_RAW_NUM!r} / CAST(s AS DOUBLE) END,
               6) AS est
  FROM {prefix}agg)"""


def hll_distinct_sql() -> str:
    """Replicates __spark_entry__.q_hll_distinct: per-event_type HLL
    estimates of distinct users (linear-counting regime) and distinct
    event_ids (raw-estimator regime) beside the exact counts."""
    return f"""WITH {_hll_ctes("user_id", "#hllu", "u")},
{_hll_ctes("event_id", "#hlle", "e")},
exact AS (
  SELECT event_type,
         CAST(count(DISTINCT user_id) AS BIGINT) AS exact_users,
         CAST(count(DISTINCT event_id) AS BIGINT) AS exact_events
  FROM events GROUP BY event_type)
SELECT x.event_type, x.exact_users, uest.est AS hll_users,
       round(abs(uest.est - x.exact_users) / x.exact_users, 6) AS err_users,
       x.exact_events, eest.est AS hll_events,
       round(abs(eest.est - x.exact_events) / x.exact_events, 6) AS err_events
FROM exact x
JOIN uest ON x.event_type = uest.event_type
JOIN eest ON x.event_type = eest.event_type"""


def kmv_distinct_sql(k: int = 64) -> str:
    """Replicates __spark_entry__.q_kmv_distinct: bottom-k sketch of the
    distinct char-4-gram count per lang. (k-1)*2^60 is an exactly-
    representable float; the estimate is one IEEE division by h_(k)."""
    from .operators import sketch as SK

    num = (k - 1) * SK.KMV_SPACE
    return f"""WITH grams AS (
  SELECT lang,
         unnest(list_transform(range(1, greatest(length(text) - 3, 1) + 1),
                               i -> substr(text, CAST(i AS INT), 4))) AS g
  FROM documents),
dh AS (
  SELECT DISTINCT lang, {_portable_hash("g || '#kmv'")} AS h FROM grams),
rk AS (
  SELECT lang, h, row_number() OVER (PARTITION BY lang ORDER BY h) AS rn
  FROM dh),
kept AS (
  SELECT lang, CAST(count(*) AS BIGINT) AS n_kept,
         CAST(max(h) AS BIGINT) AS hk
  FROM rk WHERE rn <= {k} GROUP BY lang),
exact AS (
  SELECT lang, CAST(count(DISTINCT g) AS BIGINT) AS exact_grams
  FROM grams GROUP BY lang),
est AS (
  SELECT lang, n_kept,
         round(CASE WHEN n_kept < {k} THEN CAST(n_kept AS DOUBLE)
                    ELSE {num!r} / CAST(hk AS DOUBLE) END, 6) AS kmv_estimate
  FROM kept)
SELECT x.lang, x.exact_grams, e.n_kept, e.kmv_estimate,
       round(abs(e.kmv_estimate - x.exact_grams) / x.exact_grams, 6) AS rel_err
FROM exact x JOIN est e ON x.lang = e.lang"""


def cms_heavy_hitters_sql(threshold: int = 100) -> str:
    """Replicates __spark_entry__.q_cms_heavy_hitters: 4x8 count-min sketch
    over the deterministically skewed key k_<bitlength((event_id%1024)+1)>,
    point estimates = min over rows, heavy hitters at estimate >= threshold
    with the exact count and the (always >= 0) collision overestimate."""
    from .operators import sketch as SK

    d, w = SK.CMS_D, SK.CMS_W
    hexpr = _portable_hash(
        "hkey || '|' || CAST(r AS VARCHAR) || '#cms'"
    )
    return f"""WITH ev AS (
  SELECT 'k' || CAST(length(bin((event_id % 1024) + 1)) AS VARCHAR) AS hkey
  FROM events),
exact AS (
  SELECT hkey, CAST(count(*) AS BIGINT) AS exact_cnt FROM ev GROUP BY hkey),
expl AS (SELECT hkey, unnest(range({d})) AS r FROM ev),
cm AS (
  SELECT r, {hexpr} % {w} AS col, CAST(count(*) AS BIGINT) AS cnt
  FROM expl GROUP BY 1, 2),
probe AS (
  SELECT hkey, r, {hexpr} % {w} AS col
  FROM (SELECT DISTINCT hkey FROM ev), unnest(range({d})) AS u(r)),
est AS (
  SELECT p.hkey, CAST(min(c.cnt) AS BIGINT) AS cms_estimate
  FROM probe p JOIN cm c ON p.r = c.r AND p.col = c.col
  GROUP BY p.hkey)
SELECT x.hkey, x.exact_cnt, e.cms_estimate,
       CAST(e.cms_estimate - x.exact_cnt AS BIGINT) AS overestimate
FROM exact x JOIN est e ON x.hkey = e.hkey
WHERE e.cms_estimate >= {threshold}"""


def bloom_prune_sql(nationkey: int = 2) -> str:
    """Replicates __spark_entry__.q_bloom_prune: 1024-bit/3-hash Bloom
    filter from nation-<nationkey> customers probed by orders' distinct
    custkeys, rolled up per order priority with the exact semi-join truth,
    the false-positive count, and the (always 0) missed-true count."""
    from .operators import sketch as SK

    m, k = SK.BLOOM_M, SK.BLOOM_K
    pos = _portable_hash(
        "CAST(ck AS VARCHAR) || '|' || CAST(j AS VARCHAR) || '#bloom'"
    )
    return f"""WITH cust AS (
  SELECT c_custkey AS ck FROM customer WHERE c_nationkey = {nationkey}),
bits AS (
  SELECT DISTINCT {pos} % {m} AS pos
  FROM cust, unnest(range({k})) AS u(j)),
okeys AS (SELECT DISTINCT o_custkey AS ck FROM orders),
pp AS (
  SELECT ck, {pos} % {m} AS pos
  FROM okeys, unnest(range({k})) AS u(j)),
hits AS (
  SELECT pp.ck, count(*) AS n_hit
  FROM pp JOIN bits ON pp.pos = bits.pos GROUP BY pp.ck),
keyed AS (
  SELECT o.ck, coalesce(h.n_hit, 0) = {k} AS bloom_pass,
         EXISTS (SELECT 1 FROM cust c WHERE c.ck = o.ck) AS true_match
  FROM okeys o LEFT JOIN hits h ON o.ck = h.ck)
SELECT o.o_orderpriority,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(sum(CASE WHEN kd.bloom_pass THEN 1 ELSE 0 END) AS BIGINT)
           AS n_pass,
       CAST(sum(CASE WHEN kd.true_match THEN 1 ELSE 0 END) AS BIGINT)
           AS n_true,
       CAST(sum(CASE WHEN kd.bloom_pass AND NOT kd.true_match
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_false_pos,
       CAST(sum(CASE WHEN kd.true_match AND NOT kd.bloom_pass
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_missed
FROM orders o JOIN keyed kd ON o.o_custkey = kd.ck
GROUP BY o.o_orderpriority"""


def _hll_est_from_regs(regs_cte: str, prefix: str) -> str:
    """Estimate CTE chain (allb/full/agg/est) over an existing
    (event_type, bucket, reg) register CTE — the second half of
    :func:`_hll_ctes`, factored so merged and direct register tables can
    share it. Emits ``{prefix}est(event_type, est)``."""
    from .operators import sketch as SK

    m = SK.HLL_M
    shift = SK.HLL_RANK_BITS + 2
    return f"""{prefix}allb AS (
  SELECT event_type, unnest(range({m})) AS bucket
  FROM (SELECT DISTINCT event_type FROM {regs_cte})),
{prefix}full AS (
  SELECT a.event_type, coalesce(g.reg, 0) AS reg
  FROM {prefix}allb a
  LEFT JOIN {regs_cte} g
    ON a.event_type = g.event_type AND a.bucket = g.bucket),
{prefix}agg AS (
  SELECT event_type,
         CAST(sum(CAST(1 AS BIGINT) << ({shift} - reg)) AS BIGINT) AS s,
         CAST(sum(CASE WHEN reg = 0 THEN 1 ELSE 0 END) AS BIGINT) AS v
  FROM {prefix}full GROUP BY event_type),
{prefix}est AS (
  SELECT event_type,
         round(CASE WHEN {SK.HLL_RAW_NUM!r} / CAST(s AS DOUBLE)
                         <= {SK.HLL_LC_THRESHOLD!r} AND v > 0
                    THEN {float(m)!r} * ln({float(m)!r} / CAST(v AS DOUBLE))
                    ELSE {SK.HLL_RAW_NUM!r} / CAST(s AS DOUBLE) END,
               6) AS est
  FROM {prefix}agg)"""


def hll_merge_sql() -> str:
    """Replicates __spark_entry__.q_hll_merge: shard-local HLL register
    tables (events split 8 ways by event_id) merged by per-bucket max vs
    the directly-built global sketch — identical register maths to
    _hll_ctes, with the merge associativity checked as a column."""
    from .operators import sketch as SK

    m = SK.HLL_M
    max_rho = SK.HLL_MAX_RHO
    return f"""WITH ev AS (
  SELECT event_type, user_id, CAST(event_id % 8 AS INT) AS shard
  FROM events),
h AS (
  SELECT event_type, shard,
         {_portable_hash("CAST(user_id AS VARCHAR) || '#hllu'")} AS h
  FROM ev),
r AS (
  SELECT event_type, shard, h % {m} AS bucket,
         CASE WHEN (h >> {SK.HLL_P}) = 0 THEN {max_rho}
              ELSE {max_rho} - length(bin(h >> {SK.HLL_P})) END AS rho
  FROM h),
sregs AS (
  SELECT event_type, shard, bucket, max(rho) AS reg
  FROM r GROUP BY event_type, shard, bucket),
mregs AS (
  SELECT event_type, bucket, max(reg) AS reg
  FROM sregs GROUP BY event_type, bucket),
dregs AS (
  SELECT event_type, bucket, max(rho) AS reg
  FROM r GROUP BY event_type, bucket),
{_hll_est_from_regs("mregs", "m")},
{_hll_est_from_regs("dregs", "d")},
exact AS (
  SELECT event_type, CAST(count(DISTINCT user_id) AS BIGINT) AS exact_users
  FROM ev GROUP BY event_type)
SELECT x.event_type, x.exact_users,
       dest.est AS hll_direct, mest.est AS hll_merged,
       mest.est = dest.est AS merged_eq_direct,
       round(abs(mest.est - x.exact_users) / x.exact_users, 6) AS rel_err
FROM exact x
JOIN dest ON x.event_type = dest.event_type
JOIN mest ON x.event_type = mest.event_type"""


def kmv_overlap_sql(k: int = 64) -> str:
    """Replicates __spark_entry__.q_kmv_overlap: per-language-pair KMV
    Jaccard / intersection estimates of the word-vocabulary overlap
    (union sketch = bottom-k of the combined kept sets, jaccard =
    |{h <= theta in both}| / k) beside the exact values."""
    from .operators import sketch as SK

    num = (k - 1) * SK.KMV_SPACE
    return f"""WITH words AS (
  SELECT lang, unnest(str_split(text, ' ')) AS w FROM documents),
kept AS (
  SELECT lang, h FROM (
    SELECT lang, h, row_number() OVER (PARTITION BY lang ORDER BY h) AS rn
    FROM (SELECT DISTINCT lang,
                 {_portable_hash("w || '#kmvo'")} AS h
          FROM words))
  WHERE rn <= {k}),
pairs AS (
  SELECT a.lang AS ga, b.lang AS gb
  FROM (SELECT DISTINCT lang FROM kept) a,
       (SELECT DISTINCT lang FROM kept) b
  WHERE a.lang < b.lang),
ha AS (SELECT p.ga, p.gb, s.h FROM pairs p JOIN kept s ON s.lang = p.ga),
hb AS (SELECT p.ga, p.gb, s.h FROM pairs p JOIN kept s ON s.lang = p.gb),
u AS (SELECT DISTINCT ga, gb, h
      FROM (SELECT * FROM ha UNION ALL SELECT * FROM hb)),
stats AS (
  SELECT ga, gb, CAST(count(*) AS BIGINT) AS n_union_kept,
         CAST(max(h) AS BIGINT) AS theta
  FROM (SELECT ga, gb, h,
               row_number() OVER (PARTITION BY ga, gb ORDER BY h) AS rn
        FROM u)
  WHERE rn <= {k} GROUP BY ga, gb),
isect AS (
  SELECT a.ga, a.gb, a.h FROM ha a
  WHERE EXISTS (SELECT 1 FROM hb b
                WHERE b.ga = a.ga AND b.gb = a.gb AND b.h = a.h)),
ic AS (
  SELECT i.ga, i.gb, CAST(count(*) AS BIGINT) AS c
  FROM isect i JOIN stats s ON i.ga = s.ga AND i.gb = s.gb
  WHERE i.h <= s.theta GROUP BY i.ga, i.gb),
est AS (
  SELECT s.ga, s.gb, s.n_union_kept,
         CAST(coalesce(ic.c, 0) AS DOUBLE)
             / CAST(least({k}, s.n_union_kept) AS DOUBLE) AS jacc,
         CASE WHEN s.n_union_kept < {k} THEN CAST(s.n_union_kept AS DOUBLE)
              ELSE {num!r} / CAST(s.theta AS DOUBLE) END AS union_est
  FROM stats s LEFT JOIN ic ON s.ga = ic.ga AND s.gb = ic.gb),
dw AS (SELECT DISTINCT lang, w FROM words),
sz AS (SELECT lang, CAST(count(*) AS BIGINT) AS n FROM dw GROUP BY lang),
xin AS (
  SELECT a.lang AS ga, b.lang AS gb, CAST(count(*) AS BIGINT) AS exact_inter
  FROM dw a JOIN dw b ON a.w = b.w AND a.lang < b.lang
  GROUP BY a.lang, b.lang),
exact AS (
  SELECT x.ga, x.gb, x.exact_inter,
         round(CAST(x.exact_inter AS DOUBLE)
               / CAST(na.n + nb.n - x.exact_inter AS DOUBLE), 6)
             AS exact_jaccard
  FROM xin x JOIN sz na ON na.lang = x.ga JOIN sz nb ON nb.lang = x.gb)
SELECT e.ga AS lang_a, e.gb AS lang_b, e.exact_inter, e.exact_jaccard,
       s.n_union_kept,
       round(s.jacc, 6) AS kmv_jaccard,
       round(s.jacc * s.union_est, 6) AS kmv_inter,
       round(abs(round(s.jacc, 6) - e.exact_jaccard), 6) AS jaccard_abs_err
FROM exact e JOIN est s ON e.ga = s.ga AND e.gb = s.gb"""


def event_funnel_sql() -> str:
    """Replicates __spark_entry__.q_event_funnel: signup -> view -> click
    -> purchase, each step's first occurrence strictly after the previous
    step's first occurrence, with step-over-step conversion rates."""
    return """WITH t1 AS (
  SELECT user_id, min(ts) AS t FROM events
  WHERE event_type = 'signup' GROUP BY user_id),
t2 AS (
  SELECT e.user_id, min(e.ts) AS t FROM events e
  JOIN t1 ON e.user_id = t1.user_id
  WHERE e.event_type = 'view' AND e.ts > t1.t GROUP BY e.user_id),
t3 AS (
  SELECT e.user_id, min(e.ts) AS t FROM events e
  JOIN t2 ON e.user_id = t2.user_id
  WHERE e.event_type = 'click' AND e.ts > t2.t GROUP BY e.user_id),
t4 AS (
  SELECT e.user_id, min(e.ts) AS t FROM events e
  JOIN t3 ON e.user_id = t3.user_id
  WHERE e.event_type = 'purchase' AND e.ts > t3.t GROUP BY e.user_id),
steps AS (
  SELECT CAST(1 AS INT) AS step_idx, 'signup' AS step,
         CAST(count(*) AS BIGINT) AS n_users FROM t1
  UNION ALL
  SELECT CAST(2 AS INT), 'view', CAST(count(*) AS BIGINT) FROM t2
  UNION ALL
  SELECT CAST(3 AS INT), 'click', CAST(count(*) AS BIGINT) FROM t3
  UNION ALL
  SELECT CAST(4 AS INT), 'purchase', CAST(count(*) AS BIGINT) FROM t4)
SELECT step_idx, step, n_users,
       round(CAST(n_users AS DOUBLE)
             / CAST(coalesce(lag(n_users) OVER (ORDER BY step_idx),
                             n_users) AS DOUBLE), 6) AS conv_from_prev
FROM steps"""


def retention_cohorts_sql() -> str:
    """Replicates __spark_entry__.q_retention_cohorts: users cohorted by
    first-signup day, per-(cohort, day-offset) distinct-active counts and
    retention rates over the UTC event dates."""
    return """WITH coh AS (
  SELECT user_id, CAST(min(ts) AS DATE) AS cd FROM events
  WHERE event_type = 'signup' GROUP BY user_id),
sizes AS (
  SELECT cd, CAST(count(*) AS BIGINT) AS cohort_users
  FROM coh GROUP BY cd),
act AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events),
ret AS (
  SELECT c.cd, date_diff('day', c.cd, a.d) AS offset_days,
         CAST(count(*) AS BIGINT) AS n_active
  FROM act a JOIN coh c ON a.user_id = c.user_id
  WHERE a.d >= c.cd GROUP BY c.cd, date_diff('day', c.cd, a.d))
SELECT strftime(r.cd, '%Y-%m-%d') AS cohort_day,
       CAST(r.offset_days AS INT) AS offset_days,
       r.n_active, s.cohort_users,
       round(CAST(r.n_active AS DOUBLE) / CAST(s.cohort_users AS DOUBLE), 6)
           AS retention
FROM ret r JOIN sizes s ON r.cd = s.cd"""


def crawl_diff_sql() -> str:
    """Replicates __spark_entry__.q_crawl_diff: two deterministic crawl
    snapshots (A misses doc_id%10==0, B misses doc_id%10==1, doc_id%5==2
    changes content) full-outer-joined on url, per-status page counts."""
    dig_a = _portable_hash("text || '#crawlA'")
    dig_b = _portable_hash("text || ' v2' || '#crawlA'")
    return f"""WITH snap AS (
  SELECT 'https://h' || CAST(doc_id % 50 AS VARCHAR) || '.example/p/'
             || CAST(doc_id AS VARCHAR) AS url,
         doc_id,
         {dig_a} AS dig_a,
         CASE WHEN doc_id % 5 = 2 THEN {dig_b}
              ELSE {dig_a} END AS dig_b
  FROM documents),
a AS (SELECT url, dig_a FROM snap WHERE doc_id % 10 <> 0),
b AS (SELECT url, dig_b FROM snap WHERE doc_id % 10 <> 1),
j AS (SELECT a.dig_a, b.dig_b FROM a FULL OUTER JOIN b ON a.url = b.url),
counts AS (
  SELECT CASE WHEN dig_a IS NULL THEN 'added'
              WHEN dig_b IS NULL THEN 'gone'
              WHEN dig_a = dig_b THEN 'unchanged'
              ELSE 'changed' END AS status,
         CAST(count(*) AS BIGINT) AS n_pages
  FROM j GROUP BY 1),
tot AS (SELECT CAST(sum(n_pages) AS BIGINT) AS t FROM counts)
SELECT status, n_pages,
       round(CAST(n_pages AS DOUBLE) / CAST(t AS DOUBLE), 6) AS pct
FROM counts, tot"""


def length_quantiles_sql() -> str:
    """Replicates __spark_entry__.q_length_quantiles: per-language exact
    linear-interpolation percentiles of n_chars (rank = p*(n-1), both
    engines interpolate in doubles over exact integer lengths)."""
    return """WITH agg AS (
  SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
         CAST(min(n_chars) AS BIGINT) AS min_chars,
         quantile_cont(n_chars, [0.25, 0.5, 0.75, 0.9, 0.99]) AS q,
         CAST(max(n_chars) AS BIGINT) AS max_chars
  FROM documents GROUP BY lang)
SELECT lang, n_docs, min_chars,
       round(q[1], 6) AS p25, round(q[2], 6) AS p50, round(q[3], 6) AS p75,
       round(q[4], 6) AS p90, round(q[5], 6) AS p99,
       max_chars
FROM agg"""


def weighted_sample_sql(k: int = 50) -> str:
    """Replicates __spark_entry__.q_weighted_sample: A-Res weighted
    reservoir (Efraimidis & Spirakis 2006) — priority ln(u)/w rounded to
    9 decimals with a doc_id tiebreak, top-k per language."""
    h = _portable_hash("CAST(doc_id AS VARCHAR) || '#wres'")
    space = float(1 << 60)
    return f"""WITH d AS (
  SELECT lang, doc_id, CAST(n_chars AS BIGINT) AS w,
         round(ln(CAST({h} + 1 AS DOUBLE) / {space!r})
               / CAST(n_chars AS DOUBLE), 9) AS key
  FROM documents),
r AS (
  SELECT lang, doc_id, w, key,
         CAST(row_number() OVER (PARTITION BY lang
                                 ORDER BY key DESC, doc_id ASC) AS INT)
             AS rank
  FROM d)
SELECT lang, rank, doc_id, w, key FROM r WHERE rank <= {k}"""


def journey_transitions_sql() -> str:
    """Replicates __spark_entry__.q_journey_transitions: per-user
    (ts, event_id)-ordered next-event pairs, counts and P(to | from)."""
    return """WITH p AS (
  SELECT event_type AS from_type,
         lead(event_type) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS to_type
  FROM events),
c AS (
  SELECT from_type, to_type, CAST(count(*) AS BIGINT) AS n
  FROM p WHERE to_type IS NOT NULL GROUP BY from_type, to_type),
t AS (SELECT from_type, CAST(sum(n) AS BIGINT) AS tot FROM c
      GROUP BY from_type)
SELECT c.from_type, c.to_type, c.n,
       round(CAST(c.n AS DOUBLE) / CAST(t.tot AS DOUBLE), 6) AS prob
FROM c JOIN t ON c.from_type = t.from_type"""


def fact_history_sql(pred: str = "born_in") -> str:
    """Replicates operators.output.fact_history: SCD-2 versioned segments
    per (subj, pred) — same recency key and same-instant max(obj) tie rule
    as resolve_recency_sql, then lag-mark / running-sum / lead-bound
    windows (valid_to_excl = -1 for the open current segment)."""
    return f"""WITH {_DOCS_CTE}, {_FACTS_CTE},
t AS (SELECT DISTINCT doc_id, {_RELS}[rel_idx + 1] AS pred,
      {_subj_expr()} AS subj, {_obj_expr(False)} AS obj FROM facts),
tt AS (SELECT pred, subj, obj,
              (doc_id % 365) * 86400 + (doc_id * 7) % 86400 AS rk
       FROM t WHERE pred = {sql_str(pred)}),
a AS (SELECT pred, subj, rk, max(obj) AS obj FROM tt GROUP BY pred, subj, rk),
m AS (SELECT pred, subj, obj, rk,
             CASE WHEN lag(obj) OVER (PARTITION BY pred, subj ORDER BY rk)
                       IS NULL
                  OR lag(obj) OVER (PARTITION BY pred, subj ORDER BY rk)
                       <> obj
                  THEN 1 ELSE 0 END AS chg
      FROM a),
r AS (SELECT pred, subj, obj, rk,
             CAST(sum(chg) OVER (PARTITION BY pred, subj ORDER BY rk
                                 ROWS BETWEEN UNBOUNDED PRECEDING
                                 AND CURRENT ROW) AS INT) AS version
      FROM m),
segs AS (SELECT pred, subj, version, max(obj) AS obj,
                CAST(min(rk) AS BIGINT) AS valid_from
         FROM r GROUP BY pred, subj, version)
SELECT subj, pred, obj, version, valid_from,
       CAST(coalesce(lead(valid_from)
                         OVER (PARTITION BY pred, subj ORDER BY valid_from),
                     -1) AS BIGINT) AS valid_to_excl,
       lead(valid_from) OVER (PARTITION BY pred, subj ORDER BY valid_from)
           IS NULL AS is_current
FROM segs"""


def vocab_growth_sql() -> str:
    """Replicates __spark_entry__.q_vocab_growth: per-100-doc-slice new
    token types (first occurrence = min bucket), cumulative types vs
    cumulative tokens, running type-token ratio."""
    return """WITH tok AS (
  SELECT doc_id // 100 AS bucket, unnest(str_split(text, ' ')) AS tk
  FROM documents),
newb AS (
  SELECT bucket, CAST(count(*) AS BIGINT) AS n_new_types
  FROM (SELECT tk, min(bucket) AS bucket FROM tok GROUP BY tk)
  GROUP BY bucket),
tokc AS (SELECT bucket, CAST(count(*) AS BIGINT) AS n_tokens
         FROM tok GROUP BY bucket),
docc AS (SELECT doc_id // 100 AS bucket, CAST(count(*) AS BIGINT) AS n_docs
         FROM documents GROUP BY 1),
base AS (
  SELECT CAST(d.bucket AS INT) AS bucket, d.n_docs, t.n_tokens,
         CAST(coalesce(n.n_new_types, 0) AS BIGINT) AS n_new_types
  FROM docc d JOIN tokc t ON d.bucket = t.bucket
  LEFT JOIN newb n ON d.bucket = n.bucket),
c AS (
  SELECT bucket, n_docs, n_tokens, n_new_types,
         CAST(sum(n_tokens) OVER (ORDER BY bucket
                                  ROWS BETWEEN UNBOUNDED PRECEDING
                                  AND CURRENT ROW) AS BIGINT) AS tokens_cum,
         CAST(sum(n_new_types) OVER (ORDER BY bucket
                                     ROWS BETWEEN UNBOUNDED PRECEDING
                                     AND CURRENT ROW) AS BIGINT) AS types_cum
  FROM base)
SELECT bucket, n_docs, n_tokens, n_new_types, tokens_cum, types_cum,
       round(CAST(types_cum AS DOUBLE) / CAST(tokens_cum AS DOUBLE), 6)
           AS ttr
FROM c"""


def _asof_where(t: int) -> str:
    return f"valid_from <= {t} AND (valid_to_excl = -1 OR valid_to_excl > {t})"


def kg_as_of_sql(t: int, pred: str = "born_in") -> str:
    """Replicates __spark_entry__.q_kg_as_of: the SCD-2 segment containing
    crawl-time t, per (subj, pred)."""
    return f"""WITH h AS ({fact_history_sql(pred)})
SELECT subj, pred, obj, version, valid_from
FROM h WHERE {_asof_where(t)}"""


def kg_snapshot_diff_sql(t1: int, t2: int, pred: str = "born_in") -> str:
    """Replicates __spark_entry__.q_kg_snapshot_diff: full-outer fact-key
    join of the t1 and t2 point-in-time snapshots with added / removed /
    changed / same status."""
    return f"""WITH h AS ({fact_history_sql(pred)}),
a AS (SELECT subj, pred, obj AS obj_t1 FROM h WHERE {_asof_where(t1)}),
b AS (SELECT subj, pred, obj AS obj_t2 FROM h WHERE {_asof_where(t2)})
SELECT coalesce(a.subj, b.subj) AS subj, coalesce(a.pred, b.pred) AS pred,
       coalesce(a.obj_t1, '') AS obj_t1, coalesce(b.obj_t2, '') AS obj_t2,
       CASE WHEN a.obj_t1 IS NULL THEN 'added'
            WHEN b.obj_t2 IS NULL THEN 'removed'
            WHEN a.obj_t1 = b.obj_t2 THEN 'same'
            ELSE 'changed' END AS status
FROM a FULL OUTER JOIN b ON a.subj = b.subj AND a.pred = b.pred"""


def boolean_retrieval_sql(n_terms: int = 3) -> str:
    """Replicates __spark_entry__.q_boolean_retrieval: documents containing
    ALL of the corpus's n most frequent tokens (portable
    (count desc, token asc) term pick, posting-list intersection)."""
    return f"""WITH tok AS (
  SELECT doc_id, unnest(str_split(text, ' ')) AS tk FROM documents),
top AS (SELECT tk FROM (SELECT tk, count(*) AS c FROM tok GROUP BY tk)
        ORDER BY c DESC, tk ASC LIMIT {n_terms}),
hit AS (SELECT DISTINCT t.doc_id, t.tk FROM tok t JOIN top u ON t.tk = u.tk),
d AS (SELECT doc_id FROM hit GROUP BY doc_id HAVING count(*) = {n_terms})
SELECT x.doc_id, x.lang FROM documents x JOIN d ON x.doc_id = d.doc_id"""


def lang_id_eval_sql() -> str:
    """Replicates __spark_entry__.q_lang_id_eval: confusion matrix of the
    heuristic language-ID against the corpus labels, with each cell's
    share of its true class."""
    return f"""WITH {_lang_pred_ctes()},
j AS (SELECT d.lang AS true_lang, p.lang_pred AS pred_lang,
             CAST(count(*) AS BIGINT) AS n
      FROM documents d JOIN p ON d.doc_id = p.doc_id
      GROUP BY d.lang, p.lang_pred),
t AS (SELECT true_lang, CAST(sum(n) AS BIGINT) AS tot FROM j
      GROUP BY true_lang)
SELECT j.true_lang, j.pred_lang, j.n,
       round(CAST(j.n AS DOUBLE) / CAST(t.tot AS DOUBLE), 6)
           AS share_of_true
FROM j JOIN t ON j.true_lang = t.true_lang"""


def _distinct_triples_cte() -> str:
    """``t(pred, subj, obj)`` — the fully-distinct raw fact table, shared
    by the rule-mining oracles (doc-level provenance dropped)."""
    return f"""t AS (SELECT DISTINCT {_RELS}[rel_idx + 1] AS pred,
      {_subj_expr()} AS subj, {_obj_expr(False)} AS obj FROM facts)"""


def rule_mining_sql(min_support: int = 5) -> str:
    """Replicates operators.graph.rule_mining: 2-atom chain-rule bodies by
    one bridge-entity self-join, head support by a fact-key join,
    confidence = support / n_pairs."""
    return f"""WITH {_DOCS_CTE}, {_FACTS_CTE},
{_distinct_triples_cte()},
paths AS (
  SELECT DISTINCT a.pred AS body_a, b.pred AS body_b, a.subj AS s,
         b.obj AS o
  FROM t a JOIN t b ON a.obj = b.subj),
body AS (SELECT body_a, body_b, CAST(count(*) AS BIGINT) AS n_pairs
         FROM paths GROUP BY body_a, body_b),
m AS (
  SELECT p.body_a, p.body_b, h.pred AS head_pred,
         CAST(count(*) AS BIGINT) AS support
  FROM paths p JOIN t h ON p.s = h.subj AND p.o = h.obj
  GROUP BY p.body_a, p.body_b, h.pred)
SELECT m.body_a, m.body_b, m.head_pred, b.n_pairs, m.support,
       round(CAST(m.support AS DOUBLE) / CAST(b.n_pairs AS DOUBLE), 6)
           AS confidence
FROM m JOIN body b ON m.body_a = b.body_a AND m.body_b = b.body_b
WHERE m.support >= {min_support}"""


def implication_rules_sql(min_support: int = 2) -> str:
    """Replicates operators.graph.implication_rules: same-direction and
    inverse predicate-pair overlaps with confidence = support / |p|."""
    return f"""WITH {_DOCS_CTE}, {_FACTS_CTE},
{_distinct_triples_cte()},
sizes AS (SELECT pred, CAST(count(*) AS BIGINT) AS n_p FROM t
          GROUP BY pred),
same AS (
  SELECT a.pred, b.pred AS q, 'same' AS direction,
         CAST(count(*) AS BIGINT) AS support
  FROM t a JOIN t b ON a.subj = b.subj AND a.obj = b.obj
       AND a.pred <> b.pred
  GROUP BY a.pred, b.pred),
inv AS (
  SELECT a.pred, b.pred AS q, 'inverse' AS direction,
         CAST(count(*) AS BIGINT) AS support
  FROM t a JOIN t b ON a.subj = b.obj AND a.obj = b.subj
  GROUP BY a.pred, b.pred),
u AS (SELECT * FROM same UNION ALL SELECT * FROM inv)
SELECT u.pred AS p, u.q, u.direction, u.support, s.n_p,
       round(CAST(u.support AS DOUBLE) / CAST(s.n_p AS DOUBLE), 6)
           AS confidence
FROM u JOIN sizes s ON u.pred = s.pred
WHERE u.support >= {min_support}"""


def bootstrap_ci_sql(b: int = 32) -> str:
    """Replicates __spark_entry__.q_bootstrap_ci: hash-derandomized
    Poisson(1) bootstrap of the mean document length — exact-integer
    per-resample sums, one IEEE division per mean, percentile interval
    over the resample means."""
    u = (
        f"CAST({_portable_hash('CAST(doc_id AS VARCHAR) || ' + chr(39) + '|' + chr(39) + ' || CAST(b AS VARCHAR) || ' + chr(39) + '#boot' + chr(39))} AS DOUBLE)"
        f" / {float(1 << 60)!r}"
    )
    return f"""WITH pairs AS (
  SELECT doc_id, n_chars, unnest(range({b})) AS b FROM documents),
w AS (
  SELECT n_chars, b,
         CAST(CASE WHEN {u} < 0.36787944117144233 THEN 0
                   WHEN {u} < 0.7357588823428847 THEN 1
                   WHEN {u} < 0.9196986029286058 THEN 2
                   WHEN {u} < 0.9810118431238462 THEN 3
                   WHEN {u} < 0.9963401531726563 THEN 4
                   ELSE 5 END AS BIGINT) AS w
  FROM pairs),
means AS (
  SELECT round(CAST(sum(w * n_chars) AS DOUBLE)
               / CAST(sum(w) AS DOUBLE), 6) AS m
  FROM w GROUP BY b),
pt AS (
  SELECT round(CAST(CAST(sum(n_chars) AS BIGINT) AS DOUBLE)
               / CAST(count(*) AS DOUBLE), 6) AS mean_chars
  FROM documents),
ci AS (
  SELECT round(quantile_cont(m, 0.025), 6) AS ci_lo,
         round(quantile_cont(m, 0.975), 6) AS ci_hi,
         CAST(count(*) AS BIGINT) AS n_resamples
  FROM means)
SELECT pt.mean_chars, ci.ci_lo, ci.ci_hi, ci.n_resamples
FROM pt, ci"""


def apply_mined_rules_sql(
    min_support: int = 5, min_confidence: float = 0.5
) -> str:
    """Replicates operators.graph.apply_mined_rules: mined chain rules at
    confidence >= threshold fire over their body paths; endpoints whose
    head fact is absent become proposed facts with provenance."""
    return f"""WITH {_DOCS_CTE}, {_FACTS_CTE},
{_distinct_triples_cte()},
paths AS (
  SELECT DISTINCT a.pred AS body_a, b.pred AS body_b, a.subj AS s,
         b.obj AS o
  FROM t a JOIN t b ON a.obj = b.subj),
body AS (SELECT body_a, body_b, CAST(count(*) AS BIGINT) AS n_pairs
         FROM paths GROUP BY body_a, body_b),
m AS (
  SELECT p.body_a, p.body_b, h.pred AS head_pred,
         CAST(count(*) AS BIGINT) AS support
  FROM paths p JOIN t h ON p.s = h.subj AND p.o = h.obj
  GROUP BY p.body_a, p.body_b, h.pred),
rules AS (
  SELECT m.body_a, m.body_b, m.head_pred,
         round(CAST(m.support AS DOUBLE) / CAST(b.n_pairs AS DOUBLE), 6)
             AS confidence
  FROM m JOIN body b ON m.body_a = b.body_a AND m.body_b = b.body_b
  WHERE m.support >= {min_support}
    AND round(CAST(m.support AS DOUBLE) / CAST(b.n_pairs AS DOUBLE), 6)
        >= {min_confidence!r}),
fired AS (
  SELECT p.s, r.head_pred, p.o, r.body_a, r.body_b, r.confidence
  FROM paths p JOIN rules r
    ON p.body_a = r.body_a AND p.body_b = r.body_b)
SELECT DISTINCT f.s AS subj, f.head_pred AS pred, f.o AS obj,
       f.body_a, f.body_b, f.confidence
FROM fired f
WHERE NOT EXISTS (SELECT 1 FROM t
                  WHERE t.pred = f.head_pred AND t.subj = f.s
                    AND t.obj = f.o)"""


def knn_graph_sql(k: int = 5, n_planes: int = 3, n_tables: int = 4) -> str:
    """Replicates __spark_entry__.q_knn_graph: the all-points LSH k-NN
    graph (ann_topk with every vector as a query) plus the mutual flag."""
    inner = ann_topk_sql(
        k=k, n_queries=None, n_planes=n_planes, n_tables=n_tables
    )
    return f"""WITH knn AS ({inner})
SELECT k1.query_id AS src, k1.neighbor_id AS dst, k1.cosine, k1.rank,
       EXISTS (SELECT 1 FROM knn k2
               WHERE k2.query_id = k1.neighbor_id
                 AND k2.neighbor_id = k1.query_id) AS mutual
FROM knn k1"""


def dedup_best_survivor_sql(threshold: float = 0.8) -> str:
    """Replicates __spark_entry__.q_dedup_best_survivor: per near-dup
    cluster, the quality-argmax canonical (ties -> min doc_id) with the
    `moved` flag vs the min-id policy. quality is exact 0.25 multiples so
    the float equality in the argmax join is safe."""
    return f"""WITH RECURSIVE {_doc_dedup_ctes(threshold)},
{_quality_cte()},
tq AS (SELECT l.keep_id AS cluster_id, l.doc_id, q.quality
       FROM labeled l JOIN qual q ON l.doc_id = q.doc_id),
mx AS (SELECT cluster_id, max(quality) AS q,
              CAST(count(*) AS BIGINT) AS n_members
       FROM tq GROUP BY cluster_id),
sv AS (SELECT t.cluster_id, CAST(min(t.doc_id) AS BIGINT) AS survivor_id
       FROM tq t JOIN mx ON t.cluster_id = mx.cluster_id
            AND t.quality = mx.q
       GROUP BY t.cluster_id)
SELECT m.cluster_id, m.n_members, s.survivor_id,
       round(m.q, 6) AS survivor_quality,
       s.survivor_id <> m.cluster_id AS moved
FROM mx m JOIN sv s ON m.cluster_id = s.cluster_id"""


def video_frames_sql(every_ms: int = 5000) -> str:
    """Replicates __spark_entry__.q_video_frames: videos at doc_id%7==0
    with duration (doc_id%30+1)s, one frame per every_ms sample point,
    frame bytes = md5(url#idx) (the deterministic fake decoder)."""
    url = (
        "'https://site' || CAST(CASE WHEN doc_id % 5 = 0 THEN 0 "
        f"ELSE doc_id % {S.N_HOSTS} END AS VARCHAR) || '.example.com/page/' "
        "|| CAST(doc_id AS VARCHAR)"
    )
    return f"""WITH v AS (
  SELECT {url} AS url,
         CAST((doc_id % 30 + 1) * 1000 AS INT) AS duration_ms
  FROM documents WHERE doc_id % 7 = 0),
f AS (
  SELECT url,
         CAST(unnest(range(0, duration_ms // {every_ms} + 1)) AS INT)
             AS frame_idx
  FROM v)
SELECT url, frame_idx,
       CAST(frame_idx * {every_ms} AS INT) AS frame_ts_ms,
       md5(url || '#' || CAST(frame_idx AS VARCHAR)) AS frame_md5
FROM f"""


def zipf_fit_sql(top: int = 100) -> str:
    """Replicates __spark_entry__.q_zipf_fit: per-language OLS of
    ln(freq) on ln(rank) over the top-`top` token head."""
    return f"""WITH counts AS (
  SELECT lang, tk, CAST(count(*) AS BIGINT) AS c
  FROM (SELECT lang, unnest(str_split(text, ' ')) AS tk FROM documents)
  GROUP BY lang, tk),
head AS (
  SELECT lang, ln(CAST(rn AS DOUBLE)) AS x, ln(CAST(c AS DOUBLE)) AS y
  FROM (SELECT lang, c,
               row_number() OVER (PARTITION BY lang
                                  ORDER BY c DESC, tk ASC) AS rn
        FROM counts)
  WHERE rn <= {top}),
agg AS (
  SELECT lang, CAST(count(*) AS DOUBLE) AS n,
         sum(x) AS sx, sum(y) AS sy, sum(x * y) AS sxy,
         sum(x * x) AS sxx, sum(y * y) AS syy
  FROM head GROUP BY lang)
SELECT lang, CAST(n AS BIGINT) AS n_head,
       round(-((n * sxy - sx * sy) / (n * sxx - sx * sx)), 6) AS alpha,
       round((sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx) / n, 6)
           AS intercept,
       round((n * sxy - sx * sy) * (n * sxy - sx * sy)
             / ((n * sxx - sx * sx) * (n * syy - sy * sy)), 6) AS r2
FROM agg"""


def dedup_recall_eval_sql(threshold: float = 0.5) -> str:
    """Replicates __spark_entry__.q_dedup_recall_eval: exhaustive
    exact-Jaccard truth vs the MinHash banded pipeline at the same
    threshold, per floor(j*10) band."""
    return f"""WITH {_minhash_pairs_ctes()},
tin AS (SELECT a.id AS id_a, b.id AS id_b, count(*) AS n_inter
        FROM sh a JOIN sh b ON a.sh = b.sh AND a.id < b.id
        GROUP BY a.id, b.id),
truth AS (
  SELECT t.id_a, t.id_b,
         t.n_inter * 1.0 / (sa.n + sb.n - t.n_inter) AS jaccard
  FROM tin t JOIN sizes sa ON sa.id = t.id_a
       JOIN sizes sb ON sb.id = t.id_b
  WHERE t.n_inter * 1.0 / (sa.n + sb.n - t.n_inter) >= {threshold}),
pred AS (SELECT id_a, id_b FROM jac WHERE jaccard >= {threshold}),
f AS (
  SELECT CAST(floor(t.jaccard * 10) AS INT) AS band,
         EXISTS (SELECT 1 FROM pred p
                 WHERE p.id_a = t.id_a AND p.id_b = t.id_b) AS found
  FROM truth t)
SELECT band, CAST(count(*) AS BIGINT) AS n_true,
       CAST(sum(CASE WHEN found THEN 1 ELSE 0 END) AS BIGINT) AS n_found,
       round(CAST(sum(CASE WHEN found THEN 1 ELSE 0 END) AS DOUBLE)
             / CAST(count(*) AS DOUBLE), 6) AS recall
FROM f GROUP BY band"""


def length_outliers_sql(k: float = 5.0) -> str:
    """Replicates __spark_entry__.q_length_outliers: per-language median +
    MAD over n_chars, docs with |x - med| > k*MAD."""
    return f"""WITH med AS (
  SELECT lang, quantile_cont(n_chars, 0.5) AS med
  FROM documents GROUP BY lang),
dev AS (
  SELECT d.lang, abs(d.n_chars - m.med) AS adev
  FROM documents d JOIN med m ON d.lang = m.lang),
mad AS (SELECT lang, quantile_cont(adev, 0.5) AS mad FROM dev GROUP BY lang)
SELECT d.lang, d.doc_id, d.n_chars,
       round(m.med, 6) AS med, round(x.mad, 6) AS mad
FROM documents d JOIN med m ON d.lang = m.lang
JOIN mad x ON d.lang = x.lang
WHERE abs(d.n_chars - m.med) > {k!r} * x.mad"""


def host_lang_entropy_sql() -> str:
    """Replicates __spark_entry__.q_host_lang_entropy: per-host language
    entropy H = ln(n) - sum(c*ln c)/n from exact integer counts."""
    return f"""WITH hl AS (
  SELECT 'site' || CAST(CASE WHEN doc_id % 5 = 0 THEN 0
             ELSE doc_id % {S.N_HOSTS} END AS VARCHAR) || '.example.com'
             AS host,
         lang, CAST(count(*) AS BIGINT) AS c
  FROM documents GROUP BY 1, 2),
agg AS (
  SELECT host, CAST(sum(c) AS BIGINT) AS n,
         CAST(count(*) AS BIGINT) AS n_langs,
         sum(CAST(c AS DOUBLE) * ln(CAST(c AS DOUBLE))) AS sclnc
  FROM hl GROUP BY host)
SELECT host, n, n_langs,
       round(ln(CAST(n AS DOUBLE)) - sclnc / CAST(n AS DOUBLE), 6)
           AS lang_entropy
FROM agg"""
