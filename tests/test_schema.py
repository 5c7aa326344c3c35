"""Entity universe / fact-math invariants the SQL oracle depends on."""

from autoextraction_spark import schema as S


def test_entity_universe_unique():
    assert len(set(S.PEOPLE)) == 48
    assert len(set(S.ORGS)) == 48
    assert len(set(S.CITIES)) == 24
    assert len(set(S.ZH_PEOPLE)) == 12


def test_index_arithmetic_matches_lists():
    # the oracle reconstructs PEOPLE[p] as FIRSTS[p%16] + ' ' + LASTS[p//16]
    for p in range(48):
        assert S.PEOPLE[p] == f"{S.FIRSTS[p % 16]} {S.LASTS[p // 16]}"
    for o in range(48):
        assert S.ORGS[o] == f"{S.ORG_BASES[o % 16]} {S.ORG_SUFFIXES[o // 16]}"


def test_fact_surfaces_deterministic():
    assert S.fact_surfaces(7, 0, "en") == S.fact_surfaces(7, 0, "en")
    rel, subj, obj, obj_canon = S.fact_surfaces(4, 0, "en")
    # doc 4, i 0: variant gate (4+0)%6==4 fires only when obj is a Corp org
    assert obj == obj_canon or obj.endswith("Corporation")


def test_variant_org_is_linkable():
    found = False
    for d in range(200):
        for i in range(S.n_facts(d)):
            rel, subj, obj, canon = S.fact_surfaces(d, i, "en")
            if obj != canon:
                assert obj.endswith(" Corporation")
                assert canon.endswith(" Corp")
                assert obj.split(" ")[0] == canon.split(" ")[0]
                found = True
    assert found, "corpus must plant org-name variants for entity linking"


def test_event_parts_avoid_relation_connectors():
    # an event part containing a relation connector would plant false
    # relation matches in event sentences (e.g. '…位于' would fire based_in)
    for etype, ev in S.EVENTS.items():
        templates = S.ZH_TEMPLATES if ev["lang"] == "zh" else S.EN_TEMPLATES
        connectors = [c for t in templates.values() for c, _ in t]
        for part in ev["parts"]:
            for conn in connectors:
                assert conn.strip() not in part, (etype, part, conn)
        # and event anchors must not appear in relation templates
        for conn in connectors:
            assert ev["anchor"].strip() not in conn, (etype, conn)


def test_zh_events_exist():
    assert S.EVENT_NAMES_BY_LANG["zh"], "events must not be en-only"
    assert S.has_event(1, "zh") and S.has_event(1, "en")
    etype, vals = S.event_surfaces(1, "zh")
    assert S.EVENTS[etype]["lang"] == "zh"
    assert all(any("一" <= ch <= "鿿" for ch in v) for v in vals)
    sent = S.event_sentence(1, "zh")
    assert all(v in sent for v in vals)


def test_no_entity_is_substring_ambiguous():
    # 'X Corp' must not be a prefix-token collision with a different org base
    bases = set(S.ORG_BASES)
    assert len(bases) == 16
    # anchors must not occur inside filler sentences (would break detection)
    anchors = [c for t in S.EN_TEMPLATES.values() for c, _ in t]
    for f in S.FILLERS:
        for a in anchors:
            assert a not in f
