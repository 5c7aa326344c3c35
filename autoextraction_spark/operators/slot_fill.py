"""Stage C — ordered slot filling: adaptive-order episode execution.

Reference semantics (operators E2-E12, SURVEY.md §2.3): per (document,
relation) an episode fills slots one at a time in an adaptively chosen order;
every candidate mention for the chosen slot FORKS the state
(Environment.py:186-224 ``step``: dedup at :198, fork loop :200-214), up to
20 rounds (predict.py:86), until no slots remain.

Spark-first design, two physical strategies for the same logical operator:

**fused (default)** — the episode is a pure function of a single row
(text, rel, lang): no step of it ever needs data from another row, so the
whole bounded fork recursion runs inside ONE Arrow-vectorized ``mapInPandas``
pass and emits the completed typed states directly. At 100 TB this is the
plan you want: one narrow map stage over (pages × gated relations) — zero
shuffles, zero per-round lineage/checkpoint barriers, and the (large) text
column crosses the Arrow boundary exactly once instead of once per round.
This removed the round-1 bottleneck where the upstream generation →
extraction → detection chain was recomputed per arity group (6.7× the
recorded kg_triples baseline under the driver's cold run).

**rounds** — the driver-orchestrated loop over a typed state DataFrame
``(url, rel, text, lang, assigned map<string,string>, remaining
array<string>, score double, step int)``: each iteration is one
struct-returning ``mapInPandas`` pass {Q-score remaining slots → argmax
ensemble → extract → score2prob → null fallback} followed by a shuffle-free
``explode`` fork, with DISK_ONLY ``localCheckpoint`` barriers cutting
lineage. Kept for unbounded/unknown schemas (per-round termination checks)
and as the cross-check implementation — ``tests/test_slot_fill.py`` asserts
fused ≡ rounds on every policy.

Both strategies bound loop depth by the max slot count (≤ ~6, cap 20 =
reference episode cap DQN.py:21/predict.py:86).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from .. import scorers
from .. import schema as S

MAX_STEPS = 20  # reference episode cap, DQN.py:21 / predict.py:86

STATE_COLS = ["url", "rel", "text", "lang", "assigned", "remaining", "score", "step"]

_STEP_SCHEMA = (
    "url string, rel string, text string, lang string, "
    "assigned map<string,string>, "
    "remaining array<string>, score double, step int, chosen string, "
    "reward double, mentions array<string>, probs array<double>, "
    "scores array<double>"
)


def initial_remaining(rel: str, lang: str) -> list[str]:
    """Slot schema per relation/event type (Environment.py:64-85,402-405)."""
    if rel in S.EVENTS:
        return list(S.EVENTS[rel]["roles"])
    return list(S.ZH_SLOTS) if lang == "zh" else list(S.EN_SLOTS)


def initial_states(detected: DataFrame) -> DataFrame:
    """Seed one state per gated (url, rel): empty cond, full slot schema.

    Mirrors Environment.py:371-376 ``reset_with_input``; the slot schema is
    the fixed two-slot relational schema per language
    (Environment.py:402-405).
    """
    remaining = None
    for etype, ev in S.EVENTS.items():
        branch = F.when(
            F.col("rel") == etype, F.array(*[F.lit(r) for r in ev["roles"]])
        )
        remaining = branch if remaining is None else remaining.when(
            F.col("rel") == etype, F.array(*[F.lit(r) for r in ev["roles"]])
        )
    remaining = remaining.when(
        F.col("lang") == "zh", F.array(*[F.lit(s) for s in S.ZH_SLOTS])
    ).otherwise(F.array(*[F.lit(s) for s in S.EN_SLOTS]))
    empty_map = F.map_from_arrays(
        F.array().cast("array<string>"), F.array().cast("array<string>")
    )
    return detected.select(
        "url",
        "rel",
        "text",
        "lang",
        empty_map.alias("assigned"),
        remaining.alias("remaining"),
        F.lit(0.0).alias("score"),
        F.lit(0).alias("step"),
    )


# --------------------------------------------------------------- fused path

def _episode_schema(carry_text: bool) -> str:
    cols = ["url string", "rel string"]
    if carry_text:
        cols.append("text string")
    cols += [
        "lang string",
        "assigned map<string,string>",
        "remaining array<string>",
        "score double",
        "step int",
    ]
    return ", ".join(cols)


def _episode_frame(
    rows: list[tuple],
    policy: str,
    max_steps: int,
    carry_text: bool,
    dedup_assignments: bool,
) -> pd.DataFrame:
    """Run every (url, rel, text, lang) episode of one Arrow batch to
    completion and return the completed typed states as one DataFrame —
    the shared wave engine behind ``fused_slot_fill`` and
    ``episodes_from_skeleton`` (one interior, two physical entry points)."""
    out: dict[str, list] = {c: [] for c in STATE_COLS}
    # per-row sets of already-emitted assignments (dedup_assignments):
    # different fork paths of ONE episode tree can complete with the
    # same assignment map, and downstream set-semantics consumers
    # (O4 distinct) only look at (url, rel, assigned) — all constant
    # or keyed within this row. Dropping the duplicates HERE, where
    # the whole tree is in hand, replaces a full-output shuffle.
    seen: list[set] = [set() for _ in rows] if dedup_assignments else []

    def emit(ri: int, assigned: dict, remaining: list, score: float, step: int):
        if dedup_assignments:
            key = (frozenset(assigned.items()), tuple(remaining))
            if key in seen[ri]:
                return
            seen[ri].add(key)
        url, rel, text, lang = rows[ri]
        out["url"].append(url)
        out["rel"].append(rel)
        out["text"].append(text)
        out["lang"].append(lang)
        out["assigned"].append(assigned)
        out["remaining"].append(remaining)
        out["score"].append(score)
        out["step"].append(step)

    # BREADTH-FIRST fork waves across the whole Arrow batch: every
    # live state at the current depth — across all rows — is scored
    # by ONE scorers.batch_step call, so a neural scorer runs one
    # tensor-batched forward per wave instead of one per (row, step)
    # (the model-batching seam, VERDICT.md round-2 item 2). Bounded
    # by max_steps; terminates regardless — the '[None]' fallback
    # fills every slot, so remaining shrinks by 1 per wave.
    wave: list[tuple[int, dict, list[str], float, int]] = [
        (ri, {}, initial_remaining(rel, lang), 0.0, 0)
        for ri, (_url, rel, _text, lang) in enumerate(rows)
    ]
    while wave:
        pending = []
        for ri, assigned, remaining, score, step in wave:
            if not remaining or step >= max_steps:
                emit(ri, assigned, remaining, score, step)
            else:
                pending.append((ri, assigned, remaining, score, step))
        if not pending:
            break
        results = scorers.batch_step(
            [
                (rows[ri][2], rows[ri][1], rows[ri][3], assigned, remaining)
                for ri, assigned, remaining, _score, _step in pending
            ],
            policy,
        )
        wave = []
        for (ri, assigned, remaining, score, step), (slot, cands, _rw) in zip(
            pending, results
        ):
            rem2 = [r for r in remaining if r != slot]
            for mention, _prob, sc in cands:
                forked = dict(assigned)
                forked[slot] = mention
                wave.append((ri, forked, rem2, score + sc, step + 1))
    if not carry_text:
        del out["text"]
    return pd.DataFrame(out)


def _episode_batches(
    policy: str, max_steps: int, carry_text: bool, dedup_assignments: bool = False
):
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = list(zip(pdf["url"], pdf["rel"], pdf["text"], pdf["lang"]))
            yield _episode_frame(rows, policy, max_steps, carry_text, dedup_assignments)

    return run


def _anchors_by_lang() -> dict[str, list[tuple[str, str, str | None]]]:
    """lang -> [(rel, primary_anchor, alt_anchor)] — the SAME rows as
    ``detect.relation_anchors`` (schema-derived, deterministic), keyed for
    the in-python gate of ``episodes_from_skeleton``."""
    by_lang: dict[str, list[tuple[str, str, str | None]]] = {}
    for rel, _, _ in S.RELATIONS:
        en = S.EN_TEMPLATES[rel]
        by_lang.setdefault("en", []).append(
            (rel, en[0][0], en[1][0] if len(en) > 1 else None)
        )
        zh = S.ZH_TEMPLATES[rel]
        by_lang.setdefault("zh", []).append((rel, zh[0][0], None))
    for etype, ev in S.EVENTS.items():
        by_lang.setdefault(ev["lang"], []).append((etype, ev["anchor"], None))
    return by_lang


def _skeleton_episode_batches(policy: str, max_steps: int, dedup_assignments: bool):
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from .. import corpus as C
        from .text_extract import extract_text

        anchors = _anchors_by_lang()
        for pdf in batches:
            rows: list[tuple] = []
            for d, lg in zip(pdf["doc_id"].astype("int64"), pdf["lang"]):
                lang = S.doc_lang(lg)
                text = extract_text(C.build_html(int(d), lang).encode("utf-8"))
                url = S.page_url(int(d))
                # the E1 gate, in python: keep (url, rel) iff the primary
                # anchor (logit 2.5, sigmoid .924) or the alt anchor
                # (logit 1.5, sigmoid .817) occurs in the text; misses score
                # sigmoid(-3.0)=.047 < .6 — so keep ⟺ anchor-substring hit,
                # exactly detect.detect_relations' rc_score > 0.6 set
                # (python ``in`` ≡ instr(text, anchor) > 0 for exact
                # substring match; asserted fused ≡ staged in tests)
                for rel, primary, alt in anchors.get(lang, ()):
                    if primary in text or (alt is not None and alt in text):
                        rows.append((url, rel, text, lang))
            yield _episode_frame(
                rows, policy, max_steps, carry_text=False,
                dedup_assignments=dedup_assignments,
            )

    return run


def episodes_from_skeleton(
    skel: DataFrame,
    policy: str = "rl",
    max_steps: int = MAX_STEPS,
    dedup_assignments: bool = True,
) -> DataFrame:
    """Stages A-C in ONE python hop: generation → frozen extract_text →
    E1 anchor gate → fused episode waves, all inside a single
    ``mapInPandas`` over the (doc_id, lang) skeleton.

    The two-hop layout (corpus.web_pages python pass → JVM detect gate →
    fused_slot_fill python pass) crosses the JVM↔python boundary twice per
    task and re-serializes the corpus text through Arrow in between. Every
    decision in between (the anchor gate) is a per-row pure function, so the
    whole chain is row-local — one python stage, the text NEVER crosses
    Arrow (only the completed typed states do), and per-task protocol
    latency is paid once instead of twice (guide §4: measured 480 ms median
    task wall vs 8 ms CPU at sf0.1 — the boundary dominated).

    Output is byte-identical to
    ``fused_slot_fill(detect_relations(web_pages(...)), carry_text=False)``:
    the gate replicates the anchor-presence predicate and the episode
    interior is the shared ``_episode_frame``. Cross-checked in
    tests/test_slot_fill.py."""
    return skel.mapInPandas(
        _skeleton_episode_batches(policy, max_steps, dedup_assignments),
        schema=_episode_schema(carry_text=False),
    )


def fused_slot_fill(
    detected: DataFrame,
    policy: str = "rl",
    max_steps: int = MAX_STEPS,
    carry_text: bool = True,
    dedup_assignments: bool = False,
) -> DataFrame:
    """Run every episode to completion in a single ``mapInPandas`` pass.

    Returns completed typed states (``remaining = []`` unless ``max_steps``
    truncated the episode). ``carry_text=False`` drops the text column from
    the output — downstream triple/event materialization never reads it, and
    not re-serializing the corpus text through Arrow is a material win.

    ``dedup_assignments=True`` drops states that repeat an earlier state's
    (assigned, remaining) within the same episode tree, keeping the first
    (highest-wave-priority) representative. Because ``detect_relations``
    emits at most one row per (url, rel) and an episode tree never leaves
    its row, this makes (url, rel, assigned) globally unique — consumers
    with SET semantics over those columns (``to_triples``) can then skip
    their shuffle-based ``distinct()`` entirely (pass
    ``assume_unique=True``). Leave False for consumers that weight states
    by multiplicity or score (RL transition collection keeps every path).
    """
    return detected.mapInPandas(
        _episode_batches(policy, max_steps, carry_text, dedup_assignments),
        schema=_episode_schema(carry_text),
    )


# -------------------------------------------------------------- rounds path

def _step_batches(policy: str):
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            chosen, reward, mentions, probs, scores = [], [], [], [], []
            for text, rel, lang, assigned_in, remaining in zip(
                pdf["text"], pdf["rel"], pdf["lang"], pdf["assigned"], pdf["remaining"]
            ):
                if len(remaining) == 0:  # already complete: pass through
                    chosen.append("")
                    reward.append(0.0)
                    mentions.append([""])
                    probs.append([0.0])
                    scores.append([0.0])
                    continue
                # Arrow MapType arrives as dict (or list of kv tuples on
                # older conversions) — no JSON round-trip (round-1 wart)
                assigned = assigned_in if isinstance(assigned_in, dict) else dict(assigned_in)
                slot, cands, rw = scorers.step_state(
                    text, rel, lang, assigned, list(remaining), policy
                )
                chosen.append(slot)
                reward.append(rw)
                mentions.append([c[0] for c in cands])
                probs.append([c[1] for c in cands])
                scores.append([c[2] for c in cands])
            out = pdf.copy()
            out["chosen"] = chosen
            out["reward"] = reward
            out["mentions"] = mentions
            out["probs"] = probs
            out["scores"] = scores
            yield out

    return run


def fork_step(live: DataFrame, policy: str = "rl") -> DataFrame:
    """One loop iteration: score → choose → extract → fork. Shuffle-free."""
    stepped = live.mapInPandas(_step_batches(policy), schema=_STEP_SCHEMA)
    cand = F.explode(
        F.arrays_zip(F.col("mentions"), F.col("probs"), F.col("scores"))
    ).alias("cand")
    done = F.col("chosen") == ""
    assigned_map = F.col("assigned")
    return (
        stepped.select("*", cand)
        .select(
            "url",
            "rel",
            "text",
            "lang",
            F.when(done, assigned_map)
            .otherwise(
                F.map_concat(
                    assigned_map,
                    F.create_map(F.col("chosen"), F.col("cand.mentions")),
                )
            )
            .alias("assigned"),
            F.when(done, F.col("remaining"))
            .otherwise(F.array_remove("remaining", F.col("chosen")))
            .alias("remaining"),
            (F.col("score") + F.col("cand.scores")).alias("score"),
            F.when(done, F.col("step")).otherwise(F.col("step") + 1).alias("step"),
        )
    )


def _run_fixed(
    detected: DataFrame, k: int, policy: str, checkpoint: bool, max_steps: int
) -> DataFrame:
    """Exactly-k fork rounds (uniform-arity episodes complete at depth k).

    A DISK_ONLY materialization barrier separates consecutive Arrow stages
    (chained python stages in one task pipeline poorly — per-batch socket
    hops multiply); the LAST round chains straight into the consumer, which
    reads it once.
    """
    states = initial_states(detected)
    rounds = min(k, max_steps)
    for i in range(rounds):
        states = fork_step(states, policy)
        if checkpoint and i < rounds - 1:
            states = states.localCheckpoint(
                eager=True, storageLevel=StorageLevel.DISK_ONLY
            )
    return states


def rounds_slot_fill(
    detected: DataFrame,
    policy: str = "rl",
    max_steps: int = MAX_STEPS,
    checkpoint: bool = True,
    n_slots: int | None = None,
) -> DataFrame:
    """Driver-orchestrated round loop; returns completed states.

    ``n_slots``: every episode completes at exactly its schema arity (states
    whose slots are exhausted pass through later rounds unchanged), so a
    fixed ``max-arity`` round count needs NO per-iteration isEmpty action.
    Defaults to arity-grouped fixed rounds (relations run 2, 3-role events
    run 3, results union); pass 0 to force the general fixpoint loop with
    per-round termination checks (unbounded/unknown schemas).
    """
    if n_slots is None:
        # Group episodes by schema arity so a mixed corpus never pays
        # max-arity passes for low-arity states: relations run 2 rounds,
        # 3-role events run 3, results union. Each group's round count is
        # static -> zero per-iteration driver actions.
        groups: dict[int, list[str]] = {}
        for rel, _, _ in S.RELATIONS:
            groups.setdefault(2, []).append(rel)
        for etype, ev in S.EVENTS.items():
            groups.setdefault(len(ev["roles"]), []).append(etype)
        if len(groups) > 1 and checkpoint:
            # materialize the gate output ONCE: each arity group re-reads the
            # checkpoint instead of re-running the (expensive) generation →
            # text-extraction → detection upstream per group (the round-1
            # scale bug flagged in VERDICT.md).
            detected = detected.localCheckpoint(
                eager=True, storageLevel=StorageLevel.DISK_ONLY
            )
        out: DataFrame | None = None
        for k, rels in sorted(groups.items()):
            subset = detected.filter(F.col("rel").isin(rels))
            done = _run_fixed(subset, k, policy, checkpoint, max_steps)
            out = done if out is None else out.unionByName(done)
        assert out is not None
        return out
    if n_slots > 0:
        return _run_fixed(detected, n_slots, policy, checkpoint, max_steps)
    states = initial_states(detected)
    completed: DataFrame | None = None
    for _ in range(max_steps):
        live = states.filter(F.size("remaining") > 0)
        done = states.filter(F.size("remaining") == 0)
        completed = done if completed is None else completed.unionByName(done)
        if live.isEmpty():
            break
        states = fork_step(live, policy)
        if checkpoint:
            # DISK_ONLY: repeated/loop checkpoints must not accumulate on the
            # heap — at scale the state table exceeds executor memory and
            # MEMORY_AND_DISK eviction thrashes GC
            states = states.localCheckpoint(
                eager=True, storageLevel=StorageLevel.DISK_ONLY
            )
    assert completed is not None
    return completed


def ordered_slot_fill(
    detected: DataFrame,
    policy: str = "rl",
    max_steps: int = MAX_STEPS,
    checkpoint: bool = True,
    n_slots: int | None = None,
    mode: str = "fused",
    carry_text: bool = True,
    dedup_assignments: bool = False,
) -> DataFrame:
    """Run episodes to completion; returns completed states (remaining = []).

    ``mode='fused'`` (default) runs the whole bounded episode inside one
    Arrow pass (see module docstring); ``mode='rounds'`` is the per-round
    DataFrame loop. Identical output by construction — cross-checked in
    tests — because both call the same pure ``scorers.step_state``.
    ``dedup_assignments`` (fused only): see ``fused_slot_fill``.
    """
    if mode == "fused" and n_slots is None:
        return fused_slot_fill(
            detected, policy, max_steps, carry_text, dedup_assignments
        )
    if dedup_assignments:
        raise ValueError("dedup_assignments requires mode='fused'")
    return rounds_slot_fill(detected, policy, max_steps, checkpoint, n_slots)
