"""E13/E14 — distributed DQN training for the slot-ordering policy.

Reference semantics (SURVEY.md §2.3, the last two operators):

- E13 experience collection: ``DQN.py:125-160`` — ε-greedy episode rollouts
  over the corpus; every processed (state, action) stores a transition
  ``(state, action, reward, next_state_list, done)`` into a replay memory
  (``RL_utils/dqn.py:126-127``).
- E14 DQN optimizer: ``RL_utils/dqn.py:95-164`` — prioritized minibatch
  sampling (``RL_utils/replay_buffer.py`` SumTree, importance ratio
  :90-93), TD target ``r + γ · mean_next(max_choice Q_target) · (1-done)``
  (``dqn.py:151-152``; ``chunk_sum`` is a per-transition MEAN over its next
  states, each next state scored as the MAX over its remaining choices,
  empty choices → 0, ``dqn.py:71-73,129-137``), unweighted MSE loss +
  SGD step (``dqn.py:154-160`` — the reference computes importance ratios
  but does not fold them into the loss; we reproduce that exactly), target
  network synced every ``target_update`` episodes (``DQN.py:152-153``),
  ε decayed ×0.95 per ``explore_update`` steps (``dqn.py:143``).

Spark-first reframing (NOT a port — no SumTree, no parameter server):

- **The replay buffer IS a DataFrame.** Experience generation is the
  data-parallel part: ONE Arrow-vectorized ``mapInPandas`` pass over the
  detection gate runs every episode to completion (same breadth-first fork
  machinery as the inference path) and emits a typed transitions table with
  the state-action feature vector AND every (next-state, choice) feature
  vector precomputed — so training never touches text again.
- **Q is linear over hashed state-action features** (``scorers.featurize``
  — the sandbox has no GPU; the feature map is the documented swap seam
  for a neural encoder, exactly like ``scorers.batch_step``).
- **One training iteration = broadcast weights → distributed TD pass →
  tiny-minibatch SGD step.** Weights enter the plan as literal arrays
  (D ≈ 20 doubles — cheaper than a broadcast var), the TD target/error for
  EVERY buffered transition is pure-codegen array math (``zip_with`` dot
  products, ``array_max``, ``aggregate`` — no Python in the scoring pass),
  and the γ-discounted target uses the PREVIOUS broadcast's weights: the
  target network of fitted-Q iteration is "the weights from the last sync",
  which is precisely what a periodically-synced target net is.
- **Prioritized replay = exponential-race weighted sampling.** Sampling
  ∝ priority without replacement at any scale: key_i = -ln(u_i)/w_i with a
  deterministic per-(row, iteration) hash u_i, take the B smallest
  (sort-limit — no tree state, no driver structure). Priorities are
  recomputed for ALL rows each iteration from the current weights — a
  strictly fresher prioritization than the SumTree's update-only-sampled
  scheme, noted as the one intentional upgrade.
- The B-row minibatch (B = 32, the reference batch size) is collected to
  the driver for the gradient step — that is model fitting on a minibatch
  (the reference moves the same rows to the GPU), not a data collect; the
  full-buffer TD scan stays distributed.

At 100 TB: generation is one narrow map over the gated corpus (text crosses
Arrow once, transitions are small numeric rows); the buffer persists
DISK_ONLY; each training iteration is one sort-limit job over cached
numerics. A 10^12-document corpus trains on a sampled buffer — pass
``buffer_fraction`` to ``fitted_q_train``.
"""

from __future__ import annotations

import hashlib
import json
import math
import os
import time
import zlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.column import Column
from pyspark.storagelevel import StorageLevel

from .. import scorers
from .. import schema as S
from .slot_fill import initial_remaining

TRANSITION_SCHEMA = (
    "url string, rel string, lang string, step int, given string, "
    "action string, reward double, done boolean, n_next int, "
    "feats array<double>, next_feats array<array<array<double>>>"
)

GAMMA = 0.5           # DQN.py:122
BATCH_SZ = 32         # DQN.py:122 batch_sz
TARGET_UPDATE = 20    # DQN.py:36 target_update
PRIORITY_EPS = 1e-3   # keeps the race key finite for zero-TD rows

# Fixed probe weights for the ORACLED fitted-Q iteration-1 check
# (`__spark_entry__.q_dqn_train` / `oracle.dqn_td_sql`): with weights fixed,
# one TD pass (`td_columns`) is a closed-form expression over the transition
# table — q_pred = w·φ(s,a), target = r + γ·mean_next(max_choice w_t·φ)·(1-done)
# (ref RL_utils/dqn.py:126-152) — which a DuckDB oracle recomputes exactly.
# Precision contract: PROBE_W entries are multiples of 1/16 and
# PROBE_W_TARGET entries multiples of 1/8; featurize components are multiples
# of 1/4, so every dot product and the γ=1/2-discounted target is an exact
# multiple of 1/64 — exactly 6 decimal digits, no cross-engine rounding
# ambiguity at round(…, 6).
PROBE_W = [0.25, 0.5, -0.25, 0.125, 0.75, -0.5, 0.1875, -0.125, 0.3125,
           -0.25, 0.0625, -0.0625, 0.125, -0.1875, 0.25, -0.3125, 0.375,
           -0.4375]
PROBE_W_TARGET = [0.5, -0.25, 0.125, 0.375, -0.625, 0.25, -0.125, 0.5,
                  -0.375, 0.125, 0.25, -0.25, 0.375, -0.125, 0.625, -0.5,
                  0.125, -0.375]
# Fixed deployment weights for the ORACLED learned-policy check
# (`q_rl_learned_policy` / `oracle.learned_policy_sql`): the opening-action
# margin is q(slot1) − q(slot0) = −0.25 + 2·alt + Δonehot with |Δonehot| ≤
# 0.125, so the policy goes object-first exactly when the page contains ≥1
# alt-rendered fact of the relation (alt ≥ 0.25) — the paper's
# order-sensitivity signal (data_filter.py:174-207) — and no state ties.
PROBE_POLICY_W = [0.0, 0.25, 0.0, 0.0, 0.5, 0.0, 0.0, 0.0, 0.0, 2.0,
                  0.03125, -0.03125, 0.046875, -0.046875, 0.015625,
                  -0.015625, 0.0625, -0.0625]


def _hash_u(*parts: object) -> float:
    """Deterministic uniform in [0, 1) from a crc32 of the parts (python's
    ``hash()`` is salted per worker — same reason as scorers.choose_slot)."""
    key = "\x1f".join(str(p) for p in parts).encode("utf-8")
    return zlib.crc32(key) / 2**32


def _egreedy(
    text: str,
    rel: str,
    lang: str,
    assigned: dict[str, str],
    remaining: list[str],
    weights: list[float],
    epsilon: float,
    seed: int,
    url: str,
    step: int,
    policy: str | None = None,
) -> str:
    """ε-greedy action over the Q function — ``dqn.py:43-48`` with the
    random draws made reproducible (hash of the full state identity + seed).
    Exploitation uses the linear Q over ``weights`` by default; passing a
    ``policy`` string instead routes through ``scorers.choose_slot`` so
    rollouts can run under ANY deployable policy (``learned:``/``mlp:`` —
    the non-linear swap seam trains on-policy through the same door it
    deploys through)."""
    if epsilon > 0.0 and _hash_u("explore", seed, url, rel, step, *sorted(assigned.items())) < epsilon:
        pick = _hash_u("pick", seed, url, rel, step, *sorted(assigned.items()))
        return remaining[int(pick * len(remaining)) % len(remaining)]
    if policy is not None:
        return scorers.choose_slot(text, rel, lang, assigned, remaining, policy)
    best_i, best_q = 0, float("-inf")
    for i, slot in enumerate(remaining):
        q = scorers.linear_q(weights, text, rel, lang, assigned, slot)
        if q > best_q:  # first-max tie-break, like torch.argmax
            best_i, best_q = i, q
    return remaining[best_i]


def _episode_transitions(
    url: str,
    rel: str,
    text: str,
    lang: str,
    weights: list[float],
    epsilon: float,
    seed: int,
    gold: list[dict[str, str]] | None,
    reward_mode: str,
    max_steps: int,
    policy: str | None = None,
) -> list[tuple]:
    """Run ONE ε-greedy episode (all forks) and return its transition rows.

    Mirrors the DQN.py:130-147 loop: every live state at every depth yields
    exactly one stored transition; candidate mentions fork the state
    (Environment.py:186-224)."""
    out: list[tuple] = []
    wave: list[tuple[dict, list[str], int]] = [({}, initial_remaining(rel, lang), 0)]
    while wave:
        nxt: list[tuple[dict, list[str], int]] = []
        for assigned, remaining, step in wave:
            if not remaining or step >= max_steps:
                continue
            action = _egreedy(
                text, rel, lang, assigned, remaining, weights, epsilon, seed,
                url, step, policy,
            )
            cands = scorers.extract_candidates(text, rel, lang, assigned, action)
            if reward_mode == "lookahead" and gold is not None:
                reward, _ = scorers.choice_reward(
                    text, rel, lang, assigned, remaining, action, gold
                )
            else:  # 'step': mean per-mention max logit, Environment.py:197
                reward = sum(c[2] for c in cands) / len(cands)
            rem2 = [r for r in remaining if r != action]
            done = not rem2
            feats = scorers.featurize(text, rel, lang, assigned, action)
            next_feats: list[list[list[float]]] = []
            for mention, _p, _mx in cands:
                forked = dict(assigned)
                forked[action] = mention
                next_feats.append(
                    [
                        scorers.featurize(text, rel, lang, forked, c)
                        for c in rem2
                    ]
                )
                nxt.append((forked, rem2, step + 1))
            # ``given`` identifies the state within (url, rel, step): the
            # value assigned by the previous action ('' for the root)
            given = "" if not assigned else assigned[next(iter(assigned))] if len(assigned) == 1 else json.dumps(
                dict(sorted(assigned.items())), ensure_ascii=False, sort_keys=True
            )
            out.append(
                (url, rel, lang, step, given, action, float(reward), done,
                 len(cands), feats, next_feats)
            )
        wave = nxt
    return out


def generate_transitions(
    detected: DataFrame,
    weights: list[float] | None = None,
    epsilon: float = 0.0,
    seed: int = 0,
    gold: DataFrame | None = None,
    reward_mode: str = "step",
    max_steps: int = 20,
    policy: str | None = None,
) -> DataFrame:
    """E13: one Arrow pass (detection gate → transitions table).

    ``detected``: (url, rel, text, lang, ...) from ``detect_relations``.
    ``gold``: optional (url, rel, slots map<string,string>) tuples for the
    two-step-lookahead shaped reward (``reward_mode='lookahead'``, E7);
    joined once before the pass — gold rows are tiny next to text.
    ``policy``: optional deployable policy string for the exploitation
    branch (``learned:``/``mlp:``) — overrides the linear ``weights``.
    """
    w = list(weights) if weights is not None else [0.0] * scorers.FEATURE_DIM
    cols = ["url", "rel", "text", "lang"]
    if gold is not None and reward_mode == "lookahead":
        gold_sets = gold.groupBy("url", "rel").agg(
            F.collect_list("slots").alias("gold_slots")
        )
        detected = detected.select(*cols).join(gold_sets, ["url", "rel"], "left")
        cols = cols + ["gold_slots"]
    else:
        detected = detected.select(*cols)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: list[tuple] = []
            has_gold = "gold_slots" in pdf.columns
            for tup in pdf.itertuples(index=False):
                g = None
                if has_gold and tup.gold_slots is not None:
                    g = [dict(m) for m in tup.gold_slots]
                rows.extend(
                    _episode_transitions(
                        tup.url, tup.rel, tup.text, tup.lang, w, epsilon,
                        seed, g, reward_mode, max_steps, policy
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=["url", "rel", "lang", "step", "given", "action",
                         "reward", "done", "n_next", "feats", "next_feats"],
            )

    return detected.mapInPandas(run, schema=TRANSITION_SCHEMA)


# ------------------------------------------------------------------ training

def _lit_array(values: list[float]) -> Column:
    return F.array(*[F.lit(float(v)) for v in values])


def _dot(col: Column, w: list[float]) -> Column:
    return F.aggregate(
        F.zip_with(col, _lit_array(w), lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def td_columns(
    transitions: DataFrame, weights: list[float], target_weights: list[float], gamma: float = GAMMA
) -> DataFrame:
    """Distributed TD pass — pure codegen, no Python.

    q_pred   = w · φ(s, a)
    next_q   = mean over next states of max over choices of w_target · φ
               (empty-choice next state → 0, ``dqn.py:71-73``; the mean is
               ``chunk_sum``, ``dqn.py:129-137,152``)
    target   = r + γ · next_q · (1 - done)
    """
    per_next = F.transform(
        F.col("next_feats"),
        lambda choices: F.coalesce(
            F.array_max(F.transform(choices, lambda v: _dot(v, target_weights))),
            F.lit(0.0),
        ),
    )
    next_q = F.when(F.size("next_feats") == 0, F.lit(0.0)).otherwise(
        F.aggregate(per_next, F.lit(0.0), lambda acc, x: acc + x)
        / F.size("next_feats")
    )
    target = F.col("reward") + F.lit(gamma) * next_q * F.when(
        F.col("done"), F.lit(0.0)
    ).otherwise(F.lit(1.0))
    q_pred = _dot(F.col("feats"), weights)
    return transitions.withColumn("q_pred", q_pred).withColumn("td_target", target)


def train_dqn(
    transitions: DataFrame,
    n_iters: int = 50,
    lr: float = 0.05,
    gamma: float = GAMMA,
    batch_size: int = BATCH_SZ,
    target_update: int = TARGET_UPDATE,
    seed: int = 0,
    init_weights: list[float] | None = None,
) -> tuple[list[float], list[dict]]:
    """E14: fitted-Q iterations over the buffered transitions.

    Per iteration: ONE distributed job — TD errors for every buffered row
    against the broadcast (current, target) weights, prioritized minibatch
    selection via the exponential race (key = -ln(u)/|td|, deterministic u
    per (row, iteration)), sort-limit B — then an SGD step on the driver
    (unweighted MSE, ``dqn.py:154-160``). Target weights sync every
    ``target_update`` iterations (``DQN.py:152-153``).

    Returns (weights, history) where history has one row per iteration:
    {iter, loss, mean_abs_td, batch}.
    """
    D = scorers.FEATURE_DIM
    w = list(init_weights) if init_weights is not None else [0.0] * D
    w_target = list(w)
    buf = transitions.select("url", "rel", "step", "given", "action",
                             "reward", "done", "feats", "next_feats")
    buf = buf.persist(StorageLevel.DISK_ONLY)
    history: list[dict] = []
    for it in range(n_iters):
        scored = td_columns(buf, w, w_target, gamma)
        td_err = F.col("q_pred") - F.col("td_target")
        priority = F.abs(td_err) + F.lit(PRIORITY_EPS)
        # deterministic uniform per (row identity, iteration)
        u = (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat_ws(
                            "\x1f",
                            F.lit(str(seed)), F.lit(str(it)),
                            "url", "rel", F.col("step").cast("string"),
                            "given", "action",
                        )
                    ),
                    1, 13,
                ),
                16, 10,
            ).cast("double")
            / F.lit(float(16**13))
        )
        race = -F.log(u + F.lit(1e-12)) / priority
        batch = (
            scored.select(
                race.alias("race"), td_err.alias("err"), "feats",
            )
            .orderBy("race")
            .limit(batch_size)
            .collect()
        )
        if not batch:
            break
        n = len(batch)
        grad = [0.0] * D
        loss = 0.0
        abs_td = 0.0
        for row in batch:
            e = float(row["err"])
            loss += e * e
            abs_td += abs(e)
            for j, fj in enumerate(row["feats"]):
                grad[j] += 2.0 * e * fj
        loss /= n
        abs_td /= n
        w = [wj - lr * gj / n for wj, gj in zip(w, grad)]
        history.append(
            {"iter": it, "loss": loss, "mean_abs_td": abs_td, "batch": n}
        )
        if (it + 1) % target_update == 0:
            w_target = list(w)
    buf.unpersist()
    return w, history


def fitted_q_train(
    detected: DataFrame,
    n_generations: int = 3,
    iters_per_gen: int = 20,
    epsilon0: float = 0.9,
    epsilon_decay: float = 0.95,
    gold: DataFrame | None = None,
    reward_mode: str = "step",
    buffer_fraction: float | None = None,
    seed: int = 0,
    workdir: str | None = None,
    resume: bool = True,
    **train_kw,
) -> tuple[list[float], list[dict]]:
    """Outer loop: regenerate experience under the improved policy with
    decayed ε (the on-policy dimension of DQN.py:125-160; ε ×
    ``epsilon_decay`` per generation ≡ ``explore_update``, dqn.py:143),
    then run ``iters_per_gen`` fitted-Q iterations. ``buffer_fraction``
    samples the gated corpus before rollout — the 10^12-document knob.

    ``workdir`` makes training RESUMABLE with the same manifest scheme as
    the extraction pipeline (pipeline.KgPipeline; the reference checkpoints
    weights every ``iters_save`` episodes, DQN.py:155-156): per generation,
    the rollout's transitions land as a parquet checkpoint with per-partition
    lineage, and the trained weights + loss history land in a manifest whose
    config FINGERPRINT chains through all prior generations — a killed job
    re-runs only unfinished generations, and any config change (seed, ε
    schedule, reward mode, optimizer knobs) invalidates everything
    downstream instead of silently resuming stale state."""
    w: list[float] | None = None
    history: list[dict] = []
    eps = epsilon0
    if buffer_fraction is not None:
        detected = detected.sample(fraction=buffer_fraction, seed=seed)
    if workdir:
        os.makedirs(workdir, exist_ok=True)
    fp = ""
    for g in range(n_generations):
        cfg = (
            f"{g}|{seed}|{eps:.6f}|{iters_per_gen}|{reward_mode}|"
            f"{buffer_fraction}|{sorted(train_kw.items())}|{fp}"
        )
        fp = hashlib.md5(cfg.encode()).hexdigest()
        manifest_path = (
            os.path.join(workdir, f"rl_gen_{g}.json") if workdir else None
        )
        if manifest_path and resume and os.path.exists(manifest_path):
            with open(manifest_path) as f:
                m = json.load(f)
            if m.get("fingerprint") == fp:
                w = m["weights"]
                history.extend(m["history"])
                eps *= epsilon_decay
                continue
        t0 = time.time()
        trans = generate_transitions(
            detected, w, epsilon=eps, seed=seed + g, gold=gold,
            reward_mode=reward_mode,
        )
        if workdir:
            tdir = os.path.join(workdir, f"stage=rl_transitions/gen={g}")
            success = os.path.join(tdir, "_SUCCESS")
            fp_marker = os.path.join(tdir, f"_FP_{fp}")
            if not (resume and os.path.exists(success) and os.path.exists(fp_marker)):
                (
                    trans.withColumn("_stage", F.lit(f"rl_transitions_g{g}"))
                    .withColumn("_part_id", F.spark_partition_id())
                    .write.mode("overwrite")
                    .parquet(tdir)
                )
                open(fp_marker, "w").close()
            trans = detected.sparkSession.read.parquet(tdir)
        w, h = train_dqn(trans, n_iters=iters_per_gen, seed=seed + g,
                         init_weights=w, **train_kw)
        for row in h:
            row["generation"] = g
            row["epsilon"] = eps
        history.extend(h)
        if manifest_path:
            with open(manifest_path, "w") as f:
                json.dump(
                    {
                        "generation": g,
                        "fingerprint": fp,
                        "epsilon": eps,
                        "weights": w,
                        "history": h,
                        "wall_sec": round(time.time() - t0, 2),
                    },
                    f,
                )
        eps *= epsilon_decay
    assert w is not None
    return w, history


def learned_policy(weights: list[float]) -> str:
    """Policy string for ``ordered_slot_fill``/``scorers.choose_slot`` that
    ranks slots by the trained linear Q — deployment is the SAME fused
    inference pass, just a different policy argument."""
    return "learned:" + json.dumps([float(x) for x in weights])


def first_actions(detected: DataFrame, weights: list[float]) -> DataFrame:
    """Per (rel, action): how often the trained policy opens the episode
    with each slot — the order-preference summary used for evaluation."""
    policy = learned_policy(weights)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            acts = [
                scorers.choose_slot(
                    text, rel, lang, {}, initial_remaining(rel, lang), policy
                )
                for text, rel, lang in zip(pdf["text"], pdf["rel"], pdf["lang"])
            ]
            out = pdf[["rel"]].copy()
            out["action"] = acts
            yield out

    return (
        detected.select("url", "rel", "text", "lang")
        .mapInPandas(run, schema="rel string, action string")
        .groupBy("rel", "action")
        .agg(F.count("*").alias("n"))
    )
