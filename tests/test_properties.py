"""Property-based tests (hypothesis) for the pure scorer/permutation math —
the partition-order-independence guarantees the distributed plan relies on."""

import math

from hypothesis import given, settings
from hypothesis import strategies as st

from autoextraction_spark import scorers
from autoextraction_spark.operators import nested

mentions = st.text(alphabet="abcdef", min_size=1, max_size=6)
entities = st.lists(
    st.tuples(mentions, st.floats(min_value=-10, max_value=10)),
    min_size=1,
    max_size=20,
)


@settings(max_examples=200, deadline=None)
@given(entities)
def test_score2prob_invariants(ents):
    out = scorers.score2prob(ents)
    # probs sum to 1 (softmax partition), every mention appears once
    assert abs(sum(p for _, p, _ in out) - 1.0) < 1e-9
    assert len({m for m, _, _ in out}) == len(out)
    # score is the max raw logit per mention (Environment.py:90-99)
    for m, _, s in out:
        assert s == max(v for mm, v in ents if mm == m)
    # deterministic order: (-score, mention)
    assert out == sorted(out, key=lambda e: (-e[2], e[0]))


@settings(max_examples=200, deadline=None)
@given(entities)
def test_score2prob_is_input_order_independent(ents):
    # Engine determinism note: candidate order IS fixed per row (regex
    # finditer order over the text, same as the reference), so bitwise
    # reproducibility holds in the pipeline. Across arbitrary reorderings
    # float accumulation differs only in the last ulp — assert that bound.
    a = scorers.score2prob(ents)
    b = scorers.score2prob(list(reversed(ents)))
    assert [(m, s) for m, _, s in a] == [(m, s) for m, _, s in b]
    for (_, pa, _), (_, pb, _) in zip(a, b):
        assert abs(pa - pb) < 1e-12


@settings(max_examples=50, deadline=None)
@given(
    st.text(alphabet="abcdefgh ", min_size=1, max_size=40),
    st.sampled_from(["works_for", "based_in", "born_in", "founded", "acquired"]),
    st.lists(st.sampled_from(["subject", "object"]), min_size=1, max_size=2, unique=True),
)
def test_choose_slot_deterministic_across_calls(text, rel, remaining):
    for policy in ("rl", "sequence", "reverse", "random"):
        a = scorers.choose_slot(text, rel, "en", {}, remaining, policy)
        b = scorers.choose_slot(text, rel, "en", {}, remaining, policy)
        assert a == b and a in remaining


@settings(max_examples=30, deadline=None)
@given(st.integers(min_value=5, max_value=8))
def test_sampled_perms_are_valid_and_deterministic(k):
    rows = nested.perm_dimension([k])
    orders = [o for _, _, o in rows]
    assert len(orders) == nested.N_SAMPLED_PERMS
    for o in orders:
        assert sorted(o) == list(range(k))
    assert orders == [o for _, _, o in nested.perm_dimension([k])]
    # full expansion below the sampling threshold
    assert len(nested.perm_dimension([4])) == math.factorial(4)


def _random_doc_text(draw):
    """A doc with 1-3 works_for facts, each primary- or alt-phrased."""
    from autoextraction_spark import schema as S

    n = draw(st.integers(1, 3))
    sents = []
    for k in range(n):
        p = S.PEOPLE[draw(st.integers(0, 47))]
        o = S.ORGS[draw(st.integers(0, 47))]
        conn = " works for " if draw(st.booleans()) else " is at "
        sents.append(f"{p}{conn}{o}.")
    return " ".join(sents)


@given(st.data())
@settings(max_examples=60, deadline=None)
def test_episode_transitions_invariants(data):
    """Pure-function invariants of E13 rollouts on random fact mixes:
    exactly one opening transition; its fork count equals the number of
    depth-1 transitions; done marks exactly the final depth; every feature
    vector has FEATURE_DIM entries; rollouts are deterministic."""
    from autoextraction_spark.operators.rl_train import _episode_transitions

    text = _random_doc_text(data.draw)
    eps = data.draw(st.sampled_from([0.0, 0.5]))
    args = ("u0", "works_for", text, "en", [0.0] * scorers.FEATURE_DIM,
            eps, 7, None, "step", 20)
    rows = _episode_transitions(*args)
    assert rows == _episode_transitions(*args)  # deterministic
    step0 = [r for r in rows if r[3] == 0]
    step1 = [r for r in rows if r[3] == 1]
    assert len(step0) == 1 and len(rows) == len(step0) + len(step1)
    (_u, _rel, _lang, _s, given, action, reward, done, n_next, feats,
     next_feats) = step0[0]
    assert given == "" and not done and n_next == len(next_feats) == len(step1)
    assert len(feats) == scorers.FEATURE_DIM
    assert reward > 0
    for r in step1:
        assert r[7] is True  # done
        assert len(r[9]) == scorers.FEATURE_DIM
        assert all(len(v) == scorers.FEATURE_DIM for ns in r[10] for v in ns)
