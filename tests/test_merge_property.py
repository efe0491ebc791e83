"""Property-based merge correctness: random I/U/D changelogs applied via
apply_changelog must equal a direct dictionary simulation of per-PK
last-writer-wins semantics.

The reference ships NO tests for its merge templates (SURVEY §5) — this is
the coverage its warehouses were silently trusted with: same-batch
insert+delete, delete-then-reinsert, updates to absent keys, multiple
events per key, ties broken by flag (D < I < U at equal commit_ts)."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from tidb2dw_spark.operators.merge import apply_changelog

KEYS = list(range(8))

event = st.tuples(
    st.sampled_from(["I", "U", "D"]),
    st.sampled_from(KEYS),           # key
    st.integers(0, 30),              # commit_ts (collisions allowed)
    st.integers(0, 99),              # payload value
)


def model_apply(initial: dict[int, int], events) -> dict[int, int]:
    """Reference semantics: per key, the (ts, flag)-max event wins outright
    ('U' > 'I' > 'D' lexicographically = the engine's tie-break); D removes,
    I/U set the full row image regardless of prior presence."""
    final: dict[int, tuple] = {}
    for flag, key, ts, val in events:
        if key not in final or (ts, flag, val) > final[key]:
            final[key] = (ts, flag, val)
    out = dict(initial)
    for key, (ts, flag, val) in final.items():
        if flag == "D":
            out.pop(key, None)
        else:
            out[key] = val
    return out


@settings(max_examples=12, deadline=None)
@given(
    events=st.lists(event, min_size=0, max_size=40),
    present=st.sets(st.sampled_from(KEYS)),
)
def test_apply_changelog_matches_model(spark, events, present):
    # drop (key, ts, flag) duplicates with conflicting payloads — the engine
    # (like every reference dialect) is free to pick either; the model can't
    seen, uniq = set(), []
    for e in events:
        if (e[0], e[1], e[2]) not in seen:
            seen.add((e[0], e[1], e[2]))
            uniq.append(e)

    initial = {k: -k for k in sorted(present)}
    target = spark.createDataFrame(
        [(k, v) for k, v in initial.items()] or [(None, None)],
        "k long, val long",
    ).filter("k IS NOT NULL")
    batch = spark.createDataFrame(
        [(f, "t", "s", ts, k, v) for f, k, ts, v in uniq]
        or [("D", "t", "s", 0, None, None)],
        "flag string, tablename string, schemaname string, commit_ts long, k long, val long",
    ).filter("k IS NOT NULL")

    got = {r["k"]: r["val"] for r in apply_changelog(target, batch, ["k"]).collect()}
    expect = model_apply(initial, uniq)
    assert got == expect


# conftest's spark fixture is session-scoped; hypothesis re-runs the test
# body many times with the same fixture, which is exactly what we want.
