"""Property-based tests (hypothesis) for the fold's algebraic
invariants — the guarantees the distributed/salted/replayed variants
rely on."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from log_ship_elastic_postfix_spark.operators.assemble import fold_lines

_PROGS = ["postfix/qmgr", "postfix/smtp", "postfix/cleanup",
          "postfix/pickup", "postfix/bounce", "postfix/error",
          "postfix/local", "postfix/postsuper", "postfix/scache"]


@st.composite
def parsed_line(draw, qid="Q1"):
    prog = draw(st.sampled_from(_PROGS))
    lo = {"qid": qid, "host": draw(st.sampled_from(["mx1", "mx2"])),
          "prog": prog, "date": f"D{draw(st.integers(0, 5))}"}
    if prog == "postfix/qmgr":
        kind = draw(st.sampled_from(["queued", "removed", "expired"]))
        if kind == "removed":
            lo["msg"] = "removed"
        elif kind == "expired":
            lo["from"] = "a@b"
            lo["status"] = "expired, returned to sender"
        else:
            lo["from"] = draw(st.sampled_from([None, "", "a@b", "c@d"]))
            lo["size"] = str(draw(st.integers(1, 9999)))
            lo["nrcpt"] = str(draw(st.integers(1, 9)))
    elif prog == "postfix/smtp":
        lo.update({"to": "t@x", "relay": "r[1]:25",
                   "delay": str(draw(st.integers(0, 99))),
                   "delays": "0.1/0/0.2/0.3", "dsn": "2.0.0",
                   "status": draw(st.sampled_from(["sent (ok)",
                                                   "deferred (x)"]))})
    elif prog == "postfix/cleanup":
        lo["message-id"] = f"m{draw(st.integers(0, 3))}@x"
    elif prog == "postfix/pickup":
        lo["uid"] = str(draw(st.integers(1, 9999)))
    elif prog == "postfix/bounce":
        lo["message"] = f"notice {draw(st.integers(0, 3))}"
    elif prog in ("postfix/error", "postfix/local"):
        lo.update({"to": "t@x", "relay": "none", "dsn": "4.4.1",
                   "status": "deferred (y)"})
    elif prog == "postfix/postsuper":
        lo["msg"] = draw(st.sampled_from(["removed", "released from hold"]))
    elif prog == "postfix/scache":
        lo["msg"] = "statistics: x"
    return lo


lines_strategy = st.lists(parsed_line(), min_size=1, max_size=30)


@given(lines_strategy)
@settings(max_examples=200, deadline=None)
def test_fold_replay_idempotent(rows):
    """Folding the same lines again on top of the committed doc must be
    a no-op — the reference's replay guarantee (create-fails +
    detect_noop, lib/logship.js:361-379)."""
    doc = fold_lines(rows)
    replayed = fold_lines(rows, seed=doc)
    assert replayed == doc


@given(lines_strategy)
@settings(max_examples=200, deadline=None)
def test_fold_invariants(rows):
    doc = fold_lines(rows)
    events = doc["events"]
    # at most one queued event, and events are pairwise distinct
    assert sum(1 for e in events if e.get("action") == "queued") <= 1
    keyed = [tuple(sorted((k, v) for k, v in e.items() if v is not None))
             for e in events]
    assert len(keyed) == len(set(keyed))
    # no event leaks the stripped fields
    assert all("qid" not in e and "host" not in e and "prog" not in e
               for e in events)
    # isFinal ⟺ some removal was seen
    removed = any(
        (r["prog"] in ("postfix/qmgr", "postfix/postsuper")
         and r.get("msg") == "removed") for r in rows)
    assert doc["isFinal"] == removed
    # host/date always from the first line
    assert doc["host"] == rows[0]["host"]
    assert doc["date"] == rows[0]["date"]
    assert doc["n_events"] == len(events)


@given(lines_strategy, st.integers(2, 5))
@settings(max_examples=100, deadline=None)
def test_fold_batch_split_consistency(rows, k):
    """Splitting the line stream into consecutive batches and folding
    with state continuation gives the same doc as one fold — the
    cross-batch merge contract (state.merge_with_state)."""
    whole = fold_lines(rows)
    doc = None
    step = max(1, len(rows) // k)
    for i in range(0, len(rows), step):
        doc = fold_lines(rows[i:i + step], seed=doc)
    assert doc == whole
