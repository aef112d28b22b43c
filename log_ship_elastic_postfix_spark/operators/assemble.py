"""Per-queue-id document assembly (sessionization).

The reference folds each batch's parsed lines into one nested document
per queue id via an in-memory hash map + per-program merge rules
(/root/reference/lib/logship.js:314-335, lib/postfix-doc.js:147-292).
Here the same ordered, non-commutative fold runs distributed:

    parsed.groupBy("qid").applyInPandas(fold, DOC_SCHEMA)

plus a **salted two-phase variant** for hot keys (high-volume relay
hosts / duplicate urls): phase 1 folds each (qid, salt) subgroup into
partial candidate-event lists tagged with line numbers; phase 2 merges
partials per qid, re-sorting by line number so ordering-sensitive rules
(first-`queued`-wins, exact-duplicate suppression, last-hoist-wins)
apply identically to the unsalted fold. Tests assert salted ≡ unsalted.

Merge-rule semantics (each cites the reference):
- qmgr `removed` → isFinal + {date, action:'removed'} event
  (postfix-doc.js:196-199); `expired, returned` status → action
  'expired' (:203-207); other status → parse-error drop (:209);
  else action 'queued', hoist from/size/nrcpt, null sender → ''
  (:214-222)
- smtp: hoist delay/delays to root, event keeps the rest (:184-193)
- cleanup: copy message-id/resent-message-id, **no event** (:153-157)
- scache: silently ignore `statistics` lines, else drop (:159-162)
- pickup: doc.uid, no event (:163-165)
- error → action 'error'; bounce → 'bounced'; local passes (:166-173)
- postsuper: `removed` → isFinal; event {date, action: msg} (:225-231)
- rmilter/rspamd: queue-id hoisted at parse; synthesized actions
  (:233-269)
- addEvent: first-`queued`-wins, strip qid/host/prog, exact-duplicate
  suppression, ordered append (:271-292). The reference's duplicate
  check is JSON.stringify equality (key-insertion-order sensitive); we
  canonicalize to sorted-key tuples — equal for identically-shaped
  events, deterministic always.
"""

from __future__ import annotations

from typing import Iterable, Optional

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (ArrayType, BooleanType, LongType, StringType,
                               StructField, StructType)

EVENT_FIELDS = [
    "date", "action", "from", "to", "relay", "delay", "delays", "dsn",
    "status", "message", "msg", "score", "spam_scan", "virus_scan", "dkim",
    # the reference strips ONLY qid/host/prog from events
    # (lib/postfix-doc.js:280-282); queue_id (rmilter/rspamd) and uid
    # (pickup replay path) stay visible inside event bodies
    "queue_id", "uid",
]

EVENT_TYPE = StructType([StructField(f, StringType()) for f in EVENT_FIELDS])

DOC_FIELDS = [
    StructField("qid", StringType(), False),
    StructField("host", StringType()),
    StructField("date", StringType()),
    StructField("isFinal", BooleanType()),
    StructField("from", StringType()),
    StructField("size", StringType()),
    StructField("nrcpt", StringType()),
    StructField("uid", StringType()),
    StructField("delay", StringType()),
    StructField("delays", StringType()),
    StructField("message-id", StringType()),
    StructField("resent-message-id", StringType()),
    StructField("events", ArrayType(EVENT_TYPE)),
    StructField("n_events", LongType()),
]
DOC_SCHEMA = StructType(DOC_FIELDS)

_HOIST_SMTP = ("delay", "delays")
_HOIST_QMGR = ("from", "size", "nrcpt")
_COPY_CLEANUP = ("message-id", "resent-message-id")

# partial (phase-1) schema for the salted fold: candidate events and
# root-hoist records carry the FULL composite order key (one _o<i>
# column per order col — batch_seq AND line_no by default, so
# multi-batch input merges in the same global order as the unsalted
# fold; round-1 bug: ordering by line_no alone broke the ≡ contract
# whenever line_no was not globally ordering-defining)
def _partial_schema(order_cols: list[str]) -> StructType:
    okeys = [StructField(f"_o{i}", LongType())
             for i in range(len(order_cols))]
    event_type = StructType(
        okeys + [StructField(f, StringType()) for f in EVENT_FIELDS])
    root_type = StructType(
        okeys + [StructField("field", StringType()),
                 StructField("value", StringType())])
    return StructType(
        [StructField("qid", StringType(), False)]
        + [StructField(f"_min_o{i}", LongType())
           for i in range(len(order_cols))]
        + [StructField("host", StringType()),
           StructField("date", StringType()),
           StructField("isFinal", BooleanType()),
           StructField("root_sets", ArrayType(root_type)),
           StructField("events", ArrayType(event_type))])


def _event_key(e: dict) -> frozenset:
    """Canonical event identity for duplicate suppression: the SET of
    (field, value) items — equality matches the reference's
    JSON.stringify comparison for identically-shaped events without its
    key-insertion-order sensitivity. Callers guarantee events are
    null-free before keying (every append path filters first), so no
    per-item None check is needed here."""
    return frozenset(e.items())


class _EventAcc:
    """Ordered event list with bounded-cost duplicate suppression.

    The reference's addEvent scans the whole list per append
    (lib/postfix-doc.js:271-292) — O(n²) per doc, which detonates on
    hot keys (a 100k-event relay doc needs 5×10⁹ comparisons). Same
    semantics, two regimes: typical docs (≤8 events) dedup by direct
    dict equality (C-speed, equals the canonical frozenset identity
    because events are null-free); beyond that a key set makes
    membership O(1) so hot keys stay linear."""

    _SMALL = 8

    __slots__ = ("events", "seen", "has_queued")

    def __init__(self, events: Optional[list[dict]] = None):
        self.events: list[dict] = []
        self.seen: Optional[set] = None
        self.has_queued = False
        for e in events or []:
            self.append(e)

    def append(self, e: dict, clean: bool = False) -> None:
        """``clean=True``: caller guarantees e is already null-free and
        carries no qid/host/prog (the _dispatch fast path — events are
        built field-filtered from the start)."""
        if not clean:
            e = {k: v for k, v in e.items()
                 if v is not None and k not in ("qid", "host", "prog")}
        if e.get("action") == "queued":
            if self.has_queued:
                return
            self.has_queued = True
        if self.seen is None:
            if e in self.events:
                return
            self.events.append(e)
            if len(self.events) > self._SMALL:
                self.seen = {_event_key(ev) for ev in self.events}
            return
        key = _event_key(e)
        if key in self.seen:
            return
        self.seen.add(key)
        self.events.append(e)


def _add_event(events, e: dict, clean: bool = False) -> None:
    """Reference addEvent: first-queued-wins + exact-dup suppression.
    Accepts an _EventAcc (fast path) or a plain list (compat)."""
    if isinstance(events, _EventAcc):
        events.append(e, clean=clean)
        return
    if not clean:
        e = {k: v for k, v in e.items()
             if v is not None and k not in ("qid", "host", "prog")}
    if e.get("action") == "queued":
        if any(ev.get("action") == "queued" for ev in events):
            return
    key = _event_key(e)
    for ev in events:
        if _event_key(ev) == key:
            return
    events.append(e)


def _event_from(lo: dict, action: str | None = None,
                drop: tuple = (), msg: str | None = None) -> dict:
    """Build a clean event straight from the (sparse) line dict: one
    pass, no intermediate copies. Equivalent to the reference's mutate
    lo → addEvent(strip) sequence: non-null EVENT_FIELDS minus the
    hoisted ``drop`` keys, plus a synthesized action / overridden msg."""
    e = {k: v for k, v in lo.items()
         if v is not None and k in _EVENT_FIELD_SET and k not in drop}
    if action is not None:
        e["action"] = action
    if msg is not None:
        e["msg"] = msg
    return e


def _dispatch(doc: dict, lo: dict, events: list[dict]) -> None:
    """Apply one parsed line to a doc (reference update(),
    lib/postfix-doc.js:147-182)."""
    prog = lo.get("prog") or ""
    if prog == "postfix/qmgr":
        if lo.get("msg") == "removed":
            doc["isFinal"] = True
            _add_event(events, {"date": lo.get("date"), "action": "removed"})
            return
        if lo.get("status"):
            if "expired, returned" in lo["status"]:
                _add_event(events, _event_from(lo, "expired",
                                               drop=("status",)), clean=True)
            return  # other statuses: parse-error drop
        for f in _HOIST_QMGR:
            doc[f] = lo.get(f)
        if doc.get("from") is None:
            doc["from"] = ""  # null sender
        _add_event(events, _event_from(lo, "queued", drop=_HOIST_QMGR),
                   clean=True)
        return
    if prog == "postfix/smtp":
        for f in _HOIST_SMTP:
            if lo.get(f) is not None:
                doc[f] = lo[f]
        _add_event(events, _event_from(lo, drop=_HOIST_SMTP), clean=True)
        return
    if prog == "postfix/cleanup":
        for f in _COPY_CLEANUP:
            if lo.get(f) is not None:
                doc[f] = lo[f]
        return
    if prog == "postfix/scache":
        return  # statistics lines ignored; others are parse errors
    if prog == "postfix/pickup":
        doc["uid"] = lo.get("uid")
        return
    if prog == "postfix/postsuper":
        if lo.get("msg") == "removed":
            doc["isFinal"] = True
        _add_event(events, {"date": lo.get("date"), "action": lo.get("msg")})
        return
    if prog == "postfix/error":
        _add_event(events, _event_from(lo, "error"), clean=True)
        return
    if prog == "postfix/bounce":
        _add_event(events, _event_from(lo, "bounced"), clean=True)
        return
    if prog == "postfix/local":
        _add_event(events, _event_from(lo), clean=True)
        return
    if prog.startswith("rmilter"):
        # rmilter-only action synthesis (lib/postfix-doc.js:233-255) —
        # the reference never applies these to rspamd lines
        action = None
        if lo.get("spam_scan") is not None:
            action = f"rmilter_spam_{lo['spam_scan']}"
        if lo.get("virus_scan") is not None:
            action = f"rmilter_virus_{lo['virus_scan']}"
        if lo.get("dkim") is not None:
            action = f"rmilter_dkim_{lo['dkim']}"
        _add_event(events, _event_from(lo, action, msg=lo.get("raw_msg")),
                   clean=True)
        return
    if prog.startswith("rspamd"):
        # rspamd rule (lib/postfix-doc.js:257-269): default action only
        # when a scan result (score) is present and no action was parsed
        action = ("rspamd_scan_result"
                  if lo.get("action") is None and lo.get("score") is not None
                  else lo.get("action"))
        _add_event(events, _event_from(lo, action, msg=lo.get("raw_msg")),
                   clean=True)
        return
    # unknown postfix subprogram: generic event append (reference
    # default switch fall-through, lib/postfix-doc.js:181)
    _add_event(events, _event_from(lo), clean=True)


_EVENT_FIELD_SET = frozenset(EVENT_FIELDS)


def _event_fields_only(lo: dict) -> dict:
    # iterate the (sparse, ~8-key) line dict against a frozenset
    # instead of probing all EVENT_FIELDS twice — the fold's hottest
    # call (one per event line); key order is irrelevant (dedup keys
    # are sorted, Arrow rows are re-projected densely in _doc_to_row)
    return {k: v for k, v in lo.items()
            if v is not None and k in _EVENT_FIELD_SET}


def fold_lines(rows: Iterable[dict], seed: Optional[dict] = None) -> Optional[dict]:
    """Pure-Python ordered fold: parsed lines (already sorted) → doc.

    ``seed`` is a previously-committed doc (the state-continuation path,
    reference lib/logship.js:295-306); its events come first.
    Also serves as the test oracle.
    """
    rows = list(rows)
    root_keys = ("qid", "host", "date", "isFinal", "from", "size", "nrcpt",
                 "uid", "delay", "delays", "message-id", "resent-message-id")
    doc: Optional[dict] = None
    acc = _EventAcc()
    if seed is not None:
        doc = {k: seed.get(k) for k in root_keys}
        acc = _EventAcc([dict(e) for e in (seed.get("events") or [])])
    for lo in rows:
        if doc is None:
            doc = {"qid": lo["qid"], "host": lo.get("host"),
                   "date": lo.get("date"), "isFinal": False}
        _dispatch(doc, lo, acc)
    if doc is None:
        return None
    for k in root_keys:  # canonical shape: every root key present
        doc.setdefault(k, None)
    doc["events"] = acc.events
    doc["n_events"] = len(acc.events)
    return doc


_EVENT_TEMPLATE = {f: None for f in EVENT_FIELDS}


def _doc_to_row(doc: dict) -> dict:
    row = {f.name: doc.get(f.name) for f in DOC_FIELDS if f.name != "events"}
    # dense (all-field) event dicts for Arrow, via C-speed dict merge
    row["events"] = [_EVENT_TEMPLATE | e for e in doc["events"]]
    return row


def _order_columns(pdf: pd.DataFrame, order_cols: list[str]) -> pd.DataFrame:
    return pdf.sort_values([c for c in order_cols if c in pdf.columns],
                           kind="mergesort")


def _fold_partition_factory(order_cols: list[str], group_cols: list[str],
                            chunk: int = 2048):
    """mapInPandas fold: sort the whole shuffle partition once, then a
    single itertools.groupby pass over record dicts.

    Physical rationale: ``groupBy().applyInPandas`` invokes Python and
    builds a pandas frame once **per group**; with ~1 doc per 4 lines
    that is one call per emitted row — measured ~10× slower than one
    call per partition. ``repartition(keys) + mapInPandas`` keeps the
    identical exchange but amortizes the Python boundary over the whole
    partition. Partition must fit in memory — true by construction:
    shuffle partitions are sized by spark.sql.shuffle.partitions /
    AQE target size, not by corpus size.

    State continuation rides the same fold: a committed doc enters as a
    seed row (``_seed_json`` column, batch_seq/line_no = −1 so it sorts
    before every real line of its qid) — the MERGE-style alternative to
    a per-key cogroup.
    """
    import json
    from itertools import groupby as igroupby

    def fold_partition(batches):
        pdfs = list(batches)
        if not pdfs:
            return
        pdf = pd.concat(pdfs, ignore_index=True) if len(pdfs) > 1 else pdfs[0]
        sort_cols = [c for c in group_cols + order_cols if c in pdf.columns]
        pdf = pdf.sort_values(sort_cols, kind="mergesort")
        # sparse row dicts (skip nulls): most parsed fields are null on
        # any given line, and fold_lines reads via .get(). Null
        # detection runs column-wise in C (notna + nonzero); Python
        # touches only the ~8 non-null cells per row instead of
        # zip/checking all ~29 columns
        import numpy as np

        cols = pdf.columns.tolist()
        n = len(pdf)
        all_rows: list[dict] = [{} for _ in range(n)]
        for c in cols:
            arr = pdf[c].to_numpy(dtype=object, copy=False)
            for i in np.nonzero(pd.notna(arr))[0]:
                all_rows[i][c] = arr[i]
        keyf = ((lambda r: r[group_cols[0]]) if len(group_cols) == 1
                else (lambda r: tuple(r[c] for c in group_cols)))
        out: list[dict] = []
        for _, grp in igroupby(all_rows, key=keyf):
            rows = list(grp)
            seed = None
            if rows and rows[0].get("_seed_json"):
                seed = json.loads(rows[0]["_seed_json"])
                rows = rows[1:]
            doc = fold_lines(rows, seed=seed)
            if doc is not None:
                out.append(_doc_to_row(doc))
            if len(out) >= chunk:
                yield pd.DataFrame(out)
                out = []
        if out:
            yield pd.DataFrame(out)

    return fold_partition


def assemble(parsed: DataFrame, order_cols: Optional[list[str]] = None) -> DataFrame:
    """parsed lines → one doc per qid (single-phase fold).

    The repartition on qid is the pipeline's only wide dependency —
    the same single hash exchange a groupBy would plan; the fold runs
    once per shuffle partition (see _fold_partition_factory).
    """
    order_cols = order_cols or ["batch_seq", "line_no"]
    return parsed.repartition("qid").mapInPandas(
        _fold_partition_factory(order_cols, ["qid"]), DOC_SCHEMA)


# ------------------------------------------------------------------ salted
def assemble_salted(
    parsed: DataFrame,
    *,
    n_salts: int = 8,
    order_cols: Optional[list[str]] = None,
    line_no_col: str = "line_no",
) -> DataFrame:
    """Two-phase skew-resistant fold: (qid, salt) partials → merge.

    Phase 1 runs rule dispatch per salted subgroup, emitting candidate
    events tagged with line numbers and root-set records tagged with the
    setting line. Phase 2 merges partials per qid: events re-sorted by
    line_no then re-passed through addEvent (so first-queued-wins and
    dedup see the global order), root hoists take the max-line setter,
    host/date take the min-line partial. Result is bit-identical to
    :func:`assemble`; the exchange for phase 1 is on (qid, salt), so a
    hot qid spreads over ``n_salts`` tasks.
    """
    from itertools import groupby as igroupby

    order_cols = order_cols or ["batch_seq", line_no_col]
    n_ord = len(order_cols)
    okeys = [f"_o{i}" for i in range(n_ord)]
    mkeys = [f"_min_o{i}" for i in range(n_ord)]
    salted = parsed.withColumn(
        "_salt", F.pmod(F.xxhash64(*[F.col(c) for c in order_cols]),
                        F.lit(n_salts)).cast("int"))

    def _okey(lo: dict) -> tuple:
        return tuple(int(lo[c]) for c in order_cols)

    def _partial_group(rows: list[dict]) -> dict:
        import json as _json

        qid = rows[0]["qid"]
        min_ord = _okey(rows[0])
        host, date = rows[0].get("host"), rows[0].get("date")
        is_final = False
        root_sets: list[dict] = []
        events: list[dict] = []
        # state-continuation seed (same contract as the plain fold,
        # _fold_partition_factory): the committed doc rides in as a
        # _seed_json row at order (−1, …), sorting first within its
        # salt subgroup. Its roots become order-(−1,…) root_sets (so
        # later setters overwrite, as sequential dispatch would), its
        # events become candidates at strictly-negative order keys
        # preserving their stored order (so the merge-phase addEvent
        # sees them first — committed events win first-queued/dedup
        # exactly like the plain seeded fold).
        sj = rows[0].get("_seed_json")
        if isinstance(sj, str) and sj:  # to_dict("records") keeps NaN
            seed = _json.loads(sj)
            rows = rows[1:]
            host, date = seed.get("host"), seed.get("date")
            is_final = bool(seed.get("isFinal"))
            neg = dict(zip(okeys, min_ord))
            for k in ("from", "size", "nrcpt", "uid", "delay", "delays",
                      "message-id", "resent-message-id"):
                if seed.get(k) is not None:
                    root_sets.append({**neg, "field": k,
                                      "value": str(seed[k])})
            sevents = seed.get("events") or []
            for j, e in enumerate(sevents):
                rec = {f: e.get(f) for f in EVENT_FIELDS}
                rec.update(dict(zip(
                    okeys, (-1,) * (n_ord - 1) + (j - len(sevents),))))
                events.append(rec)
        for lo in rows:
            doc: dict = {}
            evs: list[dict] = []
            _dispatch(doc, lo, evs)
            ok = _okey(lo)
            oitems = dict(zip(okeys, ok))
            if doc.pop("isFinal", False):
                is_final = True
            for k, v in doc.items():
                if k == "qid":
                    continue
                root_sets.append({**oitems, "field": k,
                                  "value": None if v is None else str(v)})
            for e in evs:
                rec = {f: e.get(f) for f in EVENT_FIELDS}
                rec.update(oitems)
                events.append(rec)
        out = {"qid": qid, "host": host, "date": date, "isFinal": is_final,
               "root_sets": root_sets, "events": events}
        out.update(dict(zip(mkeys, min_ord)))
        return out

    def partial_partition(batches):
        pdfs = list(batches)
        if not pdfs:
            return
        pdf = pd.concat(pdfs, ignore_index=True) if len(pdfs) > 1 else pdfs[0]
        cols = [c for c in ["qid", "_salt"] + order_cols if c in pdf.columns]
        pdf = pdf.sort_values(cols, kind="mergesort")
        records = pdf.to_dict("records")
        out = []
        for _, grp in igroupby(records, key=lambda r: (r["qid"], r["_salt"])):
            out.append(_partial_group(list(grp)))
            if len(out) >= 2048:
                yield pd.DataFrame(out)
                out = []
        if out:
            yield pd.DataFrame(out)

    partials = salted.repartition("qid", "_salt").mapInPandas(
        partial_partition, _partial_schema(order_cols))

    def _ord_of(rec: dict) -> tuple:
        return tuple(rec[k] for k in okeys)

    def _merge_group(rows: list[dict]) -> dict:
        rows.sort(key=lambda r: tuple(r[k] for k in mkeys))
        first = rows[0]
        doc = {"qid": first["qid"], "host": first["host"],
               "date": first["date"],
               "isFinal": any(r["isFinal"] for r in rows)}
        # root hoists: last (max order-key) setter wins, as sequential
        # dispatch overwrites on every occurrence
        sets: list[dict] = []
        for r in rows:
            if r["root_sets"] is not None:
                sets.extend(list(r["root_sets"]))  # numpy array from Arrow
        sets.sort(key=_ord_of)
        for s in sets:
            doc[s["field"]] = s["value"]
        # events: global (batch_seq, line_no) order, then the ordered
        # addEvent pass
        cand: list[dict] = []
        for r in rows:
            if r["events"] is not None:
                cand.extend(list(r["events"]))
        cand.sort(key=_ord_of)
        acc = _EventAcc()
        for e in cand:
            acc.append({f: e.get(f) for f in EVENT_FIELDS})
        doc["events"] = acc.events
        doc["n_events"] = len(acc.events)
        return _doc_to_row(doc)

    def merge_partition(batches):
        pdfs = list(batches)
        if not pdfs:
            return
        pdf = pd.concat(pdfs, ignore_index=True) if len(pdfs) > 1 else pdfs[0]
        pdf = pdf.sort_values(["qid"], kind="mergesort")
        records = pdf.to_dict("records")
        out = []
        for _, grp in igroupby(records, key=lambda r: r["qid"]):
            out.append(_merge_group(list(grp)))
            if len(out) >= 2048:
                yield pd.DataFrame(out)
                out = []
        if out:
            yield pd.DataFrame(out)

    return partials.repartition("qid").mapInPandas(merge_partition, DOC_SCHEMA)
