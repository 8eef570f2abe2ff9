"""Sequential replay oracle — the test-side ground truth.

Replays a mutation log one event at a time in (writetime, segment_id,
position) order, maintaining per-cell state exactly as Cassandra
reconciliation defines it (and as the reference's emitted envelopes imply for
a downstream state builder):

- upsert cells overwrite older cells of the same column (cell-level LWW);
- a set cell carrying deletion_ts is a null assignment at the event writetime;
- INSERT also sets primary-key liveness; UPDATE does not;
- row/partition/range tombstones kill cells & liveness with writetime <= W
  (delete wins ties); a row is visible while liveness or any cell survives.

This is a deliberately different formulation from the engine (per-event loop
vs distributed aggregates) so a shared bug is unlikely.
"""

from __future__ import annotations

import math

import pandas as pd

REGULAR_COLS = ["role", "text", "tool", "ts"]
NEG_INF = -(1 << 62)


def _get(obj, field):
    if obj is None:
        return None
    if isinstance(obj, dict):
        return obj.get(field)
    return getattr(obj, field)


def _is_null(v) -> bool:
    if v is None:
        return True
    if isinstance(v, float) and math.isnan(v):
        return True
    return False


def replay(log: pd.DataFrame, cols: list[str] | None = None) -> pd.DataFrame:
    """Replay a mutation-log DataFrame -> final transcript state.

    ``cols`` — payload column names (defaults to the transcript payload).
    Returns columns (conv_id, turn_idx, *cols) sorted by (conv_id, turn_idx).
    """
    cols = list(cols) if cols is not None else REGULAR_COLS
    # exact duplicate deliveries collapse (identical rows, any one works)
    log = log.drop_duplicates(subset=["conv_id", "turn_idx", "segment_id", "position", "op"])
    log = log.sort_values(["writetime", "segment_id", "position"], kind="mergesort")

    state: dict[tuple, dict] = {}
    row_tombs: dict[tuple, int] = {}
    part_tombs: dict[str, int] = {}
    range_tombs: list[tuple] = []  # (conv, lo, hi, lo_incl, hi_incl, wt)

    for rec in log.itertuples(index=False):
        op = rec.op
        wt = int(rec.writetime)
        conv = rec.conv_id
        if op in ("i", "u"):
            turn = int(rec.turn_idx)
            key = (conv, turn)
            st = state.setdefault(key, {"cells": {}, "live_wt": None})
            cells = rec.cells
            for col in cols:
                c = _get(cells, col)
                if c is None or not _get(c, "set"):
                    continue
                value = _get(c, "value")
                if not _is_null(_get(c, "deletion_ts")):
                    value = None  # cell tombstone / TTL expiry
                prev = st["cells"].get(col)
                if prev is None or wt >= prev[1]:
                    st["cells"][col] = (value, wt)
            if op == "i":
                lw = st["live_wt"]
                st["live_wt"] = wt if lw is None else max(lw, wt)
        elif op == "d":
            turn = int(rec.turn_idx)
            key = (conv, turn)
            row_tombs[key] = max(row_tombs.get(key, NEG_INF), wt)
        elif op == "p":
            part_tombs[conv] = max(part_tombs.get(conv, NEG_INF), wt)
        elif op == "r":
            rs, re_ = rec.range_start, rec.range_end
            range_tombs.append(
                (
                    conv,
                    int(_get(rs, "turn_idx")),
                    int(_get(re_, "turn_idx")),
                    _get(rs, "method") == "INCL_START_BOUND",
                    _get(re_, "method") == "INCL_END_BOUND",
                    wt,
                )
            )
        else:
            raise ValueError(f"unknown op {op!r}")

    out_rows = []
    for (conv, turn), st in state.items():
        tw = max(
            row_tombs.get((conv, turn), NEG_INF),
            part_tombs.get(conv, NEG_INF),
            max(
                (
                    wt
                    for (c, lo, hi, li, hi_i, wt) in range_tombs
                    if c == conv
                    and (turn >= lo if li else turn > lo)
                    and (turn <= hi if hi_i else turn < hi)
                ),
                default=NEG_INF,
            ),
        )
        live = st["live_wt"] is not None and st["live_wt"] > tw
        surviving = {c: v for c, (v, wt) in st["cells"].items() if wt > tw}
        if not live and not surviving:
            continue
        row = {"conv_id": conv, "turn_idx": turn}
        for col in cols:
            row[col] = surviving.get(col)
        out_rows.append(row)

    out = pd.DataFrame(out_rows, columns=["conv_id", "turn_idx"] + cols)
    return out.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
